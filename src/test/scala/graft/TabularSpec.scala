package graft

import graft.sources.Tabular
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** CSV/JSONL edge formats: lossless roundtrip of real corpus rows (commas,
  * quotes, unicode pass through the writers' quoting) and malformed-line
  * quarantine instead of silent drop.
  */
class TabularSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("documents roundtrip losslessly through CSV and JSONL") {
    val root = Files.createTempDirectory("tabular").toString
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang")
    val expect = docs.as[(Long, String, String)].collect().toSet

    Tabular.writeCsv(docs, s"$root/csv")
    val (csvClean, csvDead) = Tabular.quarantine(
      Tabular.readCsv(spark, s"$root/csv", docSchema))
    assert(csvDead.count() == 0)
    assert(csvClean.as[(Long, String, String)].collect().toSet == expect)

    Tabular.writeJsonl(docs, s"$root/jsonl")
    val (jClean, jDead) = Tabular.quarantine(
      Tabular.readJsonl(spark, s"$root/jsonl", docSchema))
    assert(jDead.count() == 0)
    assert(jClean.as[(Long, String, String)].collect().toSet == expect)
  }

  test("malformed lines land in the dead-letter frame, never silently drop") {
    val root = Files.createTempDirectory("tabularbad").toString
    Files.writeString(Paths.get(s"$root/bad.jsonl"),
      """{"doc_id":1,"text":"good row","lang":"en"}
        |{"doc_id":"not a number","text":"type drift","lang":"en"}
        |this is not json at all
        |{"doc_id":2,"text":"another good row","lang":"de"}
        |""".stripMargin)
    val (clean, dead) = Tabular.quarantine(
      Tabular.readJsonl(spark, root, docSchema))
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val deadLines = dead.as[String].collect()
    assert(deadLines.length == 2, deadLines.mkString("; "))
    assert(deadLines.exists(_.contains("not a number")))
    assert(deadLines.exists(_.contains("not json at all")))
  }
}
