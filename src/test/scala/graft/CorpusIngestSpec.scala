package graft

import graft.streaming.CorpusIngest
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming corpus-refresh end-to-end: candidate docs stream in across
  * epochs, within-batch and cross-epoch duplicates are rejected against the
  * fingerprint census, and re-running a completed stream admits nothing new
  * (the idempotence contract).
  */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def fp8(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(text.split(" ").take(8).mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("ingest admits exactly the never-seen fingerprints across epochs " +
    "and keeps the lowest doc_id within a batch") {
    val root = Files.createTempDirectory("corpusingest").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    val tA = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val tB = "one two three four five six seven eight nine ten"
    val tC = "red orange yellow green blue indigo violet ultraviolet beyond"
    // epoch 0: A twice (within-batch dup, ids 2 and 1) and B once
    Files.writeString(Paths.get(s"$in/m0.json"),
      s"""{"doc_id":2,"text":"$tA","source":"s"}
         |{"doc_id":1,"text":"$tA","source":"s"}
         |{"doc_id":3,"text":"$tB","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngest(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)

    val round1 = CorpusIngest.corpus(spark, corpus)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(round1 == Set((1L, tA), (3L, tB)),
      s"epoch 0 admitted $round1")

    // epoch 1: a cross-epoch dup of A (new id) and a genuinely new doc C
    Files.writeString(Paths.get(s"$in/m1.json"),
      s"""{"doc_id":9,"text":"$tA","source":"s"}
         |{"doc_id":10,"text":"$tC","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngest(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)

    val round2 = CorpusIngest.corpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(round2 == Set(1L, 3L, 10L), s"epoch 1 corpus $round2")

    // census holds exactly the three admitted fingerprints
    val fps = spark.read.parquet(census).select("fp").as[String].collect().toSet
    assert(fps == Set(fp8(tA), fp8(tB), fp8(tC)))

    // idempotence: re-running the drained stream admits nothing new
    CorpusIngest.startIngest(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)
    val round3 = CorpusIngest.corpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(round3 == round2, s"re-run changed the corpus: $round3")
  }

  test("near-dup ingest rejects exact dups, band-colliding near-dups, and " +
    "admits novel documents across epochs") {
    val root = Files.createTempDirectory("corpusingestnd").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    val tA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    // near-dup of A: one token changed at the END — 3-gram shingle sets are
    // nearly identical, so all 4 MinHash bands almost surely collide
    val tANear = tA.replace(" tango", " zulu")
    val tB = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"

    Files.writeString(Paths.get(s"$in/m0.json"),
      s"""{"doc_id":1,"text":"$tA","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestNearDup(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)

    // epoch 1: exact dup of A (new id), near-dup of A, and a novel doc B
    Files.writeString(Paths.get(s"$in/m1.json"),
      s"""{"doc_id":5,"text":"$tA","source":"s"}
         |{"doc_id":6,"text":"$tANear","source":"s"}
         |{"doc_id":7,"text":"$tB","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestNearDup(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)

    val ids = CorpusIngest.corpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 7L), s"near-dup ingest admitted $ids")
  }
}
