package graft

import graft.streaming.CorpusIngest
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Embedding-space streaming admission (startIngestVectors): exact copies
  * of admitted vectors are sketch-rejected across epochs, dissimilar
  * vectors are admitted, the plane basis is drawn once and reused, and a
  * drained replay changes nothing.
  */
class CorpusIngestVectorsSpec extends SparkSpec {
  import spark.implicits._

  test("vector ingest rejects sketch-near duplicates across epochs and " +
    "admits dissimilar vectors from a fixed plane basis") {
    val root = Files.createTempDirectory("vecingest").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val planes = s"$root/planes"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    val sf = "/root/testdata/sf0.001"

    // epoch 0: 20 corpus vectors — all admitted (empty census), and the
    // 16-plane basis is drawn from this batch by deterministic md5 order
    val seed = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id").between(1, 20))
      .select("vec_id", "embedding", "label")
      .persist()
    seed.coalesce(1).write.mode("overwrite").json(s"$in")
    CorpusIngest.startIngestVectors(spark, in, corpus, census, planes, ckpt)
      .awaitTermination(180000)
    val r0 = spark.read.parquet(corpus).select("vec_id").as[Long].collect().toSet
    assert(r0 == (1L to 20L).toSet, s"epoch 0 admitted $r0")
    val nPlanes = spark.read.parquet(planes).count()
    assert(nPlanes == 16, s"drew $nPlanes planes")

    // epoch 1: an exact copy of vector 1 (identical sketch, Hamming 0 —
    // rejected) and the negation of vector 2 (every sign bit flips, so no
    // band of its sketch can equal the source's; admitted)
    val copy = seed.filter(col("vec_id") === 1)
      .select(lit(100L).as("vec_id"), col("embedding"), col("label"))
    val neg = seed.filter(col("vec_id") === 2)
      .select(lit(101L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"), col("label"))
    copy.unionByName(neg).coalesce(1).write.mode("append").json(s"$in")
    CorpusIngest.startIngestVectors(spark, in, corpus, census, planes, ckpt)
      .awaitTermination(180000)
    val r1 = spark.read.parquet(corpus).select("vec_id").as[Long].collect().toSet
    assert(r1 == (1L to 20L).toSet + 101L, s"epoch 1 corpus $r1")

    // the plane basis was NOT redrawn by the second epoch
    assert(spark.read.parquet(planes).count() == 16)
    // census holds 4 band rows per admitted vector
    val nBands = spark.read.parquet(census).count()
    assert(nBands == 21 * 4, s"census band rows $nBands")

    // idempotence: a drained replay admits nothing new
    CorpusIngest.startIngestVectors(spark, in, corpus, census, planes, ckpt)
      .awaitTermination(180000)
    val r2 = spark.read.parquet(corpus).select("vec_id").as[Long].collect().toSet
    assert(r2 == r1, s"replay changed the corpus: $r2")
    seed.unpersist()
  }

  test("duplicate vec_ids within one epoch collapse to one row and do not " +
    "corrupt the stored sketch (review regression: summed plane bits)") {
    val root = Files.createTempDirectory("vecingestdup").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val planes = s"$root/planes"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    val sf = "/root/testdata/sf0.001"

    // epoch 0: vector 1 arrives TWICE (two manifests in one 16-file
    // trigger) plus vector 2 — the duplicate must collapse pre-sketch
    val base = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id").isin(1L, 2L))
      .select("vec_id", "embedding", "label")
    base.coalesce(1).write.mode("overwrite").json(in)
    base.filter(col("vec_id") === 1).coalesce(1).write.mode("append").json(in)
    CorpusIngest.startIngestVectors(spark, in, corpus, census, planes, ckpt)
      .awaitTermination(180000)
    val rows = spark.read.parquet(corpus).groupBy("vec_id").count()
      .as[(Long, Long)].collect().toMap
    assert(rows == Map(1L -> 1L, 2L -> 1L), s"epoch 0 rows $rows")
    assert(spark.read.parquet(census).count() == 2 * 4)

    // epoch 1: an exact copy of vector 1 must be rejected — only possible
    // if the stored sketch was the true one, not a doubled bit-sum
    base.filter(col("vec_id") === 1)
      .select(lit(50L).as("vec_id"), col("embedding"), col("label"))
      .coalesce(1).write.mode("append").json(in)
    CorpusIngest.startIngestVectors(spark, in, corpus, census, planes, ckpt)
      .awaitTermination(180000)
    val ids = spark.read.parquet(corpus).select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"epoch 1 admitted $ids")
  }
}
