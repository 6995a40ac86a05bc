package graft

import graft.streaming.CorpusIngest
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming span-level dedup (startIngestSpans): batch-parity with d10's
  * duplicate-span census, cross-epoch rejection of span-copied documents,
  * the same-epoch admission trade, and replay idempotence.
  */
class CorpusIngestSpansSpec extends SparkSpec {
  import spark.implicits._

  test("single-epoch span stats equal batch d10 over the same corpus") {
    val root = Files.createTempDirectory("spans-parity").toString
    val in = s"$root/in"
    Files.createDirectories(Paths.get(in))
    val sf = "/root/testdata/sf0.001"

    // Replay the whole documents table as ONE epoch: with an empty census,
    // the within-batch `c > 1` rule is exactly d10's corpus-wide census.
    Tables.table(spark, sf, "documents")
      .select("doc_id", "text", "source")
      .coalesce(1)
      .write.mode("overwrite").json(in)
    CorpusIngest.startIngestSpans(spark, in, s"$root/corpus",
      s"$root/census", s"$root/stats", s"$root/ckpt")
      .awaitTermination(300000)

    val got = spark.read.parquet(s"$root/stats")
      .select("doc_id", "n_tokens", "n_windows", "n_dup_windows",
        "covered_tokens", "dup_token_frac")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1)
    val want = graft.queries.DedupQueries.d10DupSpans.fn(spark, sf)
      .select("doc_id", "n_tokens", "n_windows", "n_dup_windows",
        "covered_tokens", "dup_token_frac")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._1)
    assert(got.length == want.length,
      s"row count ${got.length} vs batch ${want.length}")
    got.zip(want).foreach { case (g, b) =>
      assert(g == b, s"span stats diverge from batch d10: stream=$g batch=$b")
    }

    // first epoch has no census, so everything is admitted and every
    // admitted window fingerprint lands in the span census
    val nDocs = want.length
    val admitted = spark.read.parquet(s"$root/corpus").count()
    assert(admitted == nDocs, s"first epoch admitted $admitted of $nDocs")
    val censusFps = spark.read.parquet(s"$root/census").select("fp").distinct().count()
    assert(censusFps > 0)
  }

  test("cross-epoch span copies are rejected, same-epoch copies admitted " +
    "together, and a replayed stream changes nothing") {
    val root = Files.createTempDirectory("spans-epochs").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val stats = s"$root/stats"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    val tA = (1 to 30).map(i => s"tok$i").mkString(" ")      // 30 tokens
    val tACopy = tA + " extra trailing tokens"               // 33, ~91% covered
    val tB = (100 to 119).map(i => s"new$i").mkString(" ")   // 20 fresh tokens
    val tC = (200 to 219).map(i => s"twin$i").mkString(" ")  // 20 fresh tokens

    Files.writeString(Paths.get(s"$in/m0.json"),
      s"""{"doc_id":1,"text":"$tA","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestSpans(spark, in, corpus, census, stats, ckpt)
      .awaitTermination(120000)

    // epoch 1: a span-copy of A (rejected: cross coverage 30/33 > 0.5), a
    // fresh doc, and TWO same-epoch copies of another fresh doc — both
    // admitted (admission gates on the census, not within-batch counts)
    Files.writeString(Paths.get(s"$in/m1.json"),
      s"""{"doc_id":2,"text":"$tACopy","source":"s"}
         |{"doc_id":3,"text":"$tB","source":"s"}
         |{"doc_id":4,"text":"$tC","source":"s"}
         |{"doc_id":5,"text":"$tC","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestSpans(spark, in, corpus, census, stats, ckpt)
      .awaitTermination(120000)

    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 4L, 5L), s"admitted $ids")

    // the rejected doc's stats are still observable, with both signals:
    // dup_any ≈ dup_cross here (its only duplication is cross-epoch)
    val r = spark.read.parquet(stats).filter(col("doc_id") === 2)
      .select("n_tokens", "covered_tokens", "cross_token_frac", "admitted")
      .as[(Long, Long, Double, Boolean)].collect().head
    assert(r._1 == 33 && r._2 == 30 && !r._4, s"rejected doc stats $r")
    assert(math.abs(r._3 - 30.0 / 33) < 1e-12)

    // same-epoch twins: flagged as within-batch duplicates in the d10
    // signal, yet admitted (cross signal is zero)
    val twins = spark.read.parquet(stats)
      .filter(col("doc_id").isin(4L, 5L))
      .select("n_dup_windows", "cross_token_frac", "admitted")
      .as[(Long, Double, Boolean)].collect()
    assert(twins.length == 2)
    twins.foreach { t =>
      assert(t._1 > 0 && t._2 == 0.0 && t._3, s"twin stats $t")
    }

    // rejected payloads contribute nothing: the census holds only admitted
    // docs' window fingerprints (1's 16, B's 6, C's 6 — distinct)
    val nFps = spark.read.parquet(census).select("fp").distinct().count()
    assert(nFps == 16 + 6 + 6, s"census fps $nFps")

    // idempotence: a drained replay admits nothing new
    CorpusIngest.startIngestSpans(spark, in, corpus, census, stats, ckpt)
      .awaitTermination(120000)
    val ids2 = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids2 == ids, s"replay changed the corpus: $ids2")
  }

  test("an all-short first epoch writes no census partitions and must not " +
    "wedge the following epochs (review regression: bare fs.exists probe)") {
    val root = Files.createTempDirectory("spans-empty").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val stats = s"$root/stats"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    // epoch 0: every doc shorter than w=15 tokens — zero windows, all
    // admitted, censusDir gets created but holds NO batch_id partitions
    Files.writeString(Paths.get(s"$in/m0.json"),
      s"""{"doc_id":1,"text":"just a few tokens here","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestSpans(spark, in, corpus, census, stats, ckpt)
      .awaitTermination(120000)
    assert(spark.read.parquet(corpus).count() == 1)

    // epoch 1 must probe the partitionless census without crashing
    val tLong = (1 to 20).map(i => s"w$i").mkString(" ")
    Files.writeString(Paths.get(s"$in/m1.json"),
      s"""{"doc_id":2,"text":"$tLong","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestSpans(spark, in, corpus, census, stats, ckpt)
      .awaitTermination(120000)
    val ids = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"epoch after empty census admitted $ids")
  }
}
