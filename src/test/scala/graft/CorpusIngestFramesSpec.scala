package graft

import graft.streaming.CorpusIngest
import java.nio.file.{Files, Paths}

/** Streaming MEDIA admission end-to-end (`startIngestFrames`) — the
  * frame-signature twin of m4's batch media dedup, exercised at BOTH
  * shipped widths (r10 verdict #2: 60-bit is the default; 32 the
  * m4-parity opt-in): exact payload copies are rejected by the
  * content-hash gate, frame-level near-copies by the banded SimHash
  * probe (the chosen near-copy sits at Hamming 3 of the original's
  * 32-bit signature and Hamming 6 of its 60-bit signature — both inside
  * the maxHamming = 6 gate and both within the banding's pigeonhole
  * guarantee), novel payloads are admitted, and a drained stream re-run
  * admits nothing new (the replay-idempotence contract every ingest
  * variant shares).
  */
class CorpusIngestFramesSpec extends SparkSpec {
  import spark.implicits._

  // ~1 KB payloads (16 frames): one-token edits move few simhash bits.
  private val mediaA = (0 until 200).map(i => f"w$i%03d").mkString(" ")
  // one frame's content changed → signature Hamming 3 (32-bit) / 6 (60-bit)
  private val mediaANear = mediaA.replace("w003", "x003")
  // disjoint content → Hamming 19 (32-bit) / 33 (60-bit), well past the gate
  private val mediaC = (0 until 200).map(i => f"z$i%03d").mkString(" ")

  for (bits <- Seq(32, 60)) {
    val nBands = (bits + 7) / 8
    test(s"frame ingest at sigBits=$bits rejects exact copies and " +
      "Hamming-close near-copies against the signature census, admits " +
      "novel media, and replays idempotently") {
      val root = Files.createTempDirectory(s"corpusingestframes$bits").toString
      val in = s"$root/in"; val corpus = s"$root/corpus"
      val census = s"$root/census"; val ckpt = s"$root/ckpt"
      Files.createDirectories(Paths.get(in))

      Files.writeString(Paths.get(s"$in/m0.json"),
        s"""{"doc_id":1,"text":"$mediaA","source":"s"}
           |""".stripMargin)
      CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt,
        sigBits = bits).awaitTermination(120000)
      val round1 = CorpusIngest.corpus(spark, corpus)
        .select("doc_id").as[Long].collect().toSet
      assert(round1 == Set(1L), s"epoch 0 admitted $round1")

      // epoch 1: exact copy (new id), frame-level near-copy, novel payload
      Files.writeString(Paths.get(s"$in/m1.json"),
        s"""{"doc_id":5,"text":"$mediaA","source":"s"}
           |{"doc_id":6,"text":"$mediaANear","source":"s"}
           |{"doc_id":7,"text":"$mediaC","source":"s"}
           |""".stripMargin)
      CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt,
        sigBits = bits).awaitTermination(120000)
      val round2 = CorpusIngest.corpus(spark, corpus)
        .select("doc_id").as[Long].collect().toSet
      assert(round2 == Set(1L, 7L), s"epoch 1 corpus $round2")

      // census carries band rows for both admitted docs (nBands each) plus
      // one fp row each — and nothing for the rejected candidates
      val censusRows = spark.read.parquet(census)
      assert(censusRows.count() == 2L * (nBands + 1),
        s"expected 2 x ($nBands bands + 1 fp row), got ${censusRows.count()}")

      // replay idempotence: a drained re-run admits nothing new
      CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt,
        sigBits = bits).awaitTermination(120000)
      val round3 = CorpusIngest.corpus(spark, corpus)
        .select("doc_id").as[Long].collect().toSet
      assert(round3 == round2, s"re-run changed the corpus: $round3")
    }
  }

  test("within-batch exact copies collapse to the lowest doc_id; empty " +
    "payloads ride the exact gate only (no band rows) and still dedup") {
    val root = Files.createTempDirectory("corpusingestframes2").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    Files.writeString(Paths.get(s"$in/m0.json"),
      s"""{"doc_id":4,"text":"$mediaA","source":"s"}
         |{"doc_id":2,"text":"$mediaA","source":"s"}
         |{"doc_id":3,"text":"","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)
    val ids = CorpusIngest.corpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(2L, 3L), s"epoch 0 admitted $ids")

    // epoch 1: another empty payload must be rejected by the fp census
    // even though empty text produced no band rows
    Files.writeString(Paths.get(s"$in/m1.json"),
      s"""{"doc_id":9,"text":"","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)
    val ids2 = CorpusIngest.corpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(ids2 == Set(2L, 3L), s"empty-payload dup admitted: $ids2")
  }

  test("resuming a frame census at a different signature width fails fast " +
    "(band rows written at one width are meaningless at another)") {
    val root = Files.createTempDirectory("corpusingestframes3").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))

    Files.writeString(Paths.get(s"$in/m0.json"),
      s"""{"doc_id":1,"text":"$mediaA","source":"s"}
         |""".stripMargin)
    // default width (60) pins the census
    CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt)
      .awaitTermination(120000)

    Files.writeString(Paths.get(s"$in/m1.json"),
      s"""{"doc_id":2,"text":"$mediaC","source":"s"}
         |""".stripMargin)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt,
        sigBits = 32).awaitTermination(120000)
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("sig_bits"),
      s"expected the width-pin failure, got: $msg")
  }

  test("a width marker over an EMPTY census (epoch failed before any batch " +
    "committed) does not wedge the directory — a different width re-pins") {
    val root = Files.createTempDirectory("corpusingestframes4").toString
    val in = s"$root/in"; val corpus = s"$root/corpus"
    val census = s"$root/census"; val ckpt = s"$root/ckpt"
    Files.createDirectories(Paths.get(in))
    // crash residue: the marker exists but no batch_id= partition does
    Files.createDirectories(Paths.get(census))
    Files.writeString(Paths.get(s"$census/_SIG_BITS"), "32\n")

    Files.writeString(Paths.get(s"$in/m0.json"),
      s"""{"doc_id":1,"text":"$mediaA","source":"s"}
         |""".stripMargin)
    CorpusIngest.startIngestFrames(spark, in, corpus, census, ckpt,
      sigBits = 60).awaitTermination(120000)
    val ids = CorpusIngest.corpus(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L), s"re-pinned epoch admitted $ids")
    assert(Files.readString(Paths.get(s"$census/_SIG_BITS")).trim == "60",
      "marker was not re-pinned to the new width")
  }
}
