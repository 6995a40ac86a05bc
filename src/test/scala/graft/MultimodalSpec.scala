package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeAll extracts deterministic typed features per partition") {
    val recs = Seq(
      MediaRecord(1L, "image", "hello world".getBytes("UTF-8")),
      MediaRecord(2L, "audio", "abc".getBytes("UTF-8")),
      MediaRecord(3L, "image", Array.emptyByteArray)
    ).toDS().repartition(2)
    val out = Multimodal.decodeAll(recs).collect().map(f => f.id -> f).toMap
    assert(out(1L).n_bytes == 11L)
    assert(out(1L).channels == 3)
    assert(out(2L).channels == 1)
    assert(out(3L).n_bytes == 0L && out(3L).mean_intensity == 0.0)
    // deterministic: same input → same features regardless of partitioning
    val again = Multimodal.decodeAll(recs.repartition(3)).collect().map(f => f.id -> f).toMap
    assert(out == again)
  }

  test("fromDocuments builds the typed media frame from the corpus") {
    val docs = Seq((0L, "some text"), (1L, "other text"))
      .toDF("doc_id", "text")
    val recs = Multimodal.fromDocuments(spark, docs).collect().map(r => r.id -> r).toMap
    assert(recs(0L).kind == "image" && recs(1L).kind == "audio")
    assert(new String(recs(0L).media, "UTF-8") == "some text")
  }

  test("m8's quantized basis IS a DCT-II basis: row u=0 is constant, rows " +
    "are pairwise orthogonal and equal-norm within quantization error — " +
    "the property the cross-engine oracle cannot check (both engines " +
    "would agree on a mistranscribed table)") {
    val k = graft.queries.PipelineExtras.phashBasis
    val q = graft.queries.PipelineExtras.PhashQ14
    assert(k(0).forall(_ == q), "DC row must be the constant Q14")
    // exact values are round(cos(pi (2r+1) u / 16) * Q14)
    for (u <- 0 to 7; r <- 0 to 7)
      assert(k(u)(r) ==
        math.round(math.cos(math.Pi * (2 * r + 1) * u / 16) * q),
        s"basis cell ($u, $r) mistranscribed")
    // orthogonality: |<k_u, k_v>| for u != v is bounded by the rounding
    // error (8 cells x ~Q14 x 0.5 each way), far below the diagonal norm
    val maxCross = (for (u <- 0 to 7; v <- 0 to 7 if u != v)
      yield math.abs((0 to 7).map(r => k(u)(r) * k(v)(r)).sum)).max
    assert(maxCross < 8 * q, s"off-diagonal inner product too large: $maxCross")
    // AC rows all carry the same energy (8/2 x Q14^2) up to rounding
    val norms = (1 to 7).map(u => (0 to 7).map(r => k(u)(r) * k(u)(r)).sum)
    val target = 4L * q * q
    assert(norms.forall(n => math.abs(n - target) < 8 * q),
      s"AC row norms drifted from 4*Q14^2: $norms")
  }

  test("m9: a payload re-embedded one frame later matches at EXACTLY the " +
    "shift offset with full landmark votes — offset coherence, not " +
    "bag-of-landmark counting") {
    import org.apache.spark.sql.functions.{length, lit, col}
    // 10 distinct 64-char frames; doc 2 = one junk frame + doc 1's payload
    val payload = (0 until 10).map(i => ('a' + i).toChar.toString * 64).mkString
    val docs = Seq(
      (1L, payload),
      (2L, "!" * 64 + payload),
      (3L, (10 until 20).map(i => ('A' + i).toChar.toString * 64).mkString))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("m9spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.PipelineExtras.m9AudioFingerprint.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1's anchors t and targets t+dt (dt 1..5, both < 10) give
    // sum_{t=0..9} min(5, 9-t) = 35 landmarks, ALL shared with doc 2 at
    // t_1 - t_2 = -1 (doc 2's copy starts one frame later); doc 3 shares
    // nothing. Coherence: a single best offset carrying every vote.
    assert(rows.toSeq == Seq((1L, 2L, -1L, 35L)),
      s"expected the planted shift match only, got ${rows.toSeq}")
  }

  test("frameSimhash at the 60-bit scale width: signatures use the wide " +
    "range, identical payloads collide, bands widen to 8, and the 32-bit " +
    "default is untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 200),
      (2L, "x" * 200), // byte-identical -> identical signature at any width
      (3L, "y" * 200)
    ).toDF("doc_id", "text")
    val s60 = graft.operators.Multimodal.frameSimhash(docs, 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s60(1L) == s60(2L), "identical payloads must share the signature")
    assert(s60(1L) != s60(3L), "distinct payloads must differ")
    // The wide width must actually use bits above 31 for SOME payload
    // (a 32-bit signature never can) — both sample docs having all-high
    // bits zero would mean the width silently stayed narrow.
    assert(s60.values.exists(v => (v >>> 32) != 0L),
      s"60-bit signatures never left the low 32 bits: $s60")
    val bands60 = graft.operators.Multimodal
      .simhashBands(graft.operators.Multimodal.frameSimhash(docs, 60), 60)
      .select("k").distinct().count()
    assert(bands60 == 8, s"60-bit bands must explode to 8, got $bands60")
    // Default width unchanged: 4 bands, signatures inside 32 bits.
    val s32 = graft.operators.Multimodal.frameSimhash(docs)
      .collect().map(_.getLong(1))
    assert(s32.forall(v => (v >>> 32) == 0L), "32-bit default must stay narrow")
    val bands32 = graft.operators.Multimodal
      .simhashBands(graft.operators.Multimodal.frameSimhash(docs))
      .select("k").distinct().count()
    assert(bands32 == 4)
  }
}
