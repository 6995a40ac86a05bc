package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): media as opaque `binary`
  * columns with typed metadata, processed by a per-partition decode stage.
  *
  * The container ships no image/audio codecs, so [[FakeCodec]] is a
  * clearly-marked deterministic stand-in for the real decoder — what is
  * REAL and load-bearing here is the Spark plumbing: the typed record
  * schema, `mapPartitions` batch shape (decoder state initialized once per
  * partition, not per row — the same shape a JNI/FFmpeg/libvips binding
  * needs), and the downstream columnar feature frame.
  */
object Multimodal {

  /** One media object: opaque payload + typed envelope metadata. */
  case class MediaRecord(id: Long, kind: String, media: Array[Byte])

  /** Decoded features — fixed columnar schema regardless of codec. */
  case class MediaFeatures(
      id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      mean_intensity: Double)

  /** Deterministic fake decoder. A real build replaces `decode` with the
    * codec call; the signature (bytes → features) and the once-per-partition
    * init in [[decodeAll]] are the contract.
    */
  object FakeCodec {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Double) = {
      val n = bytes.length
      // Pretend dimensions derive from a header; here: deterministic from
      // content so tests are reproducible without codecs.
      val w = 16 + (if (n > 0) (bytes(0) & 0x7f) else 0)
      val h = 16 + (if (n > 1) (bytes(1) & 0x7f) else 0)
      val c = kind match { case "image" => 3; case "audio" => 1; case _ => 1 }
      val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
      (w, h, c, mean)
    }
  }

  /** Per-partition decode: one codec handle per partition, streamed rows.
    * At 100 TB the binary payloads never leave their partition — the only
    * shuffle is whatever the caller does with the small feature frame.
    */
  def decodeAll(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // (real impl: open codec/context ONCE here, close on exhaustion)
      it.map { r =>
        val (w, h, c, mean) = FakeCodec.decode(r.kind, r.media)
        MediaFeatures(r.id, r.kind, r.media.length.toLong, w, h, c, mean)
      }
    }
  }

  /** Resized media descriptor: original + target dims and the sampling
    * stride a real resampler would use.
    */
  case class ResizedMedia(
      id: Long,
      kind: String,
      width: Int,
      height: Int,
      out_w: Int,
      out_h: Int,
      stride: Int)

  /** Per-partition resize planning — the fit-within-`maxDim` downscale
    * every training-data image/audio pipeline runs after decode. The
    * arithmetic (clamp dims, integer stride = how many source samples map
    * to one target sample) is the real contract; the pixel loop it would
    * drive lives behind the same stubbed codec boundary as
    * [[FakeCodec.decode]]. Stays `mapPartitions` so a real resampler
    * context is initialized once per partition and payloads never shuffle.
    */
  def resizeAll(feats: Dataset[MediaFeatures], maxDim: Int): Dataset[ResizedMedia] = {
    import feats.sparkSession.implicits._
    feats.mapPartitions { it =>
      // (real impl: acquire resampler context ONCE here)
      it.map { f =>
        val ow = math.min(f.width, maxDim)
        val oh = math.min(f.height, maxDim)
        val stride = math.max(1, (f.width * f.height) / (ow * oh))
        ResizedMedia(f.id, f.kind, f.width, f.height, ow, oh, stride)
      }
    }
  }

  /** Build a MediaRecord dataset from the documents table (text bytes stand
    * in for media payloads; schema and partitioning are the real thing).
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id").as("id"),
        when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
  }

  /** The media frame-signature derivation SHARED by the batch dedup
    * (m4_media_dedup) and its streaming admission twin
    * (`CorpusIngest.startIngestFrames`): the payload is cut into
    * [[FrameBytes]]-byte frames, each frame hashed to 32 bits
    * (`Text.tokenHash32` — the codegen'd md5-prefix expression), and the
    * per-frame hashes folded into ONE 32-bit doc SimHash
    * (`Text.simhashAgg`). One definition so the stream gate and the batch
    * query can never silently desynchronize on frame size or hash;
    * empty payloads are excluded (no frames → no signature).
    *
    * @param docs frame source with `doc_id` and a `text` payload column
    * @return (doc_id, simhash)
    */
  val FrameBytes = 64

  private def framed(docs: DataFrame): DataFrame = docs
    .filter(length(col("text")) > 0)
    .withColumn("n_frames", expr(s"(length(text) + ${FrameBytes - 1}) div $FrameBytes"))
    .select(col("doc_id"), col("text"),
      explode(sequence(lit(0), col("n_frames") - 1)).as("fpos"))

  private val frameCol = expr(s"substr(text, fpos * $FrameBytes + 1, $FrameBytes)")

  def frameSimhash(docs: DataFrame, bits: Int = 32): DataFrame = {
    require(bits == 32 || bits == 60,
      s"frame SimHash width must be 32 (m4/d4 oracle parity) or 60 " +
        s"(the scale variant — see Text.tokenHash60), got $bits")
    val hv =
      if (bits == 32) graft.functions.Text.tokenHash32(frameCol)
      else graft.functions.Text.tokenHash60(frameCol)
    framed(docs)
      .select(col("doc_id"), hv.as("hv"))
      .groupBy("doc_id")
      .agg(graft.functions.Text.simhashAgg(col("hv"), bits))
  }

  /** The DUAL-long 120-bit frame signature (d22's width on the frame
    * path): two independent 60-bit SimHashes per doc — `(doc_id, sim1,
    * sim2)` — verified with the combined popcount. See d22's scaladoc
    * for the candidate-floor / dup-strictness trade.
    */
  def frameSimhashDual(docs: DataFrame): DataFrame =
    framed(docs)
      .select(col("doc_id"),
        graft.functions.Text.tokenHash60(frameCol).as("h1"),
        graft.functions.Text.seededHash64(lit(2), frameCol).as("h2"))
      .groupBy("doc_id")
      .agg(graft.functions.Text.simhashAgg(col("h1"), 60).as("sim1"),
        graft.functions.Text.simhashAgg(col("h2"), 60).as("sim2"))

  /** d22's band layout over [[frameSimhashDual]] signatures: 8 exact
    * 15-bit bands (4 per long) — random collision floor 8/2¹⁵ ≈ 0.024%,
    * Hamming ≤ 7 pigeonhole over the combined 120 bits.
    */
  def dualBands(sims: DataFrame): DataFrame =
    sims
      .withColumn("g", explode(sequence(lit(0), lit(7))))
      .select(col("doc_id"), col("g"),
        when(col("g") < 4, expr("shiftright(sim1, g * 15) & 32767"))
          .otherwise(expr("shiftright(sim2, (g - 4) * 15) & 32767"))
          .as("bval"),
        col("sim1"), col("sim2"))

  /** m4's band explode over [[frameSimhash]] signatures — the
    * candidate-generation granularity both the batch pair join and the
    * streaming census probe key on: 4 bands at the 32-bit default,
    * ⌈bits/8⌉ = 8 at the 60-bit scale width (more bands = a STRONGER
    * pigeonhole — Hamming ≤ 7 guaranteed to share a band vs ≤ 3 at 32).
    *
    * Bands are NEAR-EQUAL width, not fixed 8-bit: a naive 8-bit slicing of
    * 60 bits leaves band 7 with only 4 real bits — a 1/16-selectivity band
    * whose candidate join approaches census/16 pairs per doc at exactly
    * the census sizes the wide width exists for. 60/8 instead splits as
    * four 8-bit + four 7-bit bands (narrowest selectivity 1/128); 32/4
    * stays the exact byte slicing, so the 32-bit oracle rows are
    * bit-identical.
    */
  def simhashBands(sims: DataFrame, bits: Int = 32): DataFrame = {
    val nb = (bits + 7) / 8
    val base = bits / nb // narrow-band width; first (bits % nb) bands get +1
    val rem = bits % nb
    sims
      .withColumn("k", explode(sequence(lit(0), lit(nb - 1))))
      .select(col("doc_id"), col("k"),
        expr(s"shiftright(simhash, k * $base + least(k, $rem)) " +
          s"& ((1 << ($base + if(k < $rem, 1, 0))) - 1)").as("byte"),
        col("simhash"))
  }
}
