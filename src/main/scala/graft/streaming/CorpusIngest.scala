package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming corpus refresh — the continuous form of d7's incremental
  * dedup admission: a micro-batch stream of candidate documents is
  * fingerprinted, deduplicated within the batch (lowest doc_id per
  * fingerprint wins), anti-joined against the stored fingerprint census,
  * and only never-seen documents are admitted. This is the ingest loop a
  * 100 TB training corpus actually runs: the corpus is append-only, the
  * census is the only thing ever probed, and stored payloads are never
  * rescanned.
  *
  * Exactly-once without transactions: every epoch writes its admitted
  * documents AND its census delta under a `batch_id=` partition with
  * dynamic partition overwrite, so an at-least-once replay of the epoch
  * REWRITES its own partitions instead of appending duplicates — and the
  * census probe reads only partitions with `batch_id < current`, so a
  * replayed epoch cannot be rejected by its own half-written delta. Same
  * idempotence pattern as [[LiveFeed.startUpsertFrom]]'s dead-letter sink.
  */
object CorpusIngest {

  /** Incoming candidate-document shape (mirrors the `documents` table's
    * ingest-relevant columns).
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  /** File-based micro-batch source: each dropped file is one crawl/delivery
    * manifest of candidate documents.
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 16)
      .json(dir)

  /** Start the admission stream. `corpusDir` accumulates admitted
    * documents, `censusDir` the fingerprint census; both are `batch_id=`
    * partitioned (see object doc for why). I/O per epoch is O(batch +
    * census probe) — the admitted corpus is never read back.
    */
  def startIngest(
      spark: SparkSession,
      inputDir: String,
      corpusDir: String,
      censusDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    readDocs(spark, inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (raw: DataFrame, batchId: Long) =>
        val w = Window.partitionBy("fp").orderBy("doc_id")
        val batch = raw
          .withColumn("fp", Text.prefixFingerprint(Text.tokens(col("text")), 8))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
        val fs = new org.apache.hadoop.fs.Path(censusDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val admitted =
          if (fs.exists(new org.apache.hadoop.fs.Path(censusDir))) {
            // Probe only FULLY COMMITTED epochs: a replay of this epoch
            // must not see its own partial census delta.
            val census = spark.read.parquet(censusDir)
              .filter(col("batch_id") < batchId)
              .select("fp")
            batch.join(census, Seq("fp"), "left_anti")
          } else batch
        admitted
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(corpusDir)
        admitted
          .select(col("fp"), lit(batchId).as("batch_id"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(censusDir)
        ()
      }
      .start()

  /** The admitted corpus as one DataFrame (all epochs). */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir)

  /** Start the FUZZY admission stream — the streaming form of d8: after the
    * exact-fingerprint gate, surviving documents are MinHash-banded and
    * probed against the stored BAND census; any band collision with an
    * already-admitted document rejects the candidate (the
    * collision-is-enough gate production ingest runs when verification
    * would require rescanning stored payloads — recall is the LSH band
    * recall, precision is traded for never touching admitted media again).
    * The census stores only (fp, band, bkey) signature rows — O(docs),
    * payload-free — and both gates share the one `batch_id <` idempotence
    * protocol, so replays rewrite rather than duplicate.
    *
    * Two deliberate batch-granularity trade-offs: (1) near-dups arriving
    * in the SAME epoch are admitted together (the gate is batch × census;
    * the periodic corpus-wide d3/d5 sweep catches them — running
    * clustering inside every epoch would serialize ingest on an iterative
    * job); (2) the census accrues one `batch_id=` partition per epoch, so
    * a long-running stream should roll [[graft.sources.Compact]] over it —
    * admission only reads `fp/band/bkey`, which compaction preserves.
    */
  def startIngestNearDup(
      spark: SparkSession,
      inputDir: String,
      corpusDir: String,
      censusDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    readDocs(spark, inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (raw: DataFrame, batchId: Long) =>
        val w = Window.partitionBy("fp").orderBy("doc_id")
        val batch = raw
          .withColumn("fp", Text.prefixFingerprint(Text.tokens(col("text")), 8))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
          .persist()
        val sh = graft.operators.MinHashLSH
          .shingleTable(batch, "doc_id", "text", 3)
        val bands = graft.operators.MinHashLSH.bandKeys(
          graft.operators.MinHashLSH.signatures(sh, "doc_id", 8), "doc_id", 8, 4)
          .join(batch.select("doc_id", "fp"), Seq("doc_id"))
        val fs = new org.apache.hadoop.fs.Path(censusDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val admitted =
          if (fs.exists(new org.apache.hadoop.fs.Path(censusDir))) {
            val census = spark.read.parquet(censusDir)
              .filter(col("batch_id") < batchId)
            // exact gate: stored fingerprint match
            val exactHit = census.select("fp").distinct()
            // fuzzy gate: any LSH band collision with a stored signature
            val fuzzyHit = bands
              .join(census.select(col("band"), col("bkey")).distinct(),
                Seq("band", "bkey"))
              .select(col("doc_id")).distinct()
            batch
              .join(exactHit, Seq("fp"), "left_anti")
              .join(fuzzyHit, Seq("doc_id"), "left_anti")
          } else batch
        val admittedBands = bands
          .join(admitted.select("doc_id"), Seq("doc_id"))
          .select(col("fp"), col("band"), col("bkey"), lit(batchId).as("batch_id"))
        admitted
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(corpusDir)
        admittedBands
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(censusDir)
        batch.unpersist()
        ()
      }
      .start()
}
