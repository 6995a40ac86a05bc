package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact-dedup on the BUILT-IN bounded-state operator
  * (`dropDuplicatesWithinWatermark`, SURVEY §2.9): the at-least-once feed
  * (`update_live_price.py` re-polls the same bars every 60 s cycle) must
  * emit each key once while its state lives, and state must EVICT at the
  * watermark — the contract that keeps dedup state bounded by the
  * watermark window instead of growing with the stream. CorpusIngest
  * implements the census-backed variant (dedup against ALL history via a
  * stored fingerprint table); this pins the complementary built-in:
  * in-state dedup with time-bounded memory and documented re-admission
  * after eviction.
  */
object StreamDedupSpec {
  case class Tick(id: Long, ts: Timestamp, v: Double)
}

class StreamDedupSpec extends SparkSpec {
  import StreamDedupSpec.Tick

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDuplicatesWithinWatermark: duplicates within the watermark drop " +
    "(first copy wins), state evicts at the watermark, late re-arrival re-admits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Tick]
    val query = input.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode(OutputMode.Append())
      .start()

    try {
      input.addData(
        Tick(1L, ts("2024-01-02 10:00:00"), 1.0),
        Tick(2L, ts("2024-01-02 10:01:00"), 2.0))
      query.processAllAvailable()
      input.addData(
        // same key re-polled inside the watermark window → dropped,
        // and the FIRST copy's payload is what the sink already has
        Tick(1L, ts("2024-01-02 10:02:00"), 99.0),
        // advances the watermark to 10:20 → id=1's state
        // (expires at 10:00 + 10 min = 10:10) is evicted
        Tick(3L, ts("2024-01-02 10:30:00"), 3.0))
      query.processAllAvailable()
      input.addData(
        // re-arrival AFTER eviction → re-admitted: bounded state means
        // dedup only guarantees uniqueness within the watermark window
        Tick(1L, ts("2024-01-02 10:31:00"), 7.0))
      query.processAllAvailable()

      val rows = spark.table("dedup_stream").as[Tick].collect().toSeq
      assert(rows.count(_.id == 1L) == 2, rows.toString) // admitted, evicted, re-admitted
      assert(rows.filter(_.id == 1L).map(_.v).toSet == Set(1.0, 7.0),
        "the in-window duplicate (v=99.0) must never surface: " + rows)
      assert(rows.count(_.id == 2L) == 1 && rows.count(_.id == 3L) == 1, rows.toString)
    } finally query.stop()
  }
}
