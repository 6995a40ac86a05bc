package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming twin of s3_session_window (SURVEY §2.9): the same
  * `session_window` expression under `readStream` + watermark must merge
  * sessions ACROSS micro-batches (an event in batch 2 extending a session
  * opened in batch 1) and, once the watermark passes a session's close,
  * emit exactly the rows the batch twin computes.
  */
object SessionWindowStreamSpec {
  case class Ev(user_id: Long, ts: Timestamp, value: Double)
}

class SessionWindowStreamSpec extends SparkSpec {
  import SessionWindowStreamSpec.Ev

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sessionAgg(ds: org.apache.spark.sql.DataFrame) = ds
    .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
    .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    .select(col("user_id"),
      col("session_window.start").as("session_start"),
      col("session_window.end").as("session_end"),
      col("n_events"), col("sum_value"))

  test("streaming session_window merges sessions across micro-batches and " +
    "equals the batch twin once the watermark closes them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Ev]
    val query = sessionAgg(input.toDS().withWatermark("ts", "2 hours").toDF())
      .writeStream
      .format("memory")
      .queryName("sessions_stream")
      .outputMode(OutputMode.Append())
      .start()

    val batch1 = Seq(
      Ev(1L, ts("2024-01-02 10:00:00"), 1.0),
      Ev(1L, ts("2024-01-02 10:30:00"), 2.0))
    val batch2 = Seq(
      // extends the batch-1 session (gap 20 min < 1 h) — the cross-batch merge
      Ev(1L, ts("2024-01-02 10:50:00"), 3.0),
      // a second session for the same user (gap > 1 h)
      Ev(1L, ts("2024-01-02 13:00:00"), 4.0),
      Ev(2L, ts("2024-01-02 09:00:00"), 5.0))
    // watermark sentinel: pushes event time far enough that every real
    // session closes and append mode emits it
    val sentinel = Seq(Ev(99L, ts("2024-01-02 23:00:00"), 0.0))

    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      input.addData(sentinel: _*)
      query.processAllAvailable()

      val streamed = spark.table("sessions_stream")
        .filter(col("user_id") < 99)
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet
      val batchTwin = sessionAgg((batch1 ++ batch2).toDF())
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect().toSet

      assert(streamed == batchTwin,
        s"stream=$streamed\nbatch=$batchTwin")
      // the merged session is one row spanning both batches
      assert(batchTwin.contains(
        (1L, ts("2024-01-02 10:00:00"), ts("2024-01-02 11:50:00"), 3L, 6.0)),
        batchTwin.toString)
    } finally query.stop()
  }
}
