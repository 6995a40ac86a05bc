package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Differential proof that s5's closed-form batch replay IS the streaming
  * engine's watermark semantics: the same rows, fed to a REAL Structured
  * Streaming windowed count one row per micro-batch in s5's arrival order
  * (1-row batches make the engine's batch-granular watermark equal s5's
  * row-granular rule: the watermark applied to row i is
  * max(event time over rows arrived before i) − delay), must admit exactly
  * the rows s5 marks on-time — including a designed real drop.
  */
object LateDataParitySpec {
  case class Tick(event_id: Long, ts: Timestamp)
}

class LateDataParitySpec extends SparkSpec {
  import LateDataParitySpec.Tick

  private def t(sec: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  test("s5's replay equals a real 1-row-per-batch streaming windowed count " +
    "with withWatermark(30s): same admitted counts, same designed drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (event_id, ts-sec): jitter = (event_id % 120) sec, arrival = ts+jitter.
    // C (ts=599, jitter 119 → arr 718) arrives after B (ts=640, arr 640) has
    // pushed the watermark to 610 > C's window end 600 → C must DROP.
    // F/G are far-future sentinels that close every earlier window.
    val rows = Seq(
      (120L, 100L), // A  win [0,600)      arr 100
      (240L, 640L), // B  win [600,1200)   arr 640
      (119L, 599L), // C  win [0,600)      arr 718  ← dropped
      (121L, 1250L), // E win [1200,1800)  arr 1251
      (360L, 1300L), // D  win [1200,1800) arr 1300
      (480L, 100000L), // F sentinel       arr 100000
      (600L, 200000L)) // G sentinel       arr 200000
    val byArrival = rows.sortBy { case (id, sec) => (sec + id % 120, id) }

    // --- batch replay: the registry query over a temp events.parquet ---
    val dir = java.nio.file.Files.createTempDirectory("s5parity").toString
    rows.map { case (id, sec) => (id, sec * 1000000000L, 1L, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val replay = SparkEntry.queries("s5_late_data")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(replay(0L) == (2L, 1L, 1L), s"replay must drop C: $replay")
    assert(replay(600000000L) == (1L, 0L, 1L))
    assert(replay(1200000000L) == (2L, 0L, 2L))

    // --- the real engine: 1-row micro-batches in arrival order ---
    val input = MemoryStream[Tick]
    val query = input.toDS()
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "10 minutes"))
      .count()
      .selectExpr("unix_micros(window.start) AS win_start", "count AS n")
      .writeStream
      .format("memory")
      .queryName("s5_parity")
      .outputMode(OutputMode.Append())
      .start()
    try {
      byArrival.foreach { case (id, sec) =>
        input.addData(Tick(id, t(sec)))
        query.processAllAvailable()
      }
      val sink = spark.table("s5_parity").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every window the engine closed must carry exactly s5's on-time count
      assert(sink.nonEmpty, "engine closed no windows")
      sink.foreach { case (w, n) =>
        assert(replay.contains(w), s"engine window $w unknown to the replay")
        assert(n == replay(w)._3,
          s"window $w: engine admitted $n, replay says on-time ${replay(w)._3}")
      }
      // the three real windows all closed, and the drop is visible: the
      // engine's count for window 0 is 1 although 2 rows targeted it
      assert(Set(0L, 600000000L, 1200000000L).subsetOf(sink.keySet), sink.toString)
      assert(sink(0L) == 1L && replay(0L)._1 == 2L)
    } finally query.stop()
  }
}
