package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time-window aggregations over `events` — the batch-expressible forms of
  * the streaming surface (SURVEY §2.9: the reference's 60 s poll loop and
  * implicit tumbling-by-day upsert key, `update_live_price.py:118,251-252`).
  * The same `window`/`session_window` expressions run unchanged under
  * `readStream` + watermark (see `graft.streaming.LiveFeed`); here they are
  * registered as oracle queries in their batch form.
  */
object WindowQueries {
  import Q._

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** S1: tumbling 1-day window per event type. */
  val s1Tumbling: Q = Q(
    "s1_tumbling_window",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(
          col("window.start").as("day_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("day_start", "event_type"),
    Some(s"""SELECT date_trunc('day', ts) AS day_start, event_type,
      count(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM events GROUP BY day_start, event_type
      ORDER BY day_start, event_type""")
  )

  /** S2: sliding window — 2-day length, 1-day slide; every event lands in
    * exactly two windows (DuckDB mirror: explode the two candidate starts).
    */
  val s2Sliding: Q = Q(
    "s2_sliding_window",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "2 days", "1 day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(
          col("window.start").as("win_start"), col("window.end").as("win_end"),
          col("n"), col("sum_value"))
        .orderBy("win_start"),
    Some(s"""SELECT win_start, win_start + INTERVAL 2 DAY AS win_end,
      count(*) AS n, ${sqlDsum("value")} AS sum_value
      FROM (SELECT date_trunc('day', ts) - i * INTERVAL 1 DAY AS win_start, value
            FROM events CROSS JOIN range(2) r(i))
      GROUP BY win_start ORDER BY win_start""")
  )

  /** S3: session window — per-user sessions closed by a 1-hour silence gap
    * (DuckDB mirror: gaps-and-islands via lag + running sum; session end is
    * last event + gap, matching Spark's `session_window` semantics).
    */
  val s3Session: Q = Q(
    "s3_session_window",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(
          col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start"),
    Some(s"""WITH marked AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
               THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sessions AS (
        SELECT user_id, ts, value,
          sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL 1 HOUR AS session_end,
        count(*) AS n_events, ${sqlDsum("value")} AS sum_value
      FROM sessions GROUP BY user_id, sid
      ORDER BY user_id, session_start""")
  )

  /** S4: the reference's daily close+1h download scheduler
    * (`download_historical_price.py:270-292`: fire at 16:00 market close
    * + 1 h; if that moment has passed, the next day) re-expressed as DATA:
    * each event is mapped to the scheduled run that would pick it up
    * (`ts <= day's 17:00` → today's fire, else tomorrow's — the
    * reference's strict `next < now` comparison), then the batch census
    * per fire slot. The wall-clock loop itself stays outside the engine
    * (SURVEY §3); this is its engine-side analogue, the same shape
    * `Trigger.ProcessingTime` batches resolve to in LiveFeed.
    */
  val s4ScheduleFire: Q = Q(
    "s4_schedule_fire",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), col("ts"))
        .withColumn("day_fire", expr("date_trunc('DAY', ts) + INTERVAL '17' HOUR"))
        .withColumn("next_fire",
          when(col("ts") <= col("day_fire"), col("day_fire"))
            .otherwise(expr("day_fire + INTERVAL '1' DAY")))
        .groupBy("next_fire")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy("next_fire"),
    Some("""WITH f AS (SELECT event_id, ts,
          date_trunc('day', ts) + INTERVAL 17 HOUR AS day_fire
        FROM events)
      SELECT CASE WHEN ts <= day_fire THEN day_fire
                  ELSE day_fire + INTERVAL 1 DAY END AS next_fire,
        count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
      FROM f GROUP BY next_fire ORDER BY next_fire""")
  )

  /** S5: late-data census — a deterministic batch REPLAY of watermark
    * semantics (the accounting every streaming job reports next to its
    * windows): events carry a synthetic arrival time (event time + an
    * event_id-derived network jitter ≤ 2 min — the h5 stand-in
    * convention); replayed in arrival order with a 30 s allowed lateness,
    * a row is DROPPED iff the watermark when it arrives (max event time
    * over strictly-earlier arrivals, minus the lateness) has passed its
    * 10-minute window's end — exactly `withWatermark`'s drop rule. Output:
    * per window, on-time vs dropped counts.
    *
    * Exactness: all µs-integer arithmetic; arrival order totals on
    * (arr, event_id); the globally-first row has no watermark and is
    * on-time by the −1 sentinel (event times are non-negative) — spelled
    * identically in both engines.
    *
    * Scale: the prefix max over GLOBAL arrival order is the a24 rule —
    * distributed as per-hour-bucket running maxes (parallel windows)
    * plus an O(hours) bucket-offset census broadcast back; nothing
    * sequential ever holds more than one bucket.
    */
  val s5LateData: Q = {
    val lateUs = 30000000L
    val winUs = 600000000L
    val hourUs = 3600000000L
    Q(
      "s5_late_data",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = t(s, dir, "events")
          .select(col("event_id"), unix_micros(col("ts")).as("t"))
          .withColumn("arr", col("t") + (col("event_id") % 120) * 1000000L)
          .withColumn("bkt", expr(s"arr div $hourUs"))
        val wIn = Window.partitionBy("bkt").orderBy(col("arr"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wOff = Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = ev.groupBy("bkt").agg(max(col("t")).as("bmax"))
          .select(col("bkt"),
            coalesce(max(col("bmax")).over(wOff), lit(-1L)).as("off"))
        ev
          .withColumn("inmax", coalesce(max(col("t")).over(wIn), lit(-1L)))
          .join(broadcast(offsets), Seq("bkt"))
          .select(col("t"),
            (greatest(col("inmax"), col("off")) - lateUs).as("wm"))
          .select(expr(s"(t div $winUs) * $winUs").as("win_start"),
            when(col("wm") > expr(s"(t div $winUs + 1) * $winUs"), 1L)
              .otherwise(0L).as("late"))
          .groupBy("win_start")
          .agg(count(lit(1)).as("n_total"),
            sum(col("late")).as("n_dropped"),
            (count(lit(1)) - sum(col("late"))).as("n_ontime"))
          .orderBy("win_start")
      },
      Some(s"""WITH ev AS (
          SELECT event_id, epoch_us(ts) AS t,
                 epoch_us(ts) + (event_id % 120) * 1000000 AS arr
          FROM events),
        r AS (SELECT t,
                coalesce(max(t) OVER (ORDER BY arr, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  - $lateUs AS wm
              FROM ev),
        f AS (SELECT (t // $winUs) * $winUs AS win_start,
                CASE WHEN wm > (t // $winUs + 1) * $winUs THEN 1 ELSE 0 END AS late
              FROM r)
        SELECT win_start, count(*) AS n_total,
               CAST(sum(late) AS BIGINT) AS n_dropped,
               CAST(count(*) - sum(late) AS BIGINT) AS n_ontime
        FROM f GROUP BY win_start ORDER BY win_start""")
    )
  }

  val all: Seq[Q] = Seq(s1Tumbling, s2Sliding, s3Session, s4ScheduleFire,
    s5LateData)
}
