package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series maintenance surface the reference's price store needs around
  * its daily bars (`download_historical_price.py` keeps one row per trading
  * day per symbol; `compare_parquet.py` inspects them): calendar gap-filling
  * with forward-fill, corporate-action back-adjustment, sweep-line
  * concurrency, and volatility bands. Everything keys on the event stream's
  * (user_id, ts) the way the bar store keys on (symbol, day).
  *
  * Determinism notes (SURVEY §7.3.1): days and instants are integer
  * epoch-days / epoch-microseconds (the w12 rule — engine-native date parts
  * differ); carried doubles are either untouched (h4 forwards the stored
  * value bit-for-bit) or multiplied/divided by powers of two only (h5 —
  * exponent arithmetic is exact in IEEE); w13 quantizes the input once and
  * stays in BIGINT cross-multiplied comparisons from there.
  */
object TimeSeries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private val epochDay = lit("1970-01-01").cast("date")

  /** H4: calendar gap-fill + forward-fill — rebuild a dense per-key daily
    * series from sparse observations: last-observation-per-day becomes the
    * day's close, missing calendar days inside the key's own [first, last]
    * span are materialized and carry the previous close forward
    * (`is_filled = 1`). This is the resample step every bar consumer runs
    * before indicators (the reference stores sparse trading days;
    * technical analysis wants a dense axis).
    *
    * Scale: ONE shuffle on the key serves all three stages — the per-day
    * close window, the span aggregate, and the fill window all partition
    * by `user_id` (Catalyst reuses the exchange). The calendar explode is
    * `sequence(first, last)` per KEY — output is bounded by key-count ×
    * span-days, never by a global calendar join; no global sort until the
    * final presentation ORDER BY. Forward fill is `last(ignoreNulls)`
    * over a rows-frame — linear per key, resumable per partition at any
    * scale.
    */
  val h4GapFill: Q = Q(
    "h4_gap_fill",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"))
      val wDay = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = ev
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("day"), col("value").as("obs"))
      val cal = daily
        .groupBy("user_id")
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      val wFill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("obs"), ignoreNulls = true).over(wFill).as("close"),
          when(col("obs").isNull, lit(1)).otherwise(lit(0)).as("is_filled"))
        .orderBy("user_id", "day")
    },
    Some("""WITH obs AS (
        SELECT user_id, day, value AS obs FROM (
          SELECT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, value,
                 row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      cal AS (
        SELECT user_id, unnest(generate_series(d0, d1)) AS day
        FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY user_id))
      SELECT c.user_id, c.day,
             last_value(o.obs IGNORE NULLS) OVER (
               PARTITION BY c.user_id ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS close,
             CASE WHEN o.obs IS NULL THEN 1 ELSE 0 END AS is_filled
      FROM cal c LEFT JOIN obs o ON c.user_id = o.user_id AND c.day = o.day
      ORDER BY c.user_id, c.day""")
  )

  /** H5: corporate-action back-adjustment — the reference's raw daily bars
    * are split-unaware; analysis needs every pre-split price divided by the
    * product of all LATER split ratios (a 2:1 split halves history). Split
    * events here are a deterministic sparse subset of `signup` events with
    * ratio 2^k (k ∈ {1,2} — 2:1 / 4:1), standing in for an actions feed.
    *
    * Exactness: the running product is a running SUM of exponents (ratios
    * are powers of two), and dividing an IEEE double by 2^e only shifts
    * its exponent — `adj_value` is bit-identical on both engines, with no
    * log/exp in sight. Per-key exponent totals stay ≤ ~32 at any corpus
    * scale that keeps splits rarer than 1/day (shiftleft(1L, e) is exact
    * to e = 62; the sf0.1 max is 6).
    *
    * Scale: the as-of union trick (h3's contract) — facts and splits union
    * into ONE user-keyed descending window, so the "product of later
    * splits" is a running sum, never a range join and never a per-fact
    * re-scan of the actions table.
    */
  val h5SplitAdjust: Q = Q(
    "h5_split_adjust",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val splits = ev
        .filter(col("event_type") === "signup" && expr("event_id % 7") === 0)
        .select(col("user_id"), col("ts"), col("event_id"),
          (expr("(event_id div 7) % 2") + 1).cast("long").as("k"),
          lit(null).cast("double").as("value"))
      val facts = ev
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"),
          lit(0L).as("k"), col("value"))
      val wLater = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      facts.unionByName(splits)
        .withColumn("adj_exp", sum(col("k")).over(wLater))
        .filter(col("k") === 0)
        .select(col("event_id"), col("value"), col("adj_exp"),
          (col("value") / expr("shiftleft(cast(1 as bigint), cast(adj_exp as int))"))
            .as("adj_value"))
        .orderBy("event_id")
    },
    Some("""WITH splits AS (
        SELECT user_id, ts, event_id, CAST((event_id // 7) % 2 + 1 AS BIGINT) AS k,
               CAST(NULL AS DOUBLE) AS value
        FROM events WHERE event_type = 'signup' AND event_id % 7 = 0),
      facts AS (
        SELECT user_id, ts, event_id, 0::BIGINT AS k, value
        FROM events WHERE event_type = 'purchase'),
      u AS (SELECT * FROM facts UNION ALL SELECT * FROM splits),
      r AS (SELECT *, CAST(sum(k) OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS adj_exp
            FROM u)
      SELECT event_id, value, adj_exp,
             value / (1::BIGINT << CAST(adj_exp AS INTEGER)) AS adj_value
      FROM r WHERE k = 0 ORDER BY event_id""")
  )

  /** A24: sweep-line concurrency — peak simultaneous open intervals per
    * day, the load-curve statistic behind capacity planning ("how many
    * sessions were live at once"). Each `view` opens a 20-minute half-open
    * interval; the classic sweep turns intervals into ±1 deltas and a
    * running sum. Reported value is the max over the day's delta instants
    * (concurrency is piecewise-constant between deltas, so that is the
    * day's true peak whenever the day has any activity — both engines
    * compute the identical definition).
    *
    * Scale: a GLOBAL running sum is the textbook sequential trap — this
    * plans it as a distributed two-level prefix sum instead: each delta
    * keys to an hour bucket; within-bucket running sums partition by
    * bucket (parallel), bucket totals form an O(hours) census whose
    * running offset is a bounded window (720 rows/month — documented
    * bounded, the v6/c10 census rule), broadcast back. Order within a
    * bucket is (t, delta) with closes before opens at the same instant,
    * the half-open convention; equal deltas commute so every engine's
    * running sum passes through the same value multiset.
    */
  val a24Concurrency: Q = Q(
    "a24_concurrency",
    (s, dir) => {
      val hourUs = 3600000000L
      val dayUs = 86400000000L
      val v = t(s, dir, "events")
        .filter(col("event_type") === "view")
        .select(unix_micros(col("ts")).as("t"))
      val deltas = v.select(col("t"), lit(1L).as("d"))
        .unionByName(v.select((col("t") + lit(1200000000L)).as("t"), lit(-1L).as("d")))
        .withColumn("bkt", expr(s"t div $hourUs"))
      val wIn = Window.partitionBy("bkt").orderBy(col("t"), col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wOff = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = deltas
        .groupBy("bkt").agg(sum(col("d")).as("bsum"))
        .select(col("bkt"), coalesce(sum(col("bsum")).over(wOff), lit(0L)).as("off"))
      deltas
        .withColumn("run", sum(col("d")).over(wIn))
        .join(broadcast(offsets), Seq("bkt"))
        .select(expr(s"t div $dayUs").as("day"), (col("off") + col("run")).as("active"))
        .groupBy("day")
        .agg(max(col("active")).as("max_active"), count(lit(1)).as("n_deltas"))
        .orderBy("day")
    },
    Some("""WITH v AS (SELECT epoch_us(ts) AS t FROM events WHERE event_type = 'view'),
      deltas AS (
        SELECT t, 1::BIGINT AS d FROM v
        UNION ALL SELECT t + 1200000000, -1::BIGINT FROM v),
      r AS (SELECT t, sum(d) OVER (ORDER BY t, d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
            FROM deltas)
      SELECT t // 86400000000 AS day, CAST(max(active) AS BIGINT) AS max_active,
             count(*) AS n_deltas
      FROM r GROUP BY 1 ORDER BY day""")
  )

  /** W13: Bollinger-band breaches — per key, flag observations falling
    * outside mean ± 2σ of their trailing 10-observation window, then
    * report breach counts per key (the volatility-band alert every
    * technical stack derives from w2's moving average).
    *
    * Exactness: the input is quantized ONCE (2^-10 units — `value` ≤ 491
    * so quantized magnitudes stay < 2^19) and the band test is the
    * cross-multiplied integer identity
    * `(n·v − Σx)² > 4·(n·Σx² − (Σx)²)`  ⟺  (v − μ)² > (2σ)²,
    * so no float division or sqrt ever runs; worst-case terms reach
    * ~2^46, far under BIGINT (headroom documented the w11 way: safe to
    * inputs < 2^21 quanta ≈ 2000.0).
    *
    * Scale: one user-keyed shuffle; both trailing sums share one window
    * frame; the breach flags are narrow codegen; the final rollup is a
    * map-side-combinable count per key.
    */
  val w13Bollinger: Q = Q(
    "w13_bollinger",
    (s, dir) => {
      val wTrail = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-9, Window.currentRow)
      val wRn = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rn", row_number().over(wRn))
        .withColumn("sx", sum(col("vq")).over(wTrail))
        .withColumn("sxx", sum(col("vq") * col("vq")).over(wTrail))
        .filter(col("rn") >= 10)
        .select(col("user_id"),
          (lit(10) * col("vq") - col("sx")).as("dev"),
          (lit(10) * col("sxx") - col("sx") * col("sx")).as("b"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pts"),
          sum(when(col("dev") > 0 && col("dev") * col("dev") > lit(4) * col("b"), 1L)
            .otherwise(0L)).as("n_up"),
          sum(when(col("dev") < 0 && col("dev") * col("dev") > lit(4) * col("b"), 1L)
            .otherwise(0L)).as("n_down"))
        .orderBy("user_id")
    },
    Some("""WITH q AS (
        SELECT user_id, ts, event_id, CAST(round(value * 1024) AS BIGINT) AS vq
        FROM events),
      w AS (SELECT user_id,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
              CAST(sum(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS sx,
              CAST(sum(vq * vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS sxx,
              vq
            FROM q),
      d AS (SELECT user_id, 10 * vq - sx AS dev, 10 * sxx - sx * sx AS b
            FROM w WHERE rn >= 10)
      SELECT user_id, count(*) AS n_pts,
             CAST(sum(CASE WHEN dev > 0 AND dev * dev > 4 * b THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             CAST(sum(CASE WHEN dev < 0 AND dev * dev > 4 * b THEN 1 ELSE 0 END) AS BIGINT) AS n_down
      FROM d GROUP BY user_id ORDER BY user_id""")
  )

  /** W14: RSI overbought/oversold census — the Relative Strength Index
    * (simple-average variant) over the trailing 14 deltas: RSI =
    * gains/(gains+losses), reported per key as counts of
    * overbought (> 70 %) and oversold (< 30 %) observations — the other
    * standard technical-indicator shape next to w13's bands (Wilder's
    * recursive smoothing is w9's EWMA fold; the SMA variant here keeps
    * the window algebra exact).
    *
    * Exactness: deltas are differences of the ONE 2^-10 input
    * quantization; gains/losses are `greatest(±diff, 0)` longs; RSI is a
    * single integer floor division of non-negative operands, guarded
    * against the all-flat zero denominator explicitly (DuckDB's `//`
    * errors on zero where Spark's `div` yields null — the guard keeps
    * the expression out of both).
    *
    * Scale: one user-keyed shuffle serves the lag window, the ranking
    * and both trailing sums; the final rollup is a map-side-combinable
    * count per key.
    */
  val w14Rsi: Q = Q(
    "w14_rsi",
    (s, dir) => {
      val wSeq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val w14 = wSeq.rowsBetween(-13, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("diff", col("vq") - lag(col("vq"), 1).over(wSeq))
        .filter(col("diff").isNotNull)
        .withColumn("rn", row_number().over(wSeq))
        .withColumn("gs", sum(greatest(col("diff"), lit(0L))).over(w14))
        .withColumn("ls", sum(greatest(-col("diff"), lit(0L))).over(w14))
        .filter(col("rn") >= 14)
        .select(col("user_id"),
          when(col("gs") + col("ls") > 0, expr("(1000 * gs) div (gs + ls)"))
            .as("rsi_pm"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_obs"),
          sum(when(col("rsi_pm") > 700, 1L).otherwise(0L)).as("n_overbought"),
          sum(when(col("rsi_pm") < 300, 1L).otherwise(0L)).as("n_oversold"))
        .orderBy("user_id")
    },
    Some("""WITH q AS (
        SELECT user_id, ts, event_id, CAST(round(value * 1024) AS BIGINT) AS vq
        FROM events),
      d AS (SELECT user_id, ts, event_id,
              vq - lag(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS diff
            FROM q),
      r AS (SELECT user_id,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
              CAST(sum(greatest(diff, 0)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS gs,
              CAST(sum(greatest(-diff, 0)) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS ls
            FROM d WHERE diff IS NOT NULL),
      rsi AS (SELECT user_id,
                CASE WHEN gs + ls > 0 THEN (1000 * gs) // (gs + ls) END AS rsi_pm
              FROM r WHERE rn >= 14)
      SELECT user_id, count(*) AS n_obs,
        CAST(sum(CASE WHEN rsi_pm > 700 THEN 1 ELSE 0 END) AS BIGINT) AS n_overbought,
        CAST(sum(CASE WHEN rsi_pm < 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversold
      FROM rsi GROUP BY user_id ORDER BY user_id""")
  )

  /** H6: per-day VWAP — volume-weighted average price per (key, day), the
    * headline metric every bar consumer derives before anything else
    * (`update_live_price.py` keeps close+volume per bar; VWAP is their
    * canonical combination). The corpus carries no size column, so volume
    * is a deterministic event_id stand-in (the h5 splits convention) —
    * the weighted-aggregate dataflow is the real operator.
    *
    * Exactness: price is quantized ONCE at 2^-10; Σ(pq·vol) and Σvol are
    * exact BIGINTs; `vwap` is ONE IEEE division of identical operands on
    * both engines followed by an exact /1024 exponent shift.
    *
    * Scale: a single map-side-combinable hash aggregate keyed
    * (user_id, day) — no window, no join; the same one-shuffle shape as
    * a2 at any corpus size.
    */
  val h6Vwap: Q = Q(
    "h6_vwap",
    (s, dir) =>
      t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("pq"),
          (col("event_id") % 97 + 1).cast("long").as("vol"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_trades"),
          sum(col("vol")).as("vol_total"),
          (sum(col("pq") * col("vol")).cast("double") / sum(col("vol")) / 1024)
            .as("vwap"))
        .orderBy("user_id", "day"),
    Some("""SELECT user_id, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        count(*) AS n_trades,
        CAST(sum(vol) AS BIGINT) AS vol_total,
        CAST(sum(pq * vol) AS DOUBLE) / sum(vol) / 1024 AS vwap
      FROM (SELECT user_id, ts, CAST(round(value * 1024) AS BIGINT) AS pq,
              CAST(event_id % 97 + 1 AS BIGINT) AS vol
            FROM events WHERE event_type = 'purchase')
      GROUP BY 1, 2 ORDER BY user_id, day""")
  )

  /** H7: weekly OHLCV resample — downsample the event stream to one bar
    * per (key, week): open = first value in (ts, event_id) order, close =
    * last, high/low = max/min, plus count and exact turnover. The
    * downsample direction the reference's daily store implies (h4 is the
    * upsample direction; a5 is the identity).
    *
    * Determinism: open/close are ordered-first/last — expressed as two
    * row_number ranks (ascending + descending, explicit event_id
    * tiebreak) folded through conditional max, the engine-neutral
    * spelling of FIRST/LAST IGNORE NULLS ordered aggregates. high/low/
    * turnover are order-independent (max/min of doubles; DECIMAL-routed
    * sum).
    *
    * Scale: both rank windows and the final aggregate share the ONE
    * (user_id, wk)-keyed exchange (Catalyst reuses it; the two windows
    * differ only in sort order). Weeks-per-key is calendar-bounded, so
    * partitions stay balanced at any corpus size.
    */
  val h7WeeklyBars: Q = Q(
    "h7_weekly_bars",
    (s, dir) => {
      val wA = Window.partitionBy("user_id", "wk")
        .orderBy(col("ts"), col("event_id"))
      val wD = Window.partitionBy("user_id", "wk")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"))
        .withColumn("wk", expr("day div 7"))
        .withColumn("rna", row_number().over(wA))
        .withColumn("rnd", row_number().over(wD))
        .groupBy("user_id", "wk")
        .agg(
          max(when(col("rna") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rnd") === 1, col("value"))).as("close"),
          count(lit(1)).as("n_obs"),
          Q.dsum(col("value")).as("turnover"))
        .orderBy("user_id", "wk")
    },
    Some("""WITH e AS (
        SELECT user_id, ts, event_id, value,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) // 7 AS wk
        FROM events),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY user_id, wk ORDER BY ts, event_id) AS rna,
              row_number() OVER (PARTITION BY user_id, wk ORDER BY ts DESC, event_id DESC) AS rnd
            FROM e)
      SELECT user_id, wk,
        max(CASE WHEN rna = 1 THEN value END) AS open,
        max(value) AS high,
        min(value) AS low,
        max(CASE WHEN rnd = 1 THEN value END) AS close,
        count(*) AS n_obs,
        CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS turnover
      FROM r GROUP BY user_id, wk ORDER BY user_id, wk""")
  )

  /** H8: market beta — per key, the OLS slope of its daily-close returns
    * against the cross-sectional market index (the equal-weight mean of
    * all keys' quantized closes that day), the factor-exposure statistic
    * every portfolio layer computes from the bar store.
    *
    * Exactness: closes are quantized ONCE at 2^-10; the market index is
    * an integer floor-division mean of non-negative operands (identical
    * `div`/`//` semantics); returns are integer diffs; the slope's
    * numerator/denominator are the cross-multiplied BIGINT identities
    * n·Σxy − Σx·Σy / n·Σxx − (Σx)², and `beta` is ONE IEEE division of
    * those exact operands. Headroom (the w11 rule): terms reach
    * n²·r̄·max|r| ≈ 2^50 at 30 days × 2^20 quanta; safe to ~2,900 days
    * per key at this quantization (coarsen the quantum for longer
    * histories).
    *
    * Scale: daily closes are one (user, day) rank window; the market
    * census is O(calendar days) — bounded by time, not corpus — and
    * broadcast back (the a24 offset-census rule); returns + all five
    * sums ride ONE user-keyed exchange. Keys observed on a single day
    * have no return row and drop out of the output on both engines.
    */
  val h8Beta: Q = Q(
    "h8_beta",
    (s, dir) => {
      val wDay = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1)
        .select("user_id", "day", "vq")
      val market = daily.groupBy("day")
        .agg(expr("sum(vq) div count(1)").as("mq"))
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      val sums = daily
        .join(broadcast(market), Seq("day"))
        .withColumn("ru", col("vq") - lag(col("vq"), 1).over(wSeq))
        .withColumn("rm", col("mq") - lag(col("mq"), 1).over(wSeq))
        .filter(col("ru").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(col("rm")).as("sx"), sum(col("ru")).as("sy"),
          sum(col("rm") * col("ru")).as("sxy"),
          sum(col("rm") * col("rm")).as("sxx"))
      sums
        .select(col("user_id"), col("n").as("n_rets"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("var_den"))
        .withColumn("beta",
          when(col("var_den") > 0,
            col("cov_num").cast("double") / col("var_den")))
        .orderBy("user_id")
    },
    Some("""WITH daily AS (
        SELECT user_id, day, vq FROM (
          SELECT user_id,
                 CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                 CAST(round(value * 1024) AS BIGINT) AS vq,
                 row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      market AS (SELECT day, CAST(sum(vq) AS BIGINT) // count(*) AS mq
                 FROM daily GROUP BY day),
      rets AS (SELECT user_id,
                 vq - lag(vq) OVER w AS ru,
                 mq - lag(mq) OVER w AS rm
               FROM daily JOIN market USING (day)
               WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      sums AS (SELECT user_id, count(*) AS n,
                 CAST(sum(rm) AS BIGINT) AS sx, CAST(sum(ru) AS BIGINT) AS sy,
                 CAST(sum(rm * ru) AS BIGINT) AS sxy,
                 CAST(sum(rm * rm) AS BIGINT) AS sxx
               FROM rets WHERE ru IS NOT NULL GROUP BY user_id)
      SELECT user_id, n AS n_rets,
        n * sxy - sx * sy AS cov_num,
        n * sxx - sx * sx AS var_den,
        CASE WHEN n * sxx - sx * sx > 0
             THEN CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) END AS beta
      FROM sums ORDER BY user_id""")
  )

  /** W16: underwater duration — per key, the longest run of consecutive
    * observed days spent strictly below the running peak close, plus the
    * total underwater day count: "time under water", the drawdown-DURATION
    * risk statistic next to w10's drawdown MAGNITUDE (a portfolio can have
    * shallow but chronic drawdowns that w10 never flags).
    *
    * Determinism: closes are the (ts, event_id)-last observation per day
    * (h8's rule), quantized once; the running peak is an integer prefix
    * max; spells are gaps-and-islands on OBSERVATION order (w8's
    * row_number-difference trick on the observed-day sequence — calendar
    * holes do not break a spell, matching how trading-day series are
    * read). Keys that never dip carry zeros via the left join.
    *
    * Scale: ONE user-keyed exchange serves the daily-close rank window,
    * the prefix-max window, both island row_numbers and the final
    * per-user aggregate; nothing global, nothing beyond (key, day) rows
    * ever shuffles.
    */
  val w16Underwater: Q = Q(
    "w16_underwater",
    (s, dir) => {
      val wDay = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      val daily = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("day"), col("vq"))
        .withColumn("peak",
          max(col("vq")).over(wSeq.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rna", row_number().over(wSeq))
      val spells = daily.filter(col("vq") < col("peak"))
        .withColumn("grp", col("rna") - row_number().over(wSeq))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_spells"), max(col("len")).as("max_spell"),
          sum(col("len")).as("n_underwater"))
      daily.groupBy("user_id").agg(count(lit(1)).as("n_days"))
        .join(spells, Seq("user_id"), "left")
        .select(col("user_id"), col("n_days"),
          coalesce(col("n_underwater"), lit(0L)).as("n_underwater"),
          coalesce(col("n_spells"), lit(0L)).as("n_spells"),
          coalesce(col("max_spell"), lit(0L)).as("max_spell"))
        .orderBy("user_id")
    },
    Some("""WITH daily AS (
        SELECT user_id, day, vq,
               CAST(max(vq) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak,
               row_number() OVER (PARTITION BY user_id ORDER BY day) AS rna
        FROM (
          SELECT user_id, day, vq FROM (
            SELECT user_id,
                   CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                   CAST(round(value * 1024) AS BIGINT) AS vq,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1)),
      spells AS (
        SELECT user_id, count(*) AS len FROM (
          SELECT user_id,
                 rna - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
          FROM daily WHERE vq < peak)
        GROUP BY user_id, grp),
      agg AS (SELECT user_id, count(*) AS n_spells,
                     CAST(max(len) AS BIGINT) AS max_spell,
                     CAST(sum(len) AS BIGINT) AS n_underwater
              FROM spells GROUP BY user_id),
      nd AS (SELECT user_id, count(*) AS n_days FROM daily GROUP BY user_id)
      SELECT nd.user_id, nd.n_days,
             coalesce(a.n_underwater, 0) AS n_underwater,
             coalesce(a.n_spells, 0) AS n_spells,
             coalesce(a.max_spell, 0) AS max_spell
      FROM nd LEFT JOIN agg a ON a.user_id = nd.user_id
      ORDER BY nd.user_id""")
  )

  /** H9: overnight gaps — per key, compare each day's OPEN to the previous
    * observed day's CLOSE and census the material gaps (> 2 % either way):
    * the bar-boundary discontinuity statistic every daily-bar consumer
    * watches (splits, news, stale feeds all surface as gaps — and a feed
    * whose gaps explode is h5's missing-adjustment symptom).
    *
    * Exactness: open/close are the (ts, event_id)-ordered first/last
    * observations per day (h7's rule), quantized once; the 2 % test is the
    * cross-multiplied integer comparison |open − prev_close|·50 >
    * prev_close (prev_close ≥ 0), so no division ever runs.
    *
    * Scale: one user-keyed exchange serves the daily rank windows, the
    * lag and the final rollup — (key, day) rows only.
    */
  val h9OvernightGap: Q = Q(
    "h9_overnight_gap",
    (s, dir) => {
      val wA = Window.partitionBy("user_id", "day")
        .orderBy(col("ts"), col("event_id"))
      val wD = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rna", row_number().over(wA))
        .withColumn("rnd", row_number().over(wD))
        .groupBy("user_id", "day")
        .agg(max(when(col("rna") === 1, col("vq"))).as("openq"),
          max(when(col("rnd") === 1, col("vq"))).as("closeq"))
        .withColumn("prev_close", lag(col("closeq"), 1).over(wSeq))
        .filter(col("prev_close").isNotNull)
        .select(col("user_id"),
          (col("openq") - col("prev_close")).as("gapq"), col("prev_close"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_overnights"),
          sum(when(col("gapq") * 50 > col("prev_close"), 1L).otherwise(0L))
            .as("n_gap_up"),
          sum(when(-col("gapq") * 50 > col("prev_close"), 1L).otherwise(0L))
            .as("n_gap_down"))
        .orderBy("user_id")
    },
    Some("""WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(round(value * 1024) AS BIGINT) AS vq
        FROM events),
      r AS (SELECT *,
              row_number() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS rna,
              row_number() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rnd
            FROM q),
      bars AS (SELECT user_id, day,
                 max(CASE WHEN rna = 1 THEN vq END) AS openq,
                 max(CASE WHEN rnd = 1 THEN vq END) AS closeq
               FROM r GROUP BY user_id, day),
      g AS (SELECT user_id,
              openq - lag(closeq) OVER (PARTITION BY user_id ORDER BY day) AS gapq,
              lag(closeq) OVER (PARTITION BY user_id ORDER BY day) AS prev_close
            FROM bars)
      SELECT user_id, count(*) AS n_overnights,
        CAST(sum(CASE WHEN gapq * 50 > prev_close THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_up,
        CAST(sum(CASE WHEN -gapq * 50 > prev_close THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_down
      FROM g WHERE prev_close IS NOT NULL
      GROUP BY user_id ORDER BY user_id""")
  )

  /** W15: MACD — the trend indicator pair the reference's bar consumers run
    * after w9's single EWMA: a fast and a slow exponential average of the
    * daily revenue series, their difference (the MACD line), and a third
    * EWMA of THAT difference (the signal line), plus the histogram gap.
    * Classic (12, 26, 9) row spans with power-of-two smoothing factors
    * (1/4, 1/8, 1/4).
    *
    * Determinism (w9's recipe, applied three times): each EWMA is a fold
    * over the window's day-sorted value array — both engines run the
    * IDENTICAL left fold over identical IEEE doubles — and each folded
    * value is floor-quantized to 6dp before further use, so the macd
    * subtraction and the signal fold consume exact quantized inputs; no
    * round-half tie semantics anywhere (w9's observed 1-ulp trap).
    *
    * Scale: the daily series is one row per calendar day (an aggregate of
    * the fact table, bounded by the calendar — ~2.5k rows at any SF), so
    * the three unpartitioned windows rank a calendar, never the corpus;
    * the single fact-table pass is the map-side-combinable daily sum.
    */
  val w15Macd: Q = Q(
    "w15_macd",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
          .cast("long")).as("rev_u"))
        .select(col("d"), (col("rev_u").cast("double") / 10000).as("rev"))
      def emaF6(src: Column, w: org.apache.spark.sql.expressions.WindowSpec,
                alpha: Double): Column = {
        val arr = transform(
          array_sort(collect_list(struct(col("d"), src.as("x"))).over(w)),
          e => e("x"))
        floor(aggregate(
          slice(arr, lit(2), size(arr) - 1),
          element_at(arr, 1),
          (acc, x) => acc * lit(1.0 - alpha) + x * lit(alpha)) * 1000000) / 1000000
      }
      val wFast = Window.orderBy("d").rowsBetween(-11, 0)
      val wSlow = Window.orderBy("d").rowsBetween(-25, 0)
      val wSig = Window.orderBy("d").rowsBetween(-8, 0)
      daily
        .withColumn("ema_fast_f6", emaF6(col("rev"), wFast, 0.25))
        .withColumn("ema_slow_f6", emaF6(col("rev"), wSlow, 0.125))
        .withColumn("macd_f6", col("ema_fast_f6") - col("ema_slow_f6"))
        .withColumn("signal_f6", emaF6(col("macd_f6"), wSig, 0.25))
        .select(col("d"), col("rev"), col("macd_f6"), col("signal_f6"),
          (col("macd_f6") - col("signal_f6")).as("hist"))
        .orderBy("d")
    },
    Some("""WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
                 AS DOUBLE) / 10000 AS rev
        FROM lineitem GROUP BY 1),
      emas AS (
        SELECT d, rev,
          floor(list_reduce(list_transform(
            list_sort(list(struct_pack(d := d, x := rev))
              OVER (ORDER BY d ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)),
            e -> e.x), (a, b) -> a * 0.75 + b * 0.25) * 1000000) / 1000000
            AS ema_fast_f6,
          floor(list_reduce(list_transform(
            list_sort(list(struct_pack(d := d, x := rev))
              OVER (ORDER BY d ROWS BETWEEN 25 PRECEDING AND CURRENT ROW)),
            e -> e.x), (a, b) -> a * 0.875 + b * 0.125) * 1000000) / 1000000
            AS ema_slow_f6
        FROM daily),
      macd AS (SELECT d, rev, ema_fast_f6 - ema_slow_f6 AS macd_f6 FROM emas)
      SELECT d, rev, macd_f6,
        floor(list_reduce(list_transform(
          list_sort(list(struct_pack(d := d, x := macd_f6))
            OVER (ORDER BY d ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)),
          e -> e.x), (a, b) -> a * 0.75 + b * 0.25) * 1000000) / 1000000
          AS signal_f6,
        macd_f6 - floor(list_reduce(list_transform(
          list_sort(list(struct_pack(d := d, x := macd_f6))
            OVER (ORDER BY d ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)),
          e -> e.x), (a, b) -> a * 0.75 + b * 0.25) * 1000000) / 1000000
          AS hist
      FROM macd ORDER BY d""")
  )

  /** H10: rolling correlation vs the market — h8's beta decomposition made
    * time-varying: per user, the Pearson correlation of the user's daily
    * return against the equal-weight market return over a rolling 20-return
    * window (the corpus spans ~30 calendar days, so 20 returns is the
    * longest window that still yields a rolling series).
    *
    * Determinism: closes are h8's (ts, event_id)-last daily observation
    * quantized ×1024; the market mean is an integer `div`; returns are
    * integer lags; every window sum (Σx, Σy, Σxy, Σx², Σy²) is BIGINT-exact,
    * as are the correlation numerator n·Σxy−ΣxΣy and the two variance
    * terms. Only the final corr divides — num / √(den1·den2) — where both
    * engines cast the identical BIGINTs to double and run the identical
    * IEEE multiply/sqrt/divide (den products can exceed 2^53; the cast
    * rounds identically on both engines, so the output is bit-stable
    * without being exact — the integer num/den1/den2 columns carry the
    * exact statistic).
    *
    * Scale: ONE user-keyed exchange serves the daily-close rank window,
    * the return lag and the five rolling sums (same partition key
    * throughout); the market census is a day-keyed aggregate broadcast
    * back. Rolling frames are streaming (O(1) state per row).
    */
  val h10RollingCorr: Q = Q(
    "h10_rolling_corr",
    (s, dir) => {
      val wDay = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1)
        .select("user_id", "day", "vq")
      val market = daily.groupBy("day")
        .agg(expr("sum(vq) div count(1)").as("mq"))
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      val rets = daily
        .join(broadcast(market), Seq("day"))
        .withColumn("ru", col("vq") - lag(col("vq"), 1).over(wSeq))
        .withColumn("rm", col("mq") - lag(col("mq"), 1).over(wSeq))
        .filter(col("ru").isNotNull)
      val wRoll = Window.partitionBy("user_id").orderBy("day").rowsBetween(-19, 0)
      rets
        .select(col("user_id"), col("day"),
          count(lit(1)).over(wRoll).as("n"),
          sum(col("rm")).over(wRoll).as("sx"),
          sum(col("ru")).over(wRoll).as("sy"),
          sum(col("rm") * col("ru")).over(wRoll).as("sxy"),
          sum(col("rm") * col("rm")).over(wRoll).as("sxx"),
          sum(col("ru") * col("ru")).over(wRoll).as("syy"))
        .filter(col("n") === 20)
        .select(col("user_id"), col("day"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den_m"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("den_u"))
        .withColumn("corr",
          when(col("den_m") > 0 && col("den_u") > 0,
            col("num").cast("double") /
              sqrt(col("den_m").cast("double") * col("den_u").cast("double"))))
        .orderBy("user_id", "day")
    },
    Some("""WITH daily AS (
        SELECT user_id, day, vq FROM (
          SELECT user_id,
                 CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                 CAST(round(value * 1024) AS BIGINT) AS vq,
                 row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      market AS (SELECT day, CAST(sum(vq) AS BIGINT) // count(*) AS mq
                 FROM daily GROUP BY day),
      rets AS (SELECT user_id, day,
                 vq - lag(vq) OVER w AS ru,
                 mq - lag(mq) OVER w AS rm
               FROM daily JOIN market USING (day)
               WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      rolled AS (SELECT user_id, day,
                   count(*) OVER wr AS n,
                   CAST(sum(rm) OVER wr AS BIGINT) AS sx,
                   CAST(sum(ru) OVER wr AS BIGINT) AS sy,
                   CAST(sum(rm * ru) OVER wr AS BIGINT) AS sxy,
                   CAST(sum(rm * rm) OVER wr AS BIGINT) AS sxx,
                   CAST(sum(ru * ru) OVER wr AS BIGINT) AS syy
                 FROM rets WHERE ru IS NOT NULL
                 WINDOW wr AS (PARTITION BY user_id ORDER BY day
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      SELECT user_id, day,
        n * sxy - sx * sy AS num,
        n * sxx - sx * sx AS den_m,
        n * syy - sy * sy AS den_u,
        CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
             THEN CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE)) END AS corr
      FROM rolled WHERE n = 20 ORDER BY user_id, day""")
  )

  /** H11: event study — cumulative abnormal return around each series' peak:
    * per user, the "event day" is the highest daily close (earliest day on
    * ties), and the statistic is the sum of abnormal returns (own return
    * minus the equal-weight market return, h8's decomposition) over the
    * ±3-day event window, with the window's observed-return count. The
    * event-study CAR is the standard abnormal-move test in the reference's
    * asset-price domain (did this series move WITH the market into its
    * peak, or idiosyncratically?).
    *
    * Determinism: closes/returns are h8's integer-quantized dailies; the
    * event day is a rank-window argmax with a total (vq DESC, day) order;
    * the CAR is an exact BIGINT sum of integer return differences.
    *
    * Scale: the same ONE user-keyed exchange carries the daily-close rank,
    * the return lag, the event-day argmax (same key, reused partitioning)
    * and the final rollup; the event day rejoins per-user (a key-to-key
    * equi-join, both sides already user-partitioned). Nothing global but
    * the day-keyed market census, which broadcasts back.
    */
  val h11EventStudy: Q = Q(
    "h11_event_study",
    (s, dir) => {
      val wDay = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1)
        .select("user_id", "day", "vq")
      val market = daily.groupBy("day")
        .agg(expr("sum(vq) div count(1)").as("mq"))
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      val rets = daily
        .join(broadcast(market), Seq("day"))
        .withColumn("ru", col("vq") - lag(col("vq"), 1).over(wSeq))
        .withColumn("rm", col("mq") - lag(col("mq"), 1).over(wSeq))
        .filter(col("ru").isNotNull)
        .select("user_id", "day", "ru", "rm")
      val wPeak = Window.partitionBy("user_id").orderBy(col("vq").desc, col("day"))
      val eventDay = daily
        .withColumn("pk", row_number().over(wPeak))
        .filter(col("pk") === 1)
        .select(col("user_id"), col("day").as("event_day"), col("vq").as("peak_vq"))
      rets
        .join(eventDay, Seq("user_id"))
        .filter(abs(col("day") - col("event_day")) <= 3)
        .groupBy("user_id", "event_day", "peak_vq")
        .agg(count(lit(1)).as("n_window_rets"),
          sum(col("ru") - col("rm")).as("car_u"))
        .select(col("user_id"), col("event_day"), col("peak_vq"),
          col("n_window_rets"), col("car_u"),
          (col("car_u").cast("double") / 1024).as("car"))
        .orderBy("user_id")
    },
    Some("""WITH daily AS (
        SELECT user_id, day, vq FROM (
          SELECT user_id,
                 CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
                 CAST(round(value * 1024) AS BIGINT) AS vq,
                 row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      market AS (SELECT day, CAST(sum(vq) AS BIGINT) // count(*) AS mq
                 FROM daily GROUP BY day),
      rets AS (SELECT user_id, day,
                 vq - lag(vq) OVER w AS ru,
                 mq - lag(mq) OVER w AS rm
               FROM daily JOIN market USING (day)
               WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      ev AS (SELECT user_id, day AS event_day, vq AS peak_vq FROM (
               SELECT user_id, day, vq,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY vq DESC, day) AS pk
               FROM daily) WHERE pk = 1)
      SELECT r.user_id, e.event_day, e.peak_vq,
        count(*) AS n_window_rets,
        CAST(sum(r.ru - r.rm) AS BIGINT) AS car_u,
        CAST(CAST(sum(r.ru - r.rm) AS BIGINT) AS DOUBLE) / 1024 AS car
      FROM rets r JOIN ev e ON e.user_id = r.user_id
      WHERE r.ru IS NOT NULL AND abs(r.day - e.event_day) <= 3
      GROUP BY r.user_id, e.event_day, e.peak_vq
      ORDER BY r.user_id""")
  )

  /** H12: Average True Range — the volatility indicator bar consumers run
    * after w13's Bollinger bands: per user-day, the true range
    * `max(hi−lo, |hi−prev_close|, |lo−prev_close|)` over the day's
    * quantized observations, then its 14-day simple moving average (the
    * SMA-ATR variant — Wilder's recursive smoothing would need an
    * unbounded fold; the SMA form is the one whose window algebra stays
    * exact).
    *
    * Determinism: hi/lo/close are BIGINT aggregates of the ×1024-quantized
    * value (h9's bar recipe: close = last by (ts, event_id)); TR is
    * integer max/abs arithmetic; the ATR division is ONE IEEE divide of an
    * exact BIGINT window sum by an exact window count, identical on both
    * engines.
    *
    * Scale: ONE user-keyed exchange serves the per-day bar aggregate, the
    * prev-close lag, and the 14-row rolling frame (same partition key —
    * Catalyst reuses the exchange); the rolling frame is streaming, O(1)
    * state per row; no unpartitioned window anywhere.
    */
  val h12Atr: Q = Q(
    "h12_atr",
    (s, dir) => {
      val wD = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      val wRoll = Window.partitionBy("user_id").orderBy("day").rowsBetween(-13, 0)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rnd", row_number().over(wD))
        .groupBy("user_id", "day")
        .agg(max(col("vq")).as("hi"), min(col("vq")).as("lo"),
          max(when(col("rnd") === 1, col("vq"))).as("closeq"))
        .withColumn("prev_close", lag(col("closeq"), 1).over(wSeq))
        .filter(col("prev_close").isNotNull)
        .withColumn("tr", greatest(col("hi") - col("lo"),
          abs(col("hi") - col("prev_close")),
          abs(col("lo") - col("prev_close"))))
        .withColumn("sum_tr14", sum(col("tr")).over(wRoll))
        .withColumn("n14", count(lit(1)).over(wRoll))
        .select(col("user_id"), col("day"), col("tr"), col("sum_tr14"),
          col("n14"),
          (col("sum_tr14").cast("double") / col("n14")).as("atr14"))
        .orderBy("user_id", "day")
    },
    Some("""WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(round(value * 1024) AS BIGINT) AS vq
        FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
                        ORDER BY ts DESC, event_id DESC) AS rnd FROM q),
      bars AS (SELECT user_id, day, max(vq) AS hi, min(vq) AS lo,
                 max(CASE WHEN rnd = 1 THEN vq END) AS closeq
               FROM r GROUP BY user_id, day),
      tr AS (SELECT user_id, day,
               greatest(hi - lo, abs(hi - prev_close), abs(lo - prev_close)) AS tr
             FROM (SELECT *, lag(closeq) OVER (PARTITION BY user_id ORDER BY day)
                     AS prev_close FROM bars)
             WHERE prev_close IS NOT NULL)
      SELECT user_id, day, tr,
        CAST(sum(tr) OVER w AS BIGINT) AS sum_tr14,
        count(*) OVER w AS n14,
        CAST(CAST(sum(tr) OVER w AS BIGINT) AS DOUBLE) / (count(*) OVER w) AS atr14
      FROM tr
      WINDOW w AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, day""")
  )

  /** W17: on-balance volume — the volume-flow accumulator (sign of the
    * daily close move × the day's volume, summed from series start). Pure
    * integer arithmetic end-to-end: the sign is a three-way CASE on
    * BIGINT closes (a null prev-close on the first day falls through both
    * comparisons to 0 in both engines), volume is the day's event count,
    * and the OBV is an unbounded-preceding BIGINT running sum.
    *
    * Scale: same one user-keyed exchange discipline as h12 — bar
    * aggregate, close lag, and running sum all partition by `user_id`;
    * the running frame is streaming.
    */
  val w17Obv: Q = Q(
    "w17_obv",
    (s, dir) => {
      val wD = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      val wRun = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rnd", row_number().over(wD))
        .groupBy("user_id", "day")
        .agg(max(when(col("rnd") === 1, col("vq"))).as("closeq"),
          count(lit(1)).as("vol"))
        .withColumn("prev_close", lag(col("closeq"), 1).over(wSeq))
        .withColumn("dir",
          when(col("closeq") > col("prev_close"), lit(1L))
            .when(col("closeq") < col("prev_close"), lit(-1L))
            .otherwise(lit(0L)))
        .withColumn("obv", sum(col("dir") * col("vol")).over(wRun))
        .select("user_id", "day", "vol", "dir", "obv")
        .orderBy("user_id", "day")
    },
    Some("""WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(round(value * 1024) AS BIGINT) AS vq
        FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
                        ORDER BY ts DESC, event_id DESC) AS rnd FROM q),
      bars AS (SELECT user_id, day,
                 max(CASE WHEN rnd = 1 THEN vq END) AS closeq,
                 count(*) AS vol
               FROM r GROUP BY user_id, day),
      d AS (SELECT user_id, day, vol,
              CASE WHEN closeq > prev_close THEN 1
                   WHEN closeq < prev_close THEN -1 ELSE 0 END AS dir
            FROM (SELECT *, lag(closeq) OVER (PARTITION BY user_id ORDER BY day)
                    AS prev_close FROM bars))
      SELECT user_id, day, vol, CAST(dir AS BIGINT) AS dir,
        CAST(sum(dir * vol) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
      FROM d ORDER BY user_id, day""")
  )

  /** H13: pairs-trading spread z-score — the stat-arb monitor over two
    * co-traded series: the daily `purchase` and `click` value sums (whole
    * units — see headroom below), their spread, and the spread's rolling
    * 10-day z-score `(n·s − Σs) / √(n·Σs² − (Σs)²)` (mean/std folded into
    * one integer numerator and one integer radicand — h10's discipline).
    *
    * Exactness: daily sums are BIGINT sums of `round(value)`; the spread
    * and both z components are pure BIGINT; only the final z divides,
    * where both engines cast the identical BIGINTs and run the identical
    * multiply/sqrt/divide. Null z (den = 0 or a short leading window) is
    * surfaced, not filtered. Overflow headroom (w11's discipline): daily
    * per-type sums at sf0.1 are ≤ 4·10⁵ units; Σs² over 10 rows stays
    * ≤ 10¹² — the BIGINT radicand holds to ~300× this corpus; quantizing
    * finer (×1024) would burn 2¹⁰ of that margin per factor, which is why
    * this query sums WHOLE units.
    *
    * Scale: two map-side-combinable day-keyed aggregates (one per leg,
    * same exchange — it's one groupBy with conditional sums), one
    * calendar-bounded join, and ONE unpartitioned-BY-DESIGN window whose
    * input is one row per calendar day (~30 here, ~36.5k rows/century at
    * any corpus scale — bounded by the calendar, never the corpus).
    */
  val h13PairsSpread: Q = Q(
    "h13_pairs_spread",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy(datediff(to_date(col("ts")), epochDay).cast("long").as("day"))
        .agg(
          sum(when(col("event_type") === "purchase",
            round(col("value")).cast("long")).otherwise(0L)).as("sa"),
          sum(when(col("event_type") === "click",
            round(col("value")).cast("long")).otherwise(0L)).as("sb"))
      val wRoll = Window.orderBy("day").rowsBetween(-9, 0)
      daily
        .withColumn("s", col("sa") - col("sb"))
        .withColumn("n", count(lit(1)).over(wRoll))
        .withColumn("sum_s", sum(col("s")).over(wRoll))
        .withColumn("sum_s2", sum(col("s") * col("s")).over(wRoll))
        .withColumn("num", col("n") * col("s") - col("sum_s"))
        .withColumn("den", col("n") * col("sum_s2") - col("sum_s") * col("sum_s"))
        .select(col("day"), col("sa"), col("sb"), col("s"), col("n"),
          col("num"), col("den"),
          when(col("den") > 0 && col("n") >= 10,
            col("num").cast("double") / sqrt(col("den").cast("double")))
            .as("z"))
        .orderBy("day")
    },
    Some("""WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
               CAST(sum(CASE WHEN event_type = 'click'
                 THEN CAST(round(value) AS BIGINT) ELSE 0 END) AS BIGINT) AS sb
        FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
      sp AS (SELECT day, sa, sb, sa - sb AS s FROM daily),
      win AS (SELECT day, sa, sb, s,
                count(*) OVER w AS n,
                CAST(sum(s) OVER w AS BIGINT) AS sum_s,
                CAST(sum(s * s) OVER w AS BIGINT) AS sum_s2
              FROM sp
              WINDOW w AS (ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      SELECT day, sa, sb, s, n,
        n * s - sum_s AS num,
        n * sum_s2 - sum_s * sum_s AS den,
        CASE WHEN n * sum_s2 - sum_s * sum_s > 0 AND n >= 10
             THEN CAST(n * s - sum_s AS DOUBLE)
                  / sqrt(CAST(n * sum_s2 - sum_s * sum_s AS DOUBLE))
        END AS z
      FROM win ORDER BY day""")
  )

  /** H14: per-series Sharpe-style ratio — mean over sample-stdev of the
    * daily close move, per user, from the same quantized bars as h12.
    * The ratio is computed from three exact BIGINT statistics
    * (n, Σr, Σr²) as `(Σr/n) / √((n·Σr² − (Σr)²) / (n·(n−1)))` — both
    * engines evaluate the identical expression tree over identical
    * integers, so every IEEE step matches bit-for-bit. Degenerate series
    * (n < 3 or zero variance) surface null, not a division error.
    *
    * Scale: one user-keyed exchange for bars + lag, then one
    * map-side-combinable per-user aggregate — two shuffles total, both on
    * the series key; output is one row per series.
    */
  val h14Sharpe: Q = Q(
    "h14_sharpe",
    (s, dir) => {
      val wD = Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val wSeq = Window.partitionBy("user_id").orderBy("day")
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          datediff(to_date(col("ts")), epochDay).cast("long").as("day"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rnd", row_number().over(wD))
        .groupBy("user_id", "day")
        .agg(max(when(col("rnd") === 1, col("vq"))).as("closeq"))
        .withColumn("r", col("closeq") - lag(col("closeq"), 1).over(wSeq))
        .filter(col("r").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
          sum(col("r") * col("r")).as("ssq"))
        .withColumn("den", col("n") * col("ssq") - col("sr") * col("sr"))
        .select(col("user_id"), col("n"), col("sr"), col("ssq"),
          when(col("n") >= 3 && col("den") > 0,
            (col("sr").cast("double") / col("n")) /
              sqrt(col("den").cast("double") / (col("n") * (col("n") - 1))))
            .as("sharpe"))
        .orderBy("user_id")
    },
    Some("""WITH q AS (
        SELECT user_id, ts, event_id,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(round(value * 1024) AS BIGINT) AS vq
        FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
                        ORDER BY ts DESC, event_id DESC) AS rnd FROM q),
      bars AS (SELECT user_id, day, max(CASE WHEN rnd = 1 THEN vq END) AS closeq
               FROM r GROUP BY user_id, day),
      rets AS (SELECT user_id,
                 closeq - lag(closeq) OVER (PARTITION BY user_id ORDER BY day) AS r
               FROM bars),
      stats AS (SELECT user_id, count(*) AS n,
                  CAST(sum(r) AS BIGINT) AS sr,
                  CAST(sum(r * r) AS BIGINT) AS ssq
                FROM rets WHERE r IS NOT NULL GROUP BY user_id)
      SELECT user_id, n, sr, ssq,
        CASE WHEN n >= 3 AND n * ssq - sr * sr > 0
             THEN (CAST(sr AS DOUBLE) / n)
                  / sqrt(CAST(n * ssq - sr * sr AS DOUBLE) / (n * (n - 1)))
        END AS sharpe
      FROM stats ORDER BY user_id""")
  )

  /** W18: stochastic-oscillator census — %K = (close − low₁₄)/(high₁₄ −
    * low₁₄) over the trailing 14 observations in permille integer
    * arithmetic, then the w14 census: per key, observation count and how
    * often the series closed in the top (>800‰) or bottom (<200‰) of its
    * own trailing range. w14 reads gain share, w18 reads range position —
    * together the classic momentum pair.
    *
    * Exactness: prices quantize once (×1024 → BIGINT, the w13 rule);
    * `vq − lo ≥ 0` and `hi − lo > 0` inside the guarded branch, so the
    * permille is a non-negative floor division (Spark `div` ≡ DuckDB
    * `//`); flat windows (hi = lo) yield NULL, counted in n_obs but in
    * neither tail — identical CASE semantics on both engines.
    *
    * Scale: row_number, max and min all ride ONE user-keyed exchange
    * (same frame family), then a per-user map-side-combinable census —
    * the h12/w17 single-exchange discipline, PlanSpec-asserted.
    */
  val w18Stochastic: Q = Q(
    "w18_stochastic",
    (s, dir) => {
      val wSeq = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val w14 = wSeq.rowsBetween(-13, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("value") * 1024).cast("long").as("vq"))
        .withColumn("rn", row_number().over(wSeq))
        .withColumn("hi", max(col("vq")).over(w14))
        .withColumn("lo", min(col("vq")).over(w14))
        .filter(col("rn") >= 14)
        .select(col("user_id"),
          when(col("hi") > col("lo"),
            expr("(1000 * (vq - lo)) div (hi - lo)")).as("k_pm"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_obs"),
          sum(when(col("k_pm") > 800, 1L).otherwise(0L)).as("n_high"),
          sum(when(col("k_pm") < 200, 1L).otherwise(0L)).as("n_low"))
        .orderBy("user_id")
    },
    Some("""WITH q AS (
        SELECT user_id, ts, event_id, CAST(round(value * 1024) AS BIGINT) AS vq
        FROM events),
      r AS (SELECT user_id, vq,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
              CAST(max(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS hi,
              CAST(min(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS BIGINT) AS lo
            FROM q),
      k AS (SELECT user_id,
              CASE WHEN hi > lo THEN (1000 * (vq - lo)) // (hi - lo) END AS k_pm
            FROM r WHERE rn >= 14)
      SELECT user_id, count(*) AS n_obs,
        CAST(sum(CASE WHEN k_pm > 800 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        CAST(sum(CASE WHEN k_pm < 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
      FROM k GROUP BY user_id ORDER BY user_id""")
  )

  /** H15: cross-sectional momentum backtest — the factor-research shape
    * the per-symbol indicator family (w13–w18) feeds into: each week,
    * rank every symbol by its TRAILING weekly return (the signal, known
    * at the week's start), cut the cross-section into terciles, and
    * report each tercile's realized FORWARD mean return. A monotone
    * mean_fwd_pm across terciles is the momentum effect; tercile 3 minus
    * tercile 1 is the long-short portfolio. Weekly closes are h7's bars;
    * a symbol enters a week's cross-section only with both trailing
    * weeks present (lag(wk)=wk−1 guards — a gap silently spanning weeks
    * would fabricate a signal).
    *
    * Determinism: the signal ranks on one IEEE division of stored
    * doubles (bit-identical both engines) with a user_id tiebreak;
    * forward returns quantize to permille longs at the row level, so
    * tercile means are exact integer division. ntile's uneven-split rule
    * (first buckets take the remainder) matches across engines.
    *
    * Scale: bars + lags ride ONE user-keyed exchange; the weekly ranking
    * re-shuffles only the (symbols × weeks) bar table — thousandths of
    * the tick data — and ntile's per-week partitions are cross-section-
    * bounded. The census is a (weeks × 3)-row aggregate.
    */
  val h15MomentumPortfolio: Q = Q(
    "h15_momentum_portfolio",
    (s, dir) => {
      val wBar = Window.partitionBy("user_id", "wk")
        .orderBy(col("ts").desc, col("event_id").desc)
      val byUser = Window.partitionBy("user_id").orderBy("wk")
      val bars = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          expr("datediff(to_date(ts), date '1970-01-01') div 7").cast("long")
            .as("wk"))
        .withColumn("rnd", row_number().over(wBar))
        .groupBy("user_id", "wk")
        .agg(max(when(col("rnd") === 1, col("value"))).as("close"))
      val sig = bars
        .withColumn("c1", lag(col("close"), 1).over(byUser))
        .withColumn("c2", lag(col("close"), 2).over(byUser))
        .withColumn("w1", lag(col("wk"), 1).over(byUser))
        .withColumn("w2", lag(col("wk"), 2).over(byUser))
        .filter(col("w1") === col("wk") - 1 && col("w2") === col("wk") - 2)
        .withColumn("signal", col("c1") / col("c2"))
        .withColumn("fwd_pm",
          round(col("close") / col("c1") * 1000).cast("long"))
      sig
        .withColumn("tercile", ntile(3).over(
          Window.partitionBy("wk").orderBy(col("signal").asc, col("user_id").asc))
          .cast("long"))
        .groupBy("wk", "tercile")
        .agg(count(lit(1)).as("n_symbols"),
          expr("sum(fwd_pm) div count(1)").as("mean_fwd_pm"))
        .orderBy("wk", "tercile")
    },
    Some("""WITH e AS (SELECT user_id, ts, event_id, value,
            (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk FROM events),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id, wk
                ORDER BY ts DESC, event_id DESC) AS rnd FROM e),
        bars AS (SELECT user_id, CAST(wk AS BIGINT) AS wk,
            max(CASE WHEN rnd = 1 THEN value END) AS close
          FROM r GROUP BY user_id, wk),
        lagd AS (SELECT *,
            lag(close, 1) OVER (PARTITION BY user_id ORDER BY wk) AS c1,
            lag(close, 2) OVER (PARTITION BY user_id ORDER BY wk) AS c2,
            lag(wk, 1) OVER (PARTITION BY user_id ORDER BY wk) AS w1,
            lag(wk, 2) OVER (PARTITION BY user_id ORDER BY wk) AS w2
          FROM bars),
        sig AS (SELECT user_id, wk, c1 / c2 AS signal,
            CAST(round(close / c1 * 1000) AS BIGINT) AS fwd_pm
          FROM lagd WHERE w1 = wk - 1 AND w2 = wk - 2),
        cut AS (SELECT *, ntile(3) OVER (PARTITION BY wk
                ORDER BY signal ASC, user_id ASC) AS tercile FROM sig)
        SELECT wk, tercile, count(*) AS n_symbols,
          CAST(sum(fwd_pm) AS BIGINT) // count(*) AS mean_fwd_pm
        FROM cut GROUP BY wk, tercile ORDER BY wk, tercile""")
  )

  /** H16: Parkinson range volatility — the high/low range estimator
    * σ²_P = (1 / 4·ln2·n) · Σ ln(high_d/low_d)², ~5× more statistically
    * efficient per bar than close-to-close variance because it reads the
    * day's whole excursion, and computable from exactly the OHLC daily
    * bars the reference's store keeps (h7 is the bar builder; h12's ATR
    * is the same range signal un-normalized). Reported per key over its
    * daily bars; single-observation days contribute ln(1)² = 0, matching
    * the estimator's definition.
    *
    * Determinism: high/low are exact max/min of stored doubles; the
    * quotient is one IEEE division of identical operands; the only
    * libm-dependent op (ln) is INTEGER-QUANTIZED per row at 2^-20
    * (x10's trick) and the squares are summed as exact BIGINTs, so the
    * cross-engine agreement boundary is one quantization step, not a sum
    * of float errors. The final scale 1/(4·ln2·n) is one multiply and
    * one divide of identical doubles (ln(2) is correctly rounded in any
    * IEEE libm).
    *
    * Scale: one (key, day) hash aggregate feeding one key-keyed
    * aggregate — both map-side combinable, no window, no join; the same
    * two-level shape as a daily-bar rollup at any corpus size.
    */
  val h16ParkinsonVol: Q = Q(
    "h16_parkinson_vol",
    (s, dir) => {
      val q20 = (1L << 20).toDouble
      t(s, dir, "events")
        .filter(col("value") > 0)
        .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
        .groupBy("user_id", "day")
        .agg(max(col("value")).as("high"), min(col("value")).as("low"))
        .select(col("user_id"),
          round(log(col("high") / col("low")) * q20).cast("long").as("qln"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_days"),
          sum(col("qln") * col("qln")).as("sumsq"))
        .select(col("user_id"), col("n_days"),
          ((col("sumsq").cast("double") / lit(q20 * q20)) /
            (lit(4.0) * log(lit(2.0)) * col("n_days"))).as("park_var"))
        .orderBy("user_id")
    },
    Some("""WITH bars AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               max(value) AS high, min(value) AS low
        FROM events WHERE value > 0 GROUP BY 1, 2),
      q AS (SELECT user_id,
              CAST(round(ln(high / low) * 1048576) AS BIGINT) AS qln
            FROM bars)
      SELECT user_id, count(*) AS n_days,
        (CAST(sum(qln * qln) AS DOUBLE) / 1099511627776.0)
          / (4.0 * ln(2.0) * count(*)) AS park_var
      FROM q GROUP BY user_id ORDER BY user_id""")
  )

  val all: Seq[Q] = Seq(h4GapFill, h5SplitAdjust, a24Concurrency, w13Bollinger,
    w14Rsi, h6Vwap, h7WeeklyBars, h8Beta, w16Underwater, h9OvernightGap,
    w15Macd, h10RollingCorr, h11EventStudy, h12Atr, w17Obv, h13PairsSpread,
    h14Sharpe, w18Stochastic, h15MomentumPortfolio, h16ParkinsonVol)
}
