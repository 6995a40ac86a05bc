package graft

import graft.queries.TimeSeries
import org.apache.spark.sql.functions._

/** Behavioral properties of the time-series family, each proved against a
  * brute-force reference on sf0.001 (the DuckDB differential gate covers
  * sf0.01; these pin the operator SEMANTICS independently of any SQL
  * re-expression).
  */
class TimeSeriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("j12: bucketed interval join equals the brute-force range join") {
    val fast = SparkEntry.queries("j12_interval_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val ev = Tables.table(spark, sf, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(unix_micros(col("ts")).as("s0")).collect().map(_.getLong(0))
    val slow = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("pt")).collect()
      .map(r => r.getLong(0) ->
        views.count(s0 => s0 <= r.getLong(1) && r.getLong(1) < s0 + 1200000000L).toLong)
      .toMap
    assert(fast == slow)
    assert(fast.values.exists(_ > 0), "test corpus must produce at least one overlap")
  }

  test("a24: two-level distributed prefix sum equals the global sweep line") {
    val fast = SparkEntry.queries("a24_concurrency")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val views = Tables.table(spark, sf, "events")
      .filter(col("event_type") === "view")
      .select(unix_micros(col("ts")).as("t")).collect().map(_.getLong(0))
    val deltas = (views.map(t => (t, 1L)) ++ views.map(t => (t + 1200000000L, -1L)))
      .sortBy(identity) // (t, d) with -1 before +1 at equal t
    var run = 0L
    val slow = deltas.map { case (t, d) => run += d; (t / 86400000000L, run) }
      .groupBy(_._1).toSeq
      .map { case (day, rs) => (day, rs.map(_._2).max, rs.size.toLong) }
      .sortBy(_._1)
    assert(fast.toSeq == slow)
    assert(fast.map(_._2).max > 1, "sweep must observe real concurrency")
  }

  test("h5: back-adjustment is an exact power-of-two shift — " +
    "adj_value * 2^adj_exp reconstructs value bit-for-bit") {
    val rows = SparkEntry.queries("h5_split_adjust")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(2) > 0), "corpus must contain at least one split")
    rows.foreach { r =>
      val (v, e, adj) = (r.getDouble(1), r.getLong(2), r.getDouble(3))
      assert(java.lang.Double.doubleToLongBits(adj * (1L << e).toDouble) ==
        java.lang.Double.doubleToLongBits(v),
        s"value=$v exp=$e adj=$adj")
    }
  }

  test("h4: fill holds the last observation — every row's close equals the " +
    "latest same-or-earlier observed day's close, spans are dense per user") {
    val out = SparkEntry.queries("h4_gap_fill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val obs = out.filter(_._4 == 0).groupBy(_._1)
      .view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(out.exists(_._4 == 1), "corpus must contain at least one gap day")
    out.groupBy(_._1).foreach { case (u, rows) =>
      val days = rows.map(_._2).sorted
      assert(days.length == (days.last - days.head + 1).toInt, s"user $u span not dense")
      rows.foreach { case (_, d, close, filled) =>
        val src = obs(u).keys.filter(_ <= d).max
        assert(close == obs(u)(src), s"user $u day $d carries wrong close")
        assert((filled == 1) == !obs(u).contains(d))
      }
    }
  }

  test("w13: windowed integer band test agrees with an independent exact " +
    "rational (BigInt) Bollinger evaluation of the quantized series") {
    val out = SparkEntry.queries("w13_bollinger")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)),
        BigInt(math.round(r.getDouble(3) * 1024))))
    val slow = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val vs = rows.sortBy(_._2).map(_._3)
      val flags = vs.indices.drop(9).map { i =>
        val w = vs.slice(i - 9, i + 1)
        val (sx, sxx) = (w.sum, w.map(x => x * x).sum)
        // (v − μ)² > (2σ)² over exact rationals ⟺ (n·v − Σ)² > 4(nΣx² − Σ²)
        val dev = 10 * vs(i) - sx
        val b = 10 * sxx - sx * sx
        (if (dev > 0 && dev * dev > 4 * b) 1L else 0L,
          if (dev < 0 && dev * dev > 4 * b) 1L else 0L)
      }
      (u, flags.size.toLong, flags.map(_._1).sum, flags.map(_._2).sum)
    }.sortBy(_._1).toList
    assert(out == slow)
    // the corpus value distribution is right-skewed, so lower-band breaches
    // are legitimately rare (0 at sf0.001) — only the upper side is asserted
    assert(out.map(_._3).sum > 0, "corpus must trip the upper band")
  }

  test("w14: the RSI census agrees with an independent exact replay of the " +
    "trailing-14 gain/loss windows") {
    val out = SparkEntry.queries("w14_rsi")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)),
        math.round(r.getDouble(3) * 1024)))
    val slow = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val vs = rows.sortBy(_._2).map(_._3)
      val diffs = vs.sliding(2).map(p => p(1) - p(0)).toVector
      val rsis = diffs.indices.drop(13).map { i =>
        val w = diffs.slice(i - 13, i + 1)
        val gs = w.map(d => math.max(d, 0L)).sum
        val ls = w.map(d => math.max(-d, 0L)).sum
        if (gs + ls > 0) Some(1000 * gs / (gs + ls)) else None
      }
      (u, rsis.size.toLong,
        rsis.count(_.exists(_ > 700)).toLong,
        rsis.count(_.exists(_ < 300)).toLong)
    }.sortBy(_._1).toList
    assert(out == slow)
    // sf0.001 has ~85 windows/user — direction counts are corpus luck, so
    // only require that SOME band observation exists
    assert(out.map(r => r._3 + r._4).sum > 0,
      "corpus must produce at least one overbought/oversold observation")
  }

  test("j12 binning core: chunk-boundary semantics — inclusive start, " +
    "exclusive end, cross-chunk intervals counted exactly once") {
    import spark.implicits._
    val C = 100L
    val intervals = Seq(
      (0L, 100L),    // exactly one chunk [0, 100)
      (50L, 150L),   // spans chunks 0 and 1
      (99L, 101L),   // straddles the boundary with width 2
      (200L, 300L)   // far chunk
    ).toDF("s0", "e0")
    val points = Seq(
      (1L, 0L),    // == s0 of [0,100): inclusive → 1
      (2L, 99L),   // in [0,100), [50,150), [99,101) → 3
      (3L, 100L),  // e0 of [0,100) exclusive; in [50,150), [99,101) → 2
      (4L, 150L),  // e0 of [50,150) exclusive → 0
      (5L, 250L),  // inside the far interval → 1
      (6L, 1000L)  // matches nothing → 0
    ).toDF("id", "pt")
    val out = graft.queries.Joins
      .pointInIntervalCounts(points, intervals, C)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 2L, 4L -> 0L, 5L -> 1L, 6L -> 0L))
  }

  test("h6: VWAP replays bit-for-bit from an exact integer fold of the " +
    "quantized prices and stand-in volumes") {
    val out = SparkEntry.queries("h6_vwap")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val ev = Tables.table(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000L),
        r.getLong(2), r.getDouble(3)))
    assert(ev.nonEmpty)
    val slow = ev.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val pv = rows.map(r => math.round(r._4 * 1024) * (r._3 % 97 + 1)).sum
      val vol = rows.map(_._3 % 97 + 1).sum
      k -> (rows.size.toLong, vol, pv.toDouble / vol / 1024)
    }
    assert(out.keySet == slow.keySet)
    slow.foreach { case (k, (n, vol, vwap)) =>
      val (on, ovol, ovwap) = out(k)
      assert(on == n && ovol == vol, s"$k counts")
      assert(java.lang.Double.doubleToLongBits(ovwap) ==
        java.lang.Double.doubleToLongBits(vwap), s"$k vwap")
    }
  }

  test("h7: weekly bars equal a brute-force per-(user, week) OHLC fold " +
    "over the (ts, event_id)-sorted events") {
    val out = SparkEntry.queries("h7_weekly_bars")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6)))).toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000L) / 7,
        (r.getLong(1), r.getLong(2)), r.getDouble(3)))
    val slow = ev.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val sorted = rows.sortBy(_._3).map(_._4)
      k -> (sorted.head, sorted.max, sorted.min, sorted.last, sorted.size.toLong)
    }
    assert(out.keySet == slow.keySet)
    assert(out.keySet.groupBy(_._1).values.exists(_.size > 1),
      "corpus must span more than one week for some user")
    slow.foreach { case (k, bar) => assert(out(k) == bar, s"$k") }
  }

  test("h8: beta replays from an exact integer fold — daily closes, " +
    "floor-mean market index, cross-multiplied slope") {
    val out = SparkEntry.queries("h8_beta")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000L),
        (r.getLong(1), r.getLong(2)), math.round(r.getDouble(3) * 1024)))
    val daily = ev.groupBy(t => (t._1, t._2))
      .map { case ((u, d), rows) => (u, d, rows.maxBy(_._3)._4) }.toSeq
    val market = daily.groupBy(_._2)
      .map { case (d, rows) => d -> rows.map(_._3).sum / rows.size }
    val slow = daily.groupBy(_._1).flatMap { case (u, rows) =>
      val seq = rows.sortBy(_._2).map(r => (r._3, market(r._2)))
      val rets = seq.zip(seq.drop(1)).map { case ((v0, m0), (v1, m1)) =>
        (v1 - v0, m1 - m0)
      }
      if (rets.isEmpty) None
      else {
        val n = rets.size.toLong
        val sx = rets.map(_._2).sum; val sy = rets.map(_._1).sum
        val sxy = rets.map(r => r._1 * r._2).sum
        val sxx = rets.map(r => r._2 * r._2).sum
        val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
        Some(u -> (n, num, den,
          if (den > 0) Some(num.toDouble / den) else None))
      }
    }
    assert(out.keySet == slow.keySet)
    assert(slow.nonEmpty)
    slow.foreach { case (u, (n, num, den, beta)) =>
      val (on, onum, oden, obeta) = out(u)
      assert(on == n && onum == num && oden == den, s"user $u sums")
      assert(obeta.map(java.lang.Double.doubleToLongBits) ==
        beta.map(java.lang.Double.doubleToLongBits), s"user $u beta")
    }
  }

  test("w16: underwater spells replay from a sequential peak-tracking fold " +
    "over the daily closes") {
    val out = SparkEntry.queries("w16_underwater")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000L),
        (r.getLong(1), r.getLong(2)), math.round(r.getDouble(3) * 1024)))
    val slow = ev.groupBy(t => (t._1, t._2))
      .map { case ((u, d), rows) => (u, d, rows.maxBy(_._3)._4) }
      .groupBy(_._1).map { case (u, rows) =>
        val closes = rows.toSeq.sortBy(_._2).map(_._3)
        var peak = Long.MinValue
        val below = closes.map { v => peak = math.max(peak, v); v < peak }
        val runs = below.foldLeft(List.empty[Long]) {
          case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
          case (acc, true) => 1L :: acc
          case (acc, false) => 0L :: acc
        }.filter(_ > 0)
        u -> (closes.size.toLong, below.count(identity).toLong,
          runs.size.toLong, if (runs.isEmpty) 0L else runs.max)
      }
    assert(out == slow)
    assert(out.values.exists(_._4 > 1), "some key must have a multi-day spell")
  }

  test("h9: overnight gap census replays from a per-day open/close fold " +
    "with the integer 2% cross-multiplication") {
    val out = SparkEntry.queries("h9_overnight_gap")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000L),
        (r.getLong(1), r.getLong(2)), math.round(r.getDouble(3) * 1024)))
    val slow = ev.groupBy(t => (t._1, t._2)).map { case ((u, d), rows) =>
      (u, d, rows.minBy(_._3)._4, rows.maxBy(_._3)._4) // open, close
    }.groupBy(_._1).collect { case (u, days) if days.size > 1 =>
      val seq = days.toSeq.sortBy(_._2)
      val gaps = seq.zip(seq.drop(1)).map { case ((_, _, _, pc), (_, _, o, _)) =>
        (o - pc, pc)
      }
      u -> (gaps.size.toLong,
        gaps.count { case (g, pc) => g * 50 > pc }.toLong,
        gaps.count { case (g, pc) => -g * 50 > pc }.toLong)
    }
    assert(out == slow.toMap)
    assert(out.values.map(_._2).sum > 0 && out.values.map(_._3).sum > 0,
      "corpus must contain both gap directions")
  }

  test("registry: every TimeSeries query is registered with an oracle") {
    for (q <- TimeSeries.all)
      assert(SparkEntry.oracleSql.contains(q.name), q.name)
  }
}
