package graft

import org.apache.spark.sql.functions._

/** Behavioral properties of the audit/census trio added in round 6 —
  * x29 (per-source KL), a26 (categorical mode), v12 (Benford first-digit)
  * — each proved against an independent in-memory replay on sf0.001.
  */
class AuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("x29: KL divergence replays from an exact census fold and is " +
    "non-negative up to quantization") {
    val out = SparkEntry.queries("x29_kl_divergence")(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val toks = Tables.table(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(r.getString(0) -> _))
    val sc = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cc = sc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val st = sc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val m = st.values.sum
    def log2(x: Double) = math.log(x) / math.log(2.0)
    val slow = st.map { case (src, n) =>
      val terms = sc.toSeq.collect { case ((s0, tok), c) if s0 == src =>
        val qb = math.round(
          (log2(c.toDouble) + log2(m.toDouble) - log2(n.toDouble) -
            log2(cc(tok).toDouble)) * (1L << 20))
        (c, qb)
      }
      src -> (n, terms.size.toLong,
        terms.map(t => t._1 * t._2).sum.toDouble / n / (1L << 20).toDouble)
    }
    assert(out.keySet == slow.keySet)
    slow.foreach { case (src, (n, types, kl)) =>
      val (on, otypes, okl) = out(src)
      assert(on == n && otypes == types, s"$src censuses")
      // the replay mirrors the engine's op order; allow only round-off in
      // the final fold ordering (both are exact long sums → identical)
      assert(math.abs(okl - kl) < 1e-12, s"$src kl $okl vs $kl")
      // Gibbs: true KL ≥ 0; quantized version can dip at most 2^-20 bits
      assert(okl > -1e-6, s"$src kl must be non-negative up to quantization")
    }
    assert(out.values.exists(_._3 > 1e-4),
      "some source must measurably diverge from the corpus mix")
  }

  test("a26: modal type replays from a brute-force census with the " +
    "(count DESC, type ASC) tie-break") {
    val out = SparkEntry.queries("a26_mode")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val slow = ev.groupBy(_._1).map { case (u, rows) =>
      val census = rows.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      val (ty, cnt) = census.minBy { case (t, c) => (-c, t) }
      u -> (ty, cnt, 1000 * cnt / rows.length)
    }
    assert(out == slow)
  }

  test("v12: Benford census replays exactly; shares sum to ~1000") {
    val out = SparkEntry.queries("v12_benford")(spark, sf).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val cents = Tables.table(spark, sf, "events")
      .select(col("value")).collect().map(r => math.round(r.getDouble(0) * 100))
      .filter(_ > 0)
    val census = cents.groupBy(_.toString.head.asDigit).view
      .mapValues(_.length.toLong).toMap
    val total = census.values.sum
    assert(out.map(_._1).toSet == census.keySet)
    out.foreach { case (d, (n, share, benford, dev)) =>
      assert(n == census(d), s"digit $d count")
      assert(share == 1000 * n / total, s"digit $d share")
      assert(benford == math.round(math.log10(1.0 + 1.0 / d) * 1000))
      assert(dev == share - benford)
    }
    val shareSum = out.map(_._2._2).sum
    assert(shareSum >= 1000 - 9 && shareSum <= 1000, s"floor shares sum $shareSum")
  }

  test("q15: recursive hierarchy flatten — depth is floor(log2(id)) and " +
    "path cost replays the exact ancestor-chain cents sum") {
    val out = SparkEntry.queries("q15_sql_recursive")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap
    val retail = Tables.table(spark, sf, "part")
      .select(col("p_partkey"), col("p_retailprice")).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    assert(out.keySet == retail.keySet - 0L, "every part except orphan 0")
    out.foreach { case (id, (depth, cost)) =>
      assert(depth == (63 - java.lang.Long.numberOfLeadingZeros(id)), s"id $id depth")
      val chain = Iterator.iterate(id)(_ / 2).takeWhile(_ >= 1).toSeq
      assert(cost == chain.map(retail).sum, s"id $id path cost")
    }
  }

  test("e17: hard negatives replay from a brute-force per-anchor scan — " +
    "different label only, top-5 by cosine with the vec_id tie-break") {
    val out = SparkEntry.queries("e17_hard_negatives")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getInt(3))))
      .toMap
    val emb = Tables.table(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]) = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map(t => t._1 * t._2).sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val slow = emb.filter(_._1 < 8).flatMap { case (aid, alabel, av) =>
      emb.filter(_._2 != alabel)
        .map { case (vid, lab, v) => (vid, lab, cos(v, av)) }
        .sortBy { case (vid, _, sim) => (-sim, vid) }
        .take(5).zipWithIndex
        .map { case ((vid, lab, _), i) => (aid, i + 1L) -> (vid, lab) }
    }.toMap
    assert(out == slow)
    assert(out.nonEmpty)
  }

  test("p16: leave-one-out encoding replays bit-for-bit; single-row keys " +
    "encode null; no row's own target leaks into its feature") {
    val out = SparkEntry.queries("p16_target_encode")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    val census = ev.groupBy(_._2).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
    ev.foreach { case (id, ty, cents) =>
      val (n, s) = census(ty)
      val exp = if (n > 1) Some((s - cents).toDouble / (n - 1) / 100) else None
      assert(out(id).map(java.lang.Double.doubleToLongBits) ==
        exp.map(java.lang.Double.doubleToLongBits), s"event $id")
    }
  }

  test("a27: path census replays from per-user ordered 3-gram folding") {
    val out = SparkEntry.queries("a27_path_census")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val slow = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(_._2).map(_._3)
      seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(20)
    assert(out.toSeq == slow)
    assert(out.nonEmpty && out.head._2 >= out.last._2)
  }

  test("e19: centroid drift replays from the exact quantized fold and is " +
    "non-negative") {
    val out = SparkEntry.queries("e19_centroid_drift")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val emb = Tables.table(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getInt(2),
        r.getSeq[Float](1).map(v => math.round(v.toDouble * (1L << 20))).toArray))
    val q20 = (1L << 20).toDouble
    val slow = emb.groupBy(_._2).flatMap { case (lab, vecs) =>
      val (h0, h1) = vecs.partition(_._1 % 2 == 0)
      if (h0.isEmpty || h1.isEmpty) None
      else {
        val dims = h0.head._3.indices
        val dq = dims.map { d =>
          val m0 = h0.map(_._3(d)).sum.toDouble / (h0.length * q20)
          val m1 = h1.map(_._3(d)).sum.toDouble / (h1.length * q20)
          math.round((m0 - m1) * (m0 - m1) * q20)
        }.sum
        Some(lab -> (h0.length.toLong, h1.length.toLong, dq.toDouble / q20))
      }
    }
    assert(out.keySet == slow.keySet)
    slow.foreach { case (lab, (n0, n1, drift)) =>
      val (on0, on1, od) = out(lab)
      assert(on0 == n0 && on1 == n1, s"label $lab halves")
      assert(java.lang.Double.doubleToLongBits(od) ==
        java.lang.Double.doubleToLongBits(drift), s"label $lab drift")
      assert(od >= 0.0)
    }
  }

  test("s5: the two-level distributed watermark replay equals a sequential " +
    "arrival-order simulation of the drop rule") {
    val out = SparkEntry.queries("s5_late_data")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("t")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (id, t) => (t, t + (id % 120) * 1000000L, id) }
      .sortBy { case (_, arr, id) => (arr, id) }
    val winUs = 600000000L
    var runMax = -1L
    val sim = ev.map { case (t, _, _) =>
      val wm = runMax - 30000000L
      val late = wm > (t / winUs + 1) * winUs
      runMax = math.max(runMax, t)
      ((t / winUs) * winUs, late)
    }
    val slow = sim.groupBy(_._1).map { case (w, rs) =>
      val d = rs.count(_._2).toLong
      w -> (rs.size.toLong, d, rs.size - d)
    }
    assert(out == slow)
    // sf0.001 is too sparse for the 2-min jitter to beat a 10-min window +
    // 30 s lateness; real drops are exercised at sf0.1 (473 dropped rows,
    // oracle-checked by the driver gate). Here require coverage, not drops.
    assert(out.values.map(_._1).sum > 0)
  }

  test("r3: blocking recall replays from a brute-force probe × corpus " +
    "sweep with r1's predicate and block definition") {
    val row = SparkEntry.queries("r3_blocking_recall")(spark, sf).collect().head
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val text = r.getString(1)
        (r.getLong(0), text.take(60),
          text.split(" ", -1).take(3).mkString(" "), text.length / 50)
      }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    val probes = docs.filter(_._1 % 50 == 0)
    val pairs = for (p <- probes; d <- docs if d._1 != p._1) yield
      (lev(d._2, p._2) <= 10, d._3 == p._3 && d._4 == p._4)
    val nTrue = pairs.count(_._1).toLong
    val nRet = pairs.count(t => t._1 && t._2).toLong
    assert(row.getLong(0) == nTrue && row.getLong(1) == nRet)
    if (nTrue > 0) assert(row.getLong(2) == 1000 * nRet / nTrue)
    else assert(row.isNullAt(2))
  }

  test("a28: the LTV triangle replays from a per-user cohort fold and the " +
    "cumulative curve is monotone per cohort") {
    val out = SparkEntry.queries("a28_cohort_ltv")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Math.floorDiv(Math.floorDiv(r.getLong(2), 86400000000L), 7),
        math.round(r.getDouble(3) * 100)))
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._3).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = ev.filter(_._2 == "purchase")
      .groupBy(t => (cohort(t._1), t._3 - cohort(t._1)))
      .view.mapValues(_.map(_._4).sum).toMap
    assert(out.map(_._1).toSet == cells.keySet)
    val byCohort = out.groupBy(_._1._1)
    byCohort.foreach { case (cw, rows) =>
      val sorted = rows.sortBy(_._1._2)
      var cum = 0L
      sorted.foreach { case ((_, age), (n, wk, cumOut, ltv)) =>
        assert(n == sizes(cw), s"cohort $cw size")
        assert(wk == cells((cw, age)), s"cell ($cw, $age)")
        cum += wk
        assert(cumOut == cum, s"cumulative at ($cw, $age)")
        assert(ltv == cum / n, s"ltv at ($cw, $age)")
      }
    }
    assert(out.nonEmpty)
  }

  test("a29: RFM buckets replay from census-quantile thresholds and every " +
    "bucket is populated with roughly a third of the base") {
    val out = SparkEntry.queries("a29_rfm")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))))
    def bucketOf(vals: Seq[Long], v: Long): Int = {
      val sorted = vals.sorted
      val n = vals.size
      def th(target: Long): Long = {
        var cum = 0L
        var last = sorted.head
        for (x <- sorted.distinct.sorted) {
          cum = sorted.count(_ <= x).toLong
          last = x
          if (cum * 3 >= target) return x
        }
        last
      }
      val (t1, t2) = (th(n), th(2L * n))
      1 + (if (v > t1) 1 else 0) + (if (v > t2) 1 else 0)
    }
    val recencies = out.map(_._2._1)
    val negFs = out.map(t => -t._2._2)
    val negMs = out.map(t => -(t._2._3 / 100))
    out.foreach { case (u, (rec, np, mc, r, f, m, seg)) =>
      assert(r == bucketOf(recencies, rec), s"user $u r")
      assert(f == bucketOf(negFs, -np), s"user $u f")
      assert(m == bucketOf(negMs, -(mc / 100)), s"user $u m")
      assert(seg == s"$r$f$m")
    }
    Seq(out.map(_._2._4), out.map(_._2._5), out.map(_._2._6)).foreach { bs =>
      (1 to 3).foreach { b =>
        val share = bs.count(_ == b).toDouble / bs.size
        assert(share > 0.1 && share < 0.6, s"bucket $b share $share")
      }
    }
  }

  test("v13: per-stream sequence gaps replay from a sorted-id fold") {
    val out = SparkEntry.queries("v13_seq_gaps")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val ev = Tables.table(spark, sf, "events")
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val slow = ev.groupBy(_._1).collect { case (u, rows) if rows.length > 1 =>
      val ids = rows.map(_._2).sorted
      val gaps = ids.zip(ids.drop(1)).map { case (a, b) => b - a - 1 }
      u -> (gaps.length.toLong, gaps.count(_ > 0).toLong, gaps.sum, gaps.max)
    }
    assert(out == slow.toMap)
    assert(out.values.exists(_._2 > 0), "interleaved ids must produce gaps")
  }

  test("m6: the patch grid tiles each image exactly — patch areas sum to " +
    "w·h, grid positions are dense, edge patches clamp") {
    val rows = SparkEntry.queries("m6_patch_grid")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .collect { case r if r.getLong(0) % 2 == 0 =>
        val t = r.getString(1)
        r.getLong(0) -> (
          16L + (if (t.nonEmpty) t.charAt(0).toLong % 128 else 0L),
          16L + (if (t.length > 1) t.charAt(1).toLong % 128 else 0L))
      }.toMap
    assert(rows.map(_._1).toSet == docs.keySet)
    rows.groupBy(_._1).foreach { case (id, ps) =>
      val (w, h) = docs(id)
      val (nx, ny) = ((w + 15) / 16, (h + 15) / 16)
      assert(ps.length == nx * ny, s"image $id patch count")
      assert(ps.map(p => (p._2, p._3)).toSet ==
        (for (x <- 0L until nx; y <- 0L until ny) yield (x, y)).toSet,
        s"image $id grid density")
      assert(ps.map(p => p._6 * p._7).sum == w * h, s"image $id area")
      ps.foreach { case (_, px, py, x0, y0, pw, ph) =>
        assert(x0 == px * 16 && y0 == py * 16)
        assert(pw == math.min(16, w - x0) && ph == math.min(16, h - y0))
      }
    }
    assert(rows.exists(_._6 < 16), "some edge patch must clamp")
  }
}
