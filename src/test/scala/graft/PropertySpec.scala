package graft

import graft.operators.Merge
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.sql.{Date, Timestamp}

/** Property-based invariants (SURVEY §5.2): merge idempotence and
  * key-preservation over randomized batches. Uses raw ScalaCheck `Gen`
  * with fixed seeds (the scalatest bridge isn't in the offline dep cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val symGen = Gen.oneOf("AAPL", "MSFT", "TSLA", "NVDA")
  private val dayGen = Gen.choose(1, 5).map(i => Date.valueOf(f"2024-01-$i%02d"))
  private val tradeGen = for {
    s <- symGen; day <- dayGen
    p <- Gen.choose(1.0, 500.0)
    hour <- Gen.choose(9, 16)
  } yield (s, day, p, Timestamp.valueOf(f"${day.toString} $hour%02d:00:00"))

  private val stored = Seq(
    ("AAPL", Date.valueOf("2024-01-02"), 10.0, 11.0),
    ("MSFT", Date.valueOf("2024-01-03"), 20.0, 21.0)
  ).toDF("symbol", "day", "open", "adj_close")

  private def sample(seed: Long): List[(String, Date, Double, Timestamp)] =
    Gen.listOfN(6, tradeGen)
      .apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(Nil)

  test("merge(merge(df,x),x) == merge(df,x) and keys are preserved") {
    (1L to 5L).foreach { seed =>
      val trades = sample(seed)
      assert(trades.nonEmpty, s"generator must produce trades for seed $seed")
      val batch = trades.toDF("symbol", "day", "price", "ts")
      def m(df: org.apache.spark.sql.DataFrame) =
        Merge.upsertDailyClose(df, batch, Seq("symbol", "day"), "price", "ts", "adj_close")
      val once = m(stored).orderBy("symbol", "day").collect().toSeq
      val twice = m(m(stored)).orderBy("symbol", "day").collect().toSeq
      assert(once == twice, s"idempotence failed for seed $seed")
      val keys = once.map(r => (r.getString(0), r.getDate(1).toString)).toSet
      val expected = stored.collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet ++
        trades.map(t => (t._1, t._2.toString)).toSet
      assert(keys == expected, s"key preservation failed for seed $seed")
    }
  }

  test("qsum is exact on fixed-point inputs regardless of partitioning " +
    "(equals the BigDecimal sum, unlike a naive double sum)") {
    val centsGen = Gen.choose(-50_000_000L, 50_000_000L) // ±500k, 2dp
    (1L to 5L).foreach { seed =>
      val cents = Gen.listOfN(500, centsGen)
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      assert(cents.nonEmpty)
      val exact = cents.map(c => BigDecimal(c) / 100).sum.toDouble
      Seq(1, 7).foreach { parts =>
        val got = cents.map(_ / 100.0).toDF("x")
          .repartition(parts)
          .agg(graft.Q.qsum(org.apache.spark.sql.functions.col("x"), 2))
          .head.getDouble(0)
        assert(got == exact,
          s"seed $seed parts $parts: qsum $got != exact $exact")
      }
    }
  }

  test("CUSUM prefix-sum identity: the w11 window form equals the clamped " +
    "recursion S_i = max(0, S_{i-1} + e_i) on random integer series") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val eGen = Gen.choose(-1000L, 1000L)
    (1L to 5L).foreach { seed =>
      val es = Gen.listOfN(200, eGen)
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      assert(es.nonEmpty)
      // reference: the literal clamped recursion
      val ref = es.scanLeft(0L)((s, e) => math.max(0L, s + e)).tail
      // engine: w11's formulation — running sum minus clamped running min
      val wRun = Window.orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = es.zipWithIndex.map { case (e, i) => (i, e) }.toDF("i", "e")
        .withColumn("p", sum(col("e")).over(wRun))
        .withColumn("cusum", col("p") - least(lit(0L), min(col("p")).over(wRun)))
        .orderBy("i").select("cusum").as[Long].collect().toSeq
      assert(got == ref, s"seed $seed: identity violated")
    }
  }

  test("g4 packed argmax picks (max count, min label) — equals the naive " +
    "tie-broken argmax on random neighbor label multisets") {
    val labGen = Gen.choose(0L, 50L)
    (1L to 5L).foreach { seed =>
      val labs = Gen.listOfN(300, labGen)
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      assert(labs.nonEmpty)
      val counts = labs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val naive = counts.toSeq.sortBy { case (lab, c) => (-c, lab) }.head._1
      val pack = 4294967296L
      val packedWinner = {
        val sc = counts.map { case (lab, c) => c * pack + (pack - 1 - lab) }.max
        pack - 1 - sc % pack
      }
      assert(packedWinner == naive, s"seed $seed: packed $packedWinner != $naive")
    }
  }

  test("a22 Count-Min estimates are one-sided: est >= true for every key " +
    "on random token streams") {
    import org.apache.spark.sql.functions._
    val tokGen = Gen.oneOf((1 to 40).map(i => s"tok$i"))
    (1L to 3L).foreach { seed =>
      val toks = Gen.listOfN(2000, tokGen)
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      assert(toks.nonEmpty)
      graft.functions.FastVec.register(spark)
      val df = toks.toDF("tok")
        .persist()
      val cells = df.select(explode(array((0 to 3).map(i =>
        struct(lit(i).as("i"),
          pmod(graft.functions.Text.seededHash64(lit(i), col("tok")), lit(64L))
            .as("h"))): _*)).as("c"))
        .select(col("c")("i").as("i"), col("c")("h").as("h"))
        .groupBy("i", "h").agg(count(lit(1)).as("c"))
      val probes = df.groupBy("tok").agg(count(lit(1)).as("freq"))
        .select(col("tok"), col("freq"),
          explode(array((0 to 3).map(i =>
            struct(lit(i).as("i"),
              pmod(graft.functions.Text.seededHash64(lit(i), col("tok")), lit(64L))
                .as("h"))): _*)).as("c"))
        .select(col("tok"), col("freq"), col("c")("i").as("i"), col("c")("h").as("h"))
      val est = probes.join(cells, Seq("i", "h"))
        .groupBy("tok", "freq").agg(min(col("c")).as("est"))
        .select("tok", "freq", "est").collect()
      df.unpersist()
      est.foreach { r =>
        assert(r.getLong(2) >= r.getLong(1),
          s"seed $seed: CMS under-estimated ${r.getString(0)}")
      }
    }
  }

  // Positions are DISTINCT per doc by construction in both producers (the
  // dup census emits each (doc, p) at most once), so the generator's
  // .distinct mirrors the production invariant rather than weakening it.
  test("gaps-and-islands coverage identity (d10 / startIngestSpans): the " +
    "running-max window formula equals the brute-force interval union on " +
    "random distinct-position sets") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = 15
    val posSetGen = Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 60)).map(_.distinct.sorted))
    (1L to 5L).foreach { seed =>
      val docs = Gen.listOfN(8, posSetGen)
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
      assert(docs.nonEmpty)
      val rows = docs.zipWithIndex.flatMap { case (ps, d) =>
        ps.map(p => (d.toLong, p))
      }
      val prior = Window.partitionBy("doc_id").orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
      val got = rows.toDF("doc_id", "p")
        .withColumn("prev_end",
          coalesce(max(col("p") + (w - 1)).over(prior), lit(-1)))
        .withColumn("contrib", greatest(lit(0),
          col("p") + (w - 1) - greatest(col("p") - 1, col("prev_end"))))
        .groupBy("doc_id")
        .agg(sum(col("contrib").cast("long")).as("covered"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.zipWithIndex.foreach { case (ps, d) =>
        val want = ps.flatMap(p => p to (p + w - 1)).toSet.size.toLong
        assert(got(d.toLong) == want,
          s"seed $seed doc $d: window formula ${got(d.toLong)} != union $want " +
            s"for positions $ps")
      }
    }
  }

  test("bloom membership is one-sided: NO build key ever fails the bitmap " +
    "test (false negatives impossible), and a disjoint probe set is mostly " +
    "rejected at low fill") {
    import graft.operators.Bloom
    val m = 4096
    (1L to 3L).foreach { seed =>
      val keys = Gen.listOfN(40, Gen.choose(0L, 1000000L))
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil).distinct
      val build = keys.toDF("k")
      val bm = Bloom.build(build, "k", m, 3)
      // every build key must pass — the property the trailing exact join
      // relies on for j11's completeness
      val hits = Bloom.mightContain(build, "k", bm, m, 3).count()
      assert(hits == keys.size, s"seed $seed: false negative (${keys.size - hits})")
      // disjoint probes: with 40 keys in 4096 bits (k=3), FP rate ~ (120/4096)^3
      // — a sanity band, not an exact bound
      val probes = (2000000L until 2000400L).toDF("k")
      val fp = Bloom.mightContain(probes, "k", bm, m, 3).count()
      assert(fp < 40, s"seed $seed: implausible FP count $fp of 400")
    }
  }

  test("z-order tile identity: zInterleave8(px,sy) div 256 equals " +
    "zInterleave8(px div 16, sy div 16) — every 256-z bucket is an " +
    "aligned 16x16 tile, the file-skipping guarantee") {
    import graft.queries.MiscQueries
    import org.apache.spark.sql.functions._
    val pts = (1L to 3L).flatMap { seed =>
      Gen.listOfN(200, Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L)))
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
    }
    val bad = pts.toDF("px", "sy")
      .withColumn("z", MiscQueries.zInterleave8(col("px"), col("sy")))
      .withColumn("tile", MiscQueries.zInterleave8(
        expr("px div 16"), expr("sy div 16")))
      .filter(expr("z div 256") =!= col("tile"))
      .count()
    assert(bad == 0, s"$bad points break the tile identity")
  }

  test("BFS hops equal driver BFS distances on random graphs, and every " +
    "hop-h node has a hop-(h-1) in-neighbor") {
    import graft.queries.GraphQueries
    (1L to 3L).foreach { seed =>
      val edges = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
        .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
        .filter { case (a, b) => a != b }.distinct
      val adjPairs = edges ++ edges.map(_.swap) // undirected
      val adj = adjPairs.toDF("a", "b")
      val rounds = 6
      val got = GraphQueries.bfsHops(adj, Seq(Tuple1(0L)).toDF("id"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver BFS truth
      val nbrs = adjPairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      var dist = Map(0L -> 0L)
      var frontier = Set(0L)
      var h = 0L
      while (frontier.nonEmpty && h < rounds) {
        h += 1
        val next = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty)) -- dist.keySet
        dist ++= next.map(_ -> h)
        frontier = next
      }
      assert(got == dist, s"seed $seed: engine $got != driver $dist")
      got.filter(_._2 > 0).foreach { case (n, hh) =>
        assert(nbrs.getOrElse(n, Set.empty).exists(p => got.get(p).contains(hh - 1)),
          s"seed $seed: node $n at hop $hh has no hop-${hh - 1} neighbor")
      }
    }
  }

  test("graft_lev_le equals builtin levenshtein <= k on random string " +
    "pairs and thresholds (banded DP + early exit is semantics-free)") {
    import org.apache.spark.unsafe.types.UTF8String
    val charGen = Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.oneOf(' ', 'x', '0', '9')))
    val strGen = Gen.choose(0, 70).flatMap(n => Gen.listOfN(n, charGen))
      .map(_.mkString)
    val caseGen = for {
      a <- strGen; b <- strGen; k <- Gen.choose(0, 12)
    } yield (a, b, k)
    val cases = (1L to 40L).flatMap { seed =>
      Gen.listOfN(50, caseGen).apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(Nil)
    }
    assert(cases.size >= 1500)
    var nearMisses = 0
    cases.foreach { case (a, b, k) =>
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val exact = ua.levenshteinDistance(ub)
      assert(graft.functions.GraftLev.levWithin(ua, ub, k) == (exact <= k),
        s"a='$a' b='$b' k=$k exact=$exact")
      if (exact == k || exact == k + 1) nearMisses += 1
    }
    // mutation-built pairs land ON the threshold boundary by construction:
    // d random substitutions give distance ≤ d (usually exactly d); test
    // every k around it
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val base = (0 until (10 + rnd.nextInt(50)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val d = rnd.nextInt(12)
      val mutated = base.toCharArray
      (0 until d).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = ('a' + rnd.nextInt(26)).toChar
      }
      val (ua, ub) = (UTF8String.fromString(base),
        UTF8String.fromString(new String(mutated)))
      val exact = ua.levenshteinDistance(ub)
      (math.max(0, exact - 2) to exact + 2).foreach { k =>
        assert(graft.functions.GraftLev.levWithin(ua, ub, k) == (exact <= k),
          s"base='$base' mutated=$d k=$k exact=$exact")
        nearMisses += 1
      }
    }
    assert(nearMisses > 10, s"only $nearMisses boundary cases")
    // targeted boundary pairs the random generator can miss
    for ((a, b) <- Seq(("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
      ("kitten", "sitting"), ("flaw", "lawn"), ("a" * 60, "a" * 49))) {
      val (ua, ub) = (UTF8String.fromString(a), UTF8String.fromString(b))
      val exact = ua.levenshteinDistance(ub)
      (0 to 12).foreach { k =>
        assert(graft.functions.GraftLev.levWithin(ua, ub, k) == (exact <= k),
          s"a='$a' b='$b' k=$k exact=$exact")
      }
    }
  }
  test("d17 bloom admission is one-sided: every exact duplicate is graded " +
    "true_dup (never admitted or false_positive) — the no-false-negative " +
    "guarantee — and every false_positive has all k probes hit") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("d17_bloom_admission")(spark, sf).collect()
    // Recompute exact duplicate truth independently (d7's census rule).
    val fp = graft.functions.Text.prefixFingerprint(
      graft.functions.Text.tokens(org.apache.spark.sql.functions.col("text")), 8)
    val docs = Tables.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"), fp.as("fp"))
    val corpusFps = docs.filter("doc_id < 400").select("fp")
      .collect().map(_.getString(0)).toSet
    val batchFp = docs.filter("doc_id >= 400")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    var dups = 0
    out.foreach { r =>
      val (id, nHit, verdict) = (r.getLong(0), r.getLong(1), r.getString(2))
      val isDup = corpusFps.contains(batchFp(id))
      if (isDup) {
        dups += 1
        assert(verdict == "true_dup" && nHit == 3,
          s"doc $id: exact dup graded '$verdict' with n_hit=$nHit — false negative")
      }
      if (verdict == "false_positive")
        assert(nHit == 3 && !isDup, s"doc $id: bad false_positive row")
      if (verdict == "admitted")
        assert(nHit < 3, s"doc $id: admitted with all probes hit")
    }
    assert(dups > 0, "fixture must contain at least one exact duplicate")
  }

  test("m7 shots PARTITION each doc's frames: shot sizes sum to the frame " +
    "count, shots are contiguous 0..n, and adjacent shots abut") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("m7_shot_boundary")(spark, sf)
      .collect().groupBy(_.getLong(0))
    val nFrames = Tables.table(spark, sf, "documents")
      .filter("length(text) > 0")
      .selectExpr("doc_id", "(length(text) + 63) div 64 AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq,
        s"doc $doc: shot ids not contiguous")
      assert(sorted.map(_.getLong(2)).sum == nFrames(doc),
        s"doc $doc: shot sizes don't sum to the frame count")
      assert(sorted.head.getLong(3) == 0L, s"doc $doc: first shot must start at frame 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(3) == a.getLong(4) + 1,
            s"doc $doc: shot ${b.getLong(1)} does not abut its predecessor")
        case _ => ()
      }
    }
  }

  test("h15 terciles are balanced and exhaustive per week: sizes differ by " +
    "at most 1 and cover the week's full valid cross-section") {
    val out = SparkEntry.queries("h15_momentum_portfolio")(
      spark, "/root/testdata/sf0.001").collect().groupBy(_.getLong(0))
    assert(out.nonEmpty)
    out.foreach { case (wk, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L),
        s"week $wk: expected exactly terciles 1..3")
      val sizes = rows.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1,
        s"week $wk: ntile imbalance ${sizes.mkString(",")}")
    }
  }

}
