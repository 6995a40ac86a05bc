package graft

import graft.operators.AsOf
import graft.plans.NativeAsOf
import graft.queries.Joins
import org.apache.spark.sql.functions._

/** The native planner-integrated as-of join (`graft.plans.AsOfJoinPlan`)
  * must be OBSERVABLY the same operator as the composed union+window path
  * (`operators/AsOf`) — every test here proves equality or pins the
  * physical shape the custom node declares.
  */
class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 1.0),
    ("A", ts("2024-01-01 11:00:00"), 2.0),
    ("B", ts("2024-01-01 10:30:00"), 9.0)
  ).toDF("key", "qts", "quote")

  private def trades = Seq(
    ("A", ts("2024-01-01 10:30:00"), "t1"),
    ("A", ts("2024-01-01 11:00:00"), "t2"), // equal ts → quote visible
    ("A", ts("2024-01-01 09:00:00"), "t3"), // before any → null
    ("B", ts("2024-01-01 12:00:00"), "t4")
  ).toDF("key", "tts", "tid")

  test("native as-of equals the composed union+window operator on the fixture") {
    val native = NativeAsOf
      .joinAsOf(trades, quotes, "key", "tts", "qts", Seq("quote"))
      .select($"tid", $"asof_ts", $"asof_quote")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    val composed = AsOf
      .joinAsOf(trades, quotes, "key", "tts", "qts", Seq("quote"))
      .select($"tid", $"asof_ts", $"asof_quote")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSet
    assert(native == composed)
    assert(native.exists { case (tid, t, _) => tid == "t3" && t == null },
      "no-prior-row case must null-pad")
  }

  test("equal-(key, ts) right ties resolve to the greatest payload — the " +
    "composed operator's documented tiebreak") {
    val dupQuotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 5.0),
      ("A", ts("2024-01-01 10:00:00"), 7.0),
      ("A", ts("2024-01-01 10:00:00"), 6.0)
    ).toDF("key", "qts", "quote")
    val one = Seq(("A", ts("2024-01-01 10:30:00"), "t")).toDF("key", "tts", "tid")
    val out = NativeAsOf.joinAsOf(one, dupQuotes, "key", "tts", "qts", Seq("quote"))
      .select($"asof_quote").collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(7.0))
  }

  test("native equals composed on the corpus self-join shape (j9: purchases " +
    "x same-table clicks), row for row") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.table(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max(col("value")).as("value"))
    def collectMap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
      .collect().map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    val native = collectMap(
      NativeAsOf.joinAsOf(purchases, clicks, "user_id", "ts", "ts", Seq("value")))
    val composed = collectMap(
      AsOf.joinAsOf(purchases, clicks, "user_id", "ts", "ts", Seq("value")))
    assert(native.size == composed.size && native == composed)
    assert(native.values.exists(_._1 != null) && native.values.exists(_._1 == null),
      "corpus must exercise both matched and unmatched rows")
  }

  test("physical shape: AsOfJoinExec with one exchange and one sort per side " +
    "— never a union-width shuffle, window, or nested loop") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.table(spark, sf, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts", "value")
    val df = NativeAsOf.joinAsOf(purchases, clicks, "user_id", "ts", "ts", Seq("value"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
    // SparkPlan.nodeName strips the "Exec" suffix in rendered trees
    assert(finalPlan.contains("AsOfJoin "), finalPlan.take(3000))
    assert(!finalPlan.contains("Window"),
      "the native path must not fall back to the window formulation:\n" +
        finalPlan.take(3000))
    assert(!finalPlan.contains("BroadcastNestedLoopJoin") &&
      !finalPlan.contains("CartesianProduct"), finalPlan.take(3000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(exchanges == 2, s"one exchange per side, got $exchanges:\n${finalPlan.take(3000)}")
  }

  test("left multiplicity is preserved and output ordering passes through") {
    val out = NativeAsOf.joinAsOf(trades, quotes, "key", "tts", "qts", Seq("quote"))
    assert(out.count() == trades.count())
  }

  test("FORWARD direction equals the composed time-negation formulation on " +
    "the corpus (j16 vs j13), row for row") {
    val sf = "/root/testdata/sf0.001"
    def collectRows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSeq
    val native = collectRows(Joins.j16AsOfNativeForward.fn(spark, sf))
    val composed = collectRows(Joins.j13AsOfForward.fn(spark, sf))
    assert(native.size == composed.size && native == composed)
    assert(native.exists(_._3 != null) && native.exists(_._3 == null),
      "corpus must exercise both matched and tolerance-missed rows")
  }

  test("NEAREST direction equals the composed two-pass formulation on the " +
    "corpus (j17 vs j15), row for row") {
    val sf = "/root/testdata/sf0.001"
    def collectRows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3), r.get(4))).toSeq
    val native = collectRows(Joins.j17AsOfNativeNearest.fn(spark, sf))
    val composed = collectRows(Joins.j15AsOfNearest.fn(spark, sf))
    assert(native.size == composed.size && native == composed)
    val dirs = native.flatMap(r => Option(r._5)).toSet
    assert(dirs == Set("prev", "next"),
      s"corpus must exercise both directions, got $dirs")
  }

  test("forward physical shape: AsOfJoinExec, no Window, descending-ts " +
    "sorts, one exchange per side") {
    val sf = "/root/testdata/sf0.001"
    val df = Joins.j16AsOfNativeForward.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut >= 0) plan.substring(0, cut) else plan
    assert(finalPlan.contains("AsOfJoin "), finalPlan.take(3000))
    // the ORDER BY event_id at the top is a Sort but adds no Window; the
    // as-of itself must not fall back to the union+window formulation
    assert(!finalPlan.contains("Window"), finalPlan.take(3000))
    assert(finalPlan.contains("DESC"),
      "forward direction must sort ts descending:\n" + finalPlan.take(3000))
  }

  test("randomized adversarial FORWARD equality with the composed " +
    "time-negation path") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0L, 9L)
    } yield (k, t, v.toDouble)
    def sample(seed: Long, n: Int) = Gen.listOfN(n, rowGen)
      .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
    (1L to 6L).foreach { seed =>
      val l = sample(seed, 50).zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, t) }
        .toDF("lid", "key", "lts")
      val r = sample(seed + 100, 50).toDF("key", "rts", "v")
        .repartition((seed % 3 + 1).toInt)
      val native = NativeAsOf
        .joinAsOf(l, r, "key", "lts", "rts", Seq("v"), graft.plans.AsOfForward)
        .select($"lid", $"asof_ts", $"asof_v")
        .collect().map(row => (row.getLong(0), row.get(1), row.get(2))).toSet
      // composed forward = backward over negated time (the j13 identity)
      val composed = AsOf
        .joinAsOf(
          l.withColumn("nts", -$"lts"), r.withColumn("nts", -$"rts").drop("rts"),
          "key", "nts", "nts", Seq("v"))
        .select($"lid",
          (-$"asof_ts").as("asof_ts"), $"asof_v")
        .collect().map(row => (row.getLong(0), row.get(1), row.get(2))).toSet
      assert(native == composed, s"seed=$seed\n" +
        s"native-only=${native -- composed}\ncomposed-only=${composed -- native}")
    }
  }

  test("randomized adversarial NEAREST equality with the composed two-pass " +
    "arbiter — unique (key, ts) right side, pandas tie-to-backward rule") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0L, 9L)
    } yield (k, t, v.toDouble)
    def sample(seed: Long, n: Int) = Gen.listOfN(n, rowGen)
      .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
    (1L to 6L).foreach { seed =>
      val l = sample(seed, 50).zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, t) }
        .toDF("lid", "key", "lts")
      // collapse right per (key, ts): the nearest contract (exec scaladoc)
      val r = sample(seed + 100, 50).toDF("key", "rts", "v")
        .groupBy("key", "rts").agg(max($"v").as("v"))
        .repartition((seed % 3 + 1).toInt)
      val native = NativeAsOf
        .joinAsOf(l, r, "key", "lts", "rts", Seq("v"), graft.plans.AsOfNearest)
        .select($"lid", $"asof_ts", $"asof_v")
        .collect().map(row => (row.getLong(0), row.get(1), row.get(2))).toSet
      val back = AsOf.joinAsOf(l, r, "key", "lts", "rts", Seq("v"))
        .withColumnRenamed("asof_ts", "bts").withColumnRenamed("asof_v", "bv")
      val both = AsOf.joinAsOf(
          back.withColumn("nts", -$"lts"),
          r.withColumn("nts", -$"rts").drop("rts"), "key", "nts", "nts", Seq("v"))
        .select($"lid", $"lts", $"bts", $"bv",
          (-$"asof_ts").as("fts"), $"asof_v".as("fv"))
      val pickPrev = $"fts".isNull ||
        ($"bts".isNotNull && ($"lts" - $"bts") <= ($"fts" - $"lts"))
      val composed = both.select($"lid",
          when(pickPrev, $"bts").otherwise($"fts"),
          when(pickPrev, $"bv").otherwise($"fv"))
        .collect().map(row => (row.getLong(0), row.get(1), row.get(2))).toSet
      assert(native == composed, s"seed=$seed\n" +
        s"native-only=${native -- composed}\ncomposed-only=${composed -- native}")
    }
  }

  test("randomized adversarial equality with the composed operator — dense " +
    "key collisions, duplicate (key, ts) rows, nulls, varied partitioning") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // few keys + tiny ts domain → heavy boundary traffic (key changes,
    // exact-ts ties, duplicate right rows) — exactly where a streamed
    // merge's held-row logic can go stale
    val rowGen = for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 20L)
      v <- Gen.choose(0L, 9L)
      nullTs <- Gen.prob(0.1)
    } yield (k, if (nullTs) null else java.lang.Long.valueOf(t), v.toDouble)
    def sample(seed: Long, n: Int) = Gen.listOfN(n, rowGen)
      .apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

    (1L to 8L).foreach { seed =>
      val lRows = sample(seed, 60)
      val rRows = sample(seed + 100, 60)
      val l = lRows.zipWithIndex
        .map { case ((k, t, _), i) => (i.toLong, k, t) }
        .toDF("lid", "key", "lts")
      val r = rRows.map { case (k, t, v) => (k, t, v) }.toDF("key", "rts", "v")
        .repartition((seed % 3 + 1).toInt) // vary pre-join layout
      def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
          String, String, String, Seq[String]) => org.apache.spark.sql.DataFrame) =
        f(l, r, "key", "lts", "rts", Seq("v"))
          .select($"lid", $"asof_ts", $"asof_v")
          .collect().map(row => (row.getLong(0), row.get(1), row.get(2))).toSet
      val native = run(NativeAsOf.joinAsOf(_, _, _, _, _, _))
      val composed = run(AsOf.joinAsOf)
      assert(native == composed, s"seed=$seed\n" +
        s"native-only=${native -- composed}\ncomposed-only=${composed -- native}")
    }
  }
}
