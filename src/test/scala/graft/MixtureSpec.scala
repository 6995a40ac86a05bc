package graft

import graft.operators.MinHashLSH
import graft.queries.MixtureQueries
import org.apache.spark.sql.functions._

/** Invariants of the mixture/admission family that the DuckDB hash-compare
  * can't express: mixture budget behavior at the fraction boundary, sample
  * reproducibility under repartitioning, surprisal bounds, and d8's
  * admission agreeing with a brute-force cross-side Jaccard on the
  * candidate recall set.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("c3: three domains, fractions capped at 2^20, admitted counts " +
    "bounded by the corpus, and full admission when budget covers corpus") {
    val rows = MixtureQueries.c3MixtureBuild.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == Set("books", "code", "web"))
    rows.foreach { case (d, nd, nt, budget, frac, ad, at) =>
      assert(frac <= (1L << 20), s"$d frac $frac")
      assert(ad <= nd && at <= nt, s"$d admitted more than exists")
      // when the budget covers the whole domain, everything is admitted
      if (budget >= nt) {
        assert(frac == (1L << 20) && ad == nd && at == nt,
          s"$d budget $budget >= corpus $nt but only $ad/$nd admitted")
      }
    }
  }

  test("p13: per-lang top-30 with contiguous ranks, invariant under " +
    "repartitioning, and weight monotonicity in expectation (same hash, " +
    "larger weight => smaller key)") {
    val df = MixtureQueries.p13WeightedSample.fn(spark, sf)
    val a = df.as[(String, Long, Int, Long, Int)].collect()
    a.groupBy(_._1).foreach { case (lang, rows) =>
      val ranks = rows.map(_._5).sorted
      assert(ranks.head == 1 && ranks.toSeq == (1 to ranks.length),
        s"$lang ranks not contiguous from 1: ${ranks.toSeq}")
      assert(ranks.length <= 30)
    }
    val b = MixtureQueries.p13WeightedSample.fn(spark, sf)
      .repartition(7).as[(String, Long, Int, Long, Int)].collect()
    assert(a.toSet == b.toSet)
  }

  test("x11: bigram surprisal is nonnegative, covers exactly the docs with " +
    ">= 2 tokens, and n_bigrams = n_tokens - 1") {
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
      .as[(Long, Int)].collect().toMap
    val out = MixtureQueries.x11BigramSurprisal.fn(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet == docs.filter(_._2 >= 2).keySet)
    out.foreach { case (id, nbg, bits) =>
      assert(nbg == docs(id) - 1, s"doc $id: $nbg bigrams for ${docs(id)} tokens")
      assert(bits >= 0.0, s"doc $id: negative surprisal $bits")
    }
  }

  test("d8: admission agrees with brute-force cross-side Jaccard on the " +
    "band-candidate set, and output covers exactly the new batch") {
    val docs = Tables.table(spark, sf, "documents")
    val newIds = docs.filter(col("source") === "src19")
      .select("doc_id").as[Long].collect().toSet
    val out = MixtureQueries.d8IncrementalNearDup.fn(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    assert(out.map(_._1).toSet == newIds)
    out.foreach { case (_, n, adm) => assert(adm == (n == 0)) }
    // brute force: all cross-side pairs with exact Jaccard >= 0.3 must be
    // a SUPERSET of d8's matches (banding can only lose recall, never
    // invent a match — verified pairs are exact)
    val sh = MinHashLSH.shingleTable(docs, "doc_id", "text", 3)
    val exact = MinHashLSH.jaccardAllPairs(sh, "doc_id")
      .filter(col("jaccard") >= 0.3)
      .select("a", "b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p, p.swap))
      .filter { case (a, b) => newIds.contains(a) && !newIds.contains(b) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    out.foreach { case (id, n, _) =>
      val bound = exact.getOrElse(id, 0)
      assert(n <= bound, s"doc $id: d8 reports $n matches, brute force $bound")
    }
  }

  test("e8: PQ-ADC top-10 is deterministic across physical plans and " +
    "distances are nonnegative") {
    val a = graft.queries.SimilarityQueries.e8PqAdc.fn(spark, sf)
      .as[(Long, Int, Double)].collect()
    assert(a.length == 10)
    a.foreach { case (id, _, d) => assert(d >= 0.0, s"vec $id: negative ADC $d") }
    val b = graft.queries.SimilarityQueries.e8PqAdc.fn(spark, sf)
      .as[(Long, Int, Double)].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("x12: every cluster keeps exactly one member, and the kept member " +
    "has maximal quality (doc_id tie-break)") {
    val out = MixtureQueries.x12RetentionPolicy.fn(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect()
    out.groupBy(_._1).foreach { case (cluster, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $cluster keeps ${kept.length}")
      val best = members.minBy(m => (-m._3, m._2))
      assert(kept.head._2 == best._2,
        s"cluster $cluster kept ${kept.head._2}, best is ${best._2}")
    }
  }

  test("c8: exactly 40 rows ordered by (qkey desc, doc_id), valid domains, " +
    "invariant under repartitioning, and the Gumbel key recomputes exactly " +
    "from score_bits + the md5-uniform draw") {
    val a = MixtureQueries.c8DsirAdmission.fn(spark, sf)
      .as[(Long, String, Long, Double, Long)].collect()
    assert(a.length == 40)
    assert(a.forall(r => Set("web", "books", "code").contains(r._2)))
    assert(a.toSeq == a.sortBy(r => (-r._5, r._1)).toSeq, "not qkey-desc ordered")
    val b = MixtureQueries.c8DsirAdmission.fn(spark, sf)
      .repartition(7).as[(Long, String, Long, Double, Long)].collect()
    assert(a.toSet == b.toSet)
    val q20 = (1L << 20).toDouble
    val q40 = 1L << 40
    a.foreach { case (docId, _, _, scoreBits, qkey) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"11|$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val hv = java.lang.Long.parseLong(hex, 16)
      val u = (hv % q40 + 1).toDouble / q40.toDouble
      val expected = math.round((scoreBits - math.log(-math.log(u))) * q20)
      assert(qkey == expected, s"doc $docId: qkey $qkey != $expected")
    }
  }

  test("c9: shares sum to ~2^20, w_q20 recomputes exactly from the token " +
    "census, and temperature flattening boosts rarer languages more") {
    val out = MixtureQueries.c9TemperatureMixture.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val q20 = 1L << 20
    // integer-floor shares: each sum lands in (2^20 - #langs, 2^20]
    val pSum = out.map(_._4).sum
    val qSum = out.map(_._6).sum
    assert(pSum > q20 - out.length && pSum <= q20, s"p_q20 sum $pSum")
    assert(qSum > q20 - out.length && qSum <= q20, s"q_q20 sum $qSum")
    val total = out.map(_._3).sum
    out.foreach { case (lang, _, toks, _, wq, _, _, _) =>
      val expected = math.round(math.pow(toks.toDouble / total, 0.3) * q20)
      assert(wq == expected, s"$lang: w_q20 $wq != $expected")
    }
    // flattening: strictly rarer language => boost at least as large,
    // yet scaled shares never invert the raw ordering
    val byToks = out.sortBy(_._3)
    byToks.sliding(2).foreach {
      case Array(small, large) if small._3 < large._3 =>
        assert(small._7 >= large._7,
          s"${small._1} boost ${small._7} < ${large._1} boost ${large._7}")
        assert(small._6 <= large._6 + 1,
          s"${small._1} q_q20 ${small._6} inverts ${large._1} ${large._6}")
      case _ => ()
    }
  }

  test("c11: the allocation identity holds exactly — target = full epochs " +
    "times corpus + remainder, and the fractional threshold is sub-2^20") {
    val rows = MixtureQueries.c11EpochAllocation.fn(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, toks, _, target, nFull, rem, fracQ20) =>
      assert(target == nFull * toks + rem, s"$lang allocation identity")
      assert(rem >= 0 && rem < toks, s"$lang remainder out of range")
      assert(fracQ20 >= 0 && fracQ20 < (1L << 20), s"$lang frac_q20 range")
      // upsampled languages must repeat: any target above corpus size
      // yields at least one full epoch
      if (target >= toks) assert(nFull >= 1, s"$lang lost its full pass")
    }
  }

  test("d8 plan: the band probe is an equi-join (no cartesian product " +
    "anywhere in the plan)") {
    val plan = MixtureQueries.d8IncrementalNearDup.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
