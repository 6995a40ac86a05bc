package graft

import graft.functions.Text
import graft.operators.MinHashLSH
import org.apache.spark.sql.functions._

/** Text primitives + MinHash/LSH behavior: shingle shapes, fingerprint
  * stability, LSH finds exact duplicates, and verified Jaccard values are
  * exact set Jaccard.
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("wordShingles produces n-grams, distinct, and [] when too short") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y x y x y"))
      .toDF("doc_id", "text")
      .select($"doc_id", Text.wordShingles(Text.tokens($"text"), 3).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(1L) == Seq("a b c", "b c d"))
    assert(m(2L) == Seq.empty)
    assert(m(3L).toSet == Set("x y x", "y x y")) // distinct
  }

  test("fingerprints: identical text → identical md5; prefix groups by opening") {
    val df = Seq((1L, "same opening words here tail one"), (2L, "same opening words here tail two"))
      .toDF("doc_id", "text")
      .select(
        Text.fingerprint($"text").as("full"),
        Text.prefixFingerprint(Text.tokens($"text"), 4).as("p4"))
    val rows = df.collect()
    assert(rows(0).getString(0) != rows(1).getString(0))
    assert(rows(0).getString(1) == rows(1).getString(1))
  }

  test("MinHash LSH surfaces exact duplicates and verified Jaccard is exact") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // dup of 1
      (3L, "the quick brown fox jumps over the lazy dog again and often"), // near-dup
      (4L, "completely different content with no overlap at all whatsoever here")
    ).toDF("doc_id", "text")
    val pairs = MinHashLSH
      .nearDupPairs(docs, "doc_id", "text", shingleN = 3, numHashes = 8, bands = 4, threshold = 0.2)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("a")), r.getLong(r.fieldIndex("b")),
        r.getDouble(r.fieldIndex("jaccard"))))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((1L, 2L)).contains(1.0), "exact dup must be found with jaccard 1.0")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "disjoint doc must not pair")
  }

  test("simhash: identical docs agree; hamming to unrelated docs is larger") {
    val sims = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally unrelated words entirely"))
      .toDF("doc_id", "text")
      .select($"doc_id", explode(Text.tokens($"text")).as("tok"))
      .select($"doc_id", Text.tokenHash32($"tok").as("hv"))
      .groupBy("doc_id")
      .agg(Text.simhashAgg($"hv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) > 0)
  }

  test("prefix-filtered similarity join equals brute force at t=0.5 on " +
    "real corpus data (the SSJoin lemma + length filter lose NOTHING)") {
    val sh = MinHashLSH.shingleTable(
      Tables.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 5)
      .persist()
    sh.count()
    val brute = MinHashLSH.jaccardAllPairs(sh, "doc_id")
      .filter(col("jaccard") >= 0.5)
      .select("a", "b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val filtered = MinHashLSH
      .verifyJaccard(MinHashLSH.prefixFilteredPairs(sh, "doc_id"), sh, "doc_id")
      .filter(col("jaccard") >= 0.5)
      .select("a", "b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    sh.unpersist()
    assert(filtered == brute,
      s"missing=${(brute -- filtered).take(5)} extra=${(filtered -- brute).take(5)}")
    assert(brute.nonEmpty, "corpus should contain at least one near-dup pair")
  }

  test("prefix-filtered similarity join at t=3/10 equals brute force on " +
    "real corpus data (the generalized-threshold lemma loses nothing)") {
    val sh = MinHashLSH.shingleTable(
      Tables.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 3)
      .persist()
    sh.count()
    val brute = MinHashLSH.jaccardAllPairs(sh, "doc_id")
      .filter(col("jaccard") >= 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val filtered = MinHashLSH
      .verifyJaccard(MinHashLSH.prefixFilteredPairsAt(sh, "doc_id", 3, 10), sh, "doc_id")
      .filter(col("jaccard") >= 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    sh.unpersist()
    assert(filtered == brute,
      s"missing=${(brute -- filtered).take(5)} extra=${(filtered -- brute).take(5)}")
    assert(brute.nonEmpty, "corpus should contain at least one pair at t=0.3")
  }

  test("d11: LSH recall is bounded by 1, n_found never exceeds n_truth, " +
    "and every LSH pair at the threshold is in the truth set") {
    val r = graft.queries.DedupQueries.d11LshRecall
      .fn(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect().head
    val (nTruth, nFound, recall) = r
    assert(nTruth > 0)
    assert(nFound <= nTruth)
    assert(recall >= 0.0 && recall <= 1.0)
    assert(recall == nFound.toDouble / nTruth)
  }

  test("d12: OPH pairs are a subset of the exact Jaccard >= 0.3 truth with " +
    "exact jaccard values, and the pipeline finds pairs on real corpus data") {
    val sf = "/root/testdata/sf0.001"
    val sh = MinHashLSH.shingleTable(
      Tables.table(spark, sf, "documents"), "doc_id", "text", 3).persist()
    sh.count()
    val brute = MinHashLSH.jaccardAllPairs(sh, "doc_id")
      .filter(col("jaccard") >= 0.3)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    sh.unpersist()
    val oph = graft.queries.DedupQueries.d12OphMinhash.fn(spark, sf)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(oph.nonEmpty, "OPH should surface at least one near-dup pair")
    oph.foreach { case (a, b, j) =>
      assert(brute.contains((a, b)), s"($a,$b) not in the exact truth set")
      assert(j == brute((a, b)), s"($a,$b) jaccard $j != exact ${brute((a, b))}")
    }
  }

  test("d13: rotation densification kills the sentinel band-collisions of " +
    "disjoint short docs that d12's sentinels produce") {
    // One shingle per doc → 7 of 8 OPH bins empty. Disjoint content, so the
    // ONLY way these two can band-collide is through the empty-bin encoding.
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val sh = MinHashLSH.shingleTable(docs, "doc_id", "text", 3)
    // Sentinels: every band containing neither doc's occupied bin is
    // sentinel-only on BOTH sides → guaranteed false candidate.
    val sentinel = MinHashLSH.candidatePairs(
      MinHashLSH.ophSignatures(sh, "doc_id", 8), "doc_id", 8, 4).collect()
    assert(sentinel.nonEmpty,
      "sentinel OPH must band-collide the disjoint short docs (d12's documented weakness)")
    // Densified: empty bins carry the doc's own (distance-offset) real min,
    // so signature equality again requires shingle agreement.
    val dense = MinHashLSH.candidatePairs(
      MinHashLSH.ophDensifiedSignatures(sh, "doc_id", 8), "doc_id", 8, 4).collect()
    assert(dense.isEmpty,
      "densified OPH must not band-collide docs with disjoint shingles")
  }

  test("d13: densified pairs are a subset of the exact Jaccard >= 0.3 truth " +
    "with exact jaccard values on real corpus data") {
    val sf = "/root/testdata/sf0.001"
    val sh = MinHashLSH.shingleTable(
      Tables.table(spark, sf, "documents"), "doc_id", "text", 3).persist()
    sh.count()
    val brute = MinHashLSH.jaccardAllPairs(sh, "doc_id")
      .filter(col("jaccard") >= 0.3)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    sh.unpersist()
    val dense = graft.queries.DedupQueries.d13OphDense.fn(spark, sf)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(dense.nonEmpty, "densified OPH should surface at least one near-dup pair")
    dense.foreach { case (a, b, j) =>
      assert(brute.contains((a, b)), s"($a,$b) not in the exact truth set")
      assert(j == brute((a, b)), s"($a,$b) jaccard $j != exact ${brute((a, b))}")
    }
  }

  test("containment finds a short doc embedded in a long one that Jaccard misses") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // contained in 2's opening
      (2L, long),
      (3L, "unrelated words that share nothing with either document at all here")
    ).toDF("doc_id", "text")
    val sh = MinHashLSH.shingleTable(docs, "doc_id", "text", 3).persist()
    sh.count()
    val cont = MinHashLSH
      .verifyContainment(MinHashLSH.containmentPairs(sh, "doc_id", 4, 5), sh, "doc_id")
      .filter(col("containment") >= 0.8)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(cont.exists(p => p._1 == 1L && p._2 == 2L && p._5 == 1.0),
      s"embedded doc not found: ${cont.mkString(",")}")
    // the same pair's Jaccard is small — the asymmetric relation is the point
    val jac = MinHashLSH.jaccardAllPairs(sh, "doc_id")
      .filter(col("a") === 1L && col("b") === 2L)
      .select("jaccard").as[Double].collect().head
    sh.unpersist()
    assert(jac < 0.5, s"jaccard unexpectedly high: $jac")
  }

  test("containment prefix filter equals brute force at t=0.8 on real corpus data") {
    val sh = MinHashLSH.shingleTable(
      Tables.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 5)
      .persist()
    sh.count()
    // brute force: every pair sharing >= 1 shingle, exact containment
    val allPairs = sh.select(col("doc_id").as("a"), col("shingle"))
      .join(sh.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
    val brute = MinHashLSH.verifyContainment(allPairs, sh, "doc_id")
      .filter(col("containment") >= 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val filtered = MinHashLSH
      .verifyContainment(MinHashLSH.containmentPairs(sh, "doc_id", 4, 5), sh, "doc_id")
      .filter(col("containment") >= 0.8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    sh.unpersist()
    assert(filtered == brute,
      s"missing=${(brute -- filtered).take(5)} extra=${(filtered -- brute).take(5)}")
    assert(brute.nonEmpty, "corpus should contain at least one containment pair")
  }

  test("fused shingleTable equals the window-lead reference formulation " +
    "on real corpus data (every n, including empty-token edge cases)") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
      // synthetic edge rows: consecutive spaces (empty tokens), short docs
      .unionByName(Seq(
        (100001L, "a  b c"), (100002L, "x"), (100003L, ""), (100004L, "p q")
      ).toDF("doc_id", "text"))
    for (n <- Seq(1, 3, 5)) {
      val fused = MinHashLSH.shingleTable(docs, "doc_id", "text", n)
        .as[(Long, String)].collect().toSet
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      val parts = col("tok") +: (1 until n).map(k => lead($"tok", k).over(w))
      val reference = docs
        .select($"doc_id", posexplode(Text.tokens($"text")).as(Seq("pos", "tok")))
        .select($"doc_id", concat_ws(" ", parts: _*).as("shingle"),
          lead($"tok", n - 1).over(w).isNotNull.as("_full"))
        .filter($"_full")
        .select($"doc_id", $"shingle")
        .distinct()
        .as[(Long, String)].collect().toSet
      assert(fused == reference,
        s"n=$n missing=${(reference -- fused).take(5)} extra=${(fused -- reference).take(5)}")
      assert(fused.nonEmpty)
    }
  }

  test("d10 duplicate-span coverage is the exact interval union of " +
    "duplicated windows (w=15), including overlap merging and short docs") {
    val shared30 = (1 to 30).map(i => s"w$i")
    val shared20 = (1 to 20).map(i => s"s$i")
    val docs = Seq(
      (1L, shared30.mkString(" ")),                                     // dup of 2
      (2L, shared30.mkString(" ")),
      (3L, (shared30.take(15) ++ (1 to 25).map(i => s"u$i")).mkString(" ")), // one dup window
      (4L, (1 to 10).map(i => s"v$i").mkString(" ")),                   // too short: 0 windows
      (6L, (shared20 ++ (1 to 10).map(i => s"a$i")).mkString(" ")),     // overlapping dups
      (7L, ((1 to 10).map(i => s"b$i") ++ shared20).mkString(" "))
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("d10spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupQueries.d10DupSpans.fn(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // (n_tokens, n_windows, n_dup_windows, covered_tokens)
    assert(out(1L) == ((30L, 16L, 16L, 30L)), s"got ${out(1L)}")   // fully covered
    assert(out(2L) == ((30L, 16L, 16L, 30L)))
    assert(out(3L) == ((40L, 26L, 1L, 15L)), s"got ${out(3L)}")    // single dup window
    assert(out(4L) == ((10L, 0L, 0L, 0L)))                         // shorter than w
    // six overlapping dup windows [0,14]..[5,19] merge to 20 covered, not 90
    assert(out(6L) == ((30L, 16L, 6L, 20L)), s"got ${out(6L)}")
    assert(out(7L) == ((30L, 16L, 6L, 20L)), s"got ${out(7L)}")
  }

  test("d14 CDC chunking is shift-resistant: a front insertion re-chunks " +
    "only the prefix, while the fixed grid (d6) would shift every segment") {
    // 200 shared tokens drawn from a hashed alphabet so boundary hits occur;
    // doc 2 = doc 1 with one token prepended. Content-defined boundaries
    // resynchronize after the edit, so most of doc 1's chunk fingerprints
    // must reappear in doc 2 — that shared mass is exactly what
    // d14_cdc_chunks reports as duplicated chunks on both docs.
    val body = (1 to 200).map(i => s"tok${i % 37}x$i")
    val docs = Seq(
      (1L, body.mkString(" ")),
      (2L, ("INSERTED" +: body).mkString(" ")),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("d14spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.DedupQueries.d14CdcChunks.fn(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // (n_chunks, n_dup_chunks, dup_token_frac)
    val (c1, d1, f1) = out(1L)
    val (_, d2, _) = out(2L)
    assert(out(3L)._2 == 0L, s"unrelated doc must have no dup chunks: ${out(3L)}")
    // the resynchronized suffix dominates: most chunks of doc 1 survive in 2
    assert(d1 >= c1 / 2,
      s"expected most of doc 1's $c1 chunks to survive the insertion, got $d1 dups")
    assert(d2 >= d1, "doc 2 shares at least the chunks doc 1 shares")
    assert(f1 > 0.4, s"shared token mass should dominate, got $f1")
  }

  test("d19: planted shared substrings yield exactly their MAXIMAL spans — " +
    "not extended, not fragmented, and two separated plants stay two spans") {
    // Vocabulary discipline: every non-shared token is globally unique, so
    // NO window outside a plant can collide — the emitted spans are purely
    // the planted substrings.
    val S = (1 to 25).map(i => s"s$i")       // 25-token shared substring
    val s1 = (1 to 15).map(i => s"p$i")      // 15-token plant #1
    val s2 = (1 to 15).map(i => s"q$i")      // 15-token plant #2
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i")
    val docs = Seq(
      // doc 1: 20 unique + S + 20 unique → S at positions 20..44
      (1L, (uniq("a", 20) ++ S ++ uniq("b", 20)).mkString(" ")),
      // doc 2: 17 unique + S + 23 unique → S at positions 17..41
      (2L, (uniq("c", 17) ++ S ++ uniq("d", 23)).mkString(" ")),
      // doc 3: two separated plants (gap 5) — must NOT merge into one span
      (3L, (s1 ++ uniq("e", 5) ++ s2).mkString(" ")),
      // doc 4: the plants' partners, far apart
      (4L, (s1 ++ uniq("f", 30) ++ s2).mkString(" ")),
      (5L, uniq("g", 40).mkString(" ")))    // unrelated
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("src0"))
      .withColumn("n_chars", length($"text").cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("d19spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val spans = graft.queries.DedupQueries.d19MaxDupSpans.fn(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    // MAXIMALITY on doc 1/2: exactly ONE span, starting exactly where S
    // starts, with length exactly |S| = 25 — one token more would need a
    // duplicated window one position further out, which cannot exist.
    assert(spans(1L).toSeq == Seq((1L, 20L, 25L, 11L)), spans(1L).toSeq.toString)
    assert(spans(2L).toSeq == Seq((2L, 17L, 25L, 11L)), spans(2L).toSeq.toString)
    // SEPARATION on doc 3/4: two w-length plants with a 5-token gap stay
    // two spans of exactly w — the islands rule must not bridge the gap.
    assert(spans(3L).toSeq.sortBy(_._2) ==
      Seq((3L, 0L, 15L, 1L), (3L, 20L, 15L, 1L)), spans(3L).toSeq.toString)
    assert(spans(4L).toSeq.sortBy(_._2) ==
      Seq((4L, 0L, 15L, 1L), (4L, 45L, 15L, 1L)), spans(4L).toSeq.toString)
    assert(!spans.contains(5L), "unrelated doc must emit no spans")
  }

  test("tokenHash32 is a stable 32-bit value") {
    val vals = Seq(("x", 1), ("x", 2)).toDF("tok", "i")
      .select(Text.tokenHash32($"tok").as("h")).collect().map(_.getLong(0))
    assert(vals(0) == vals(1))
    assert(vals.forall(v => v >= 0 && v <= 0xffffffffL))
  }
}
