package graft

import org.apache.spark.sql.functions._

/** x23 BPE training vs a plain-Scala brute force: the 4 learned merge
  * rules (pair, weighted frequency, order) must equal a sequential
  * replay of census → argmax → framed literal replace. Java's
  * `String.replace` shares the left-to-right non-overlapping scan of
  * Spark's and DuckDB's `replace`, so the brute force pins the exact
  * semantics the query (and its oracle) must implement.
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private val Sep = '\u001f'

  private def brute(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var census: Map[String, Long] = words.map { case (w, c) =>
      (Sep + w.toSeq.mkString(Sep.toString) + Sep, c)
    }
    (1 to k).map { r =>
      val freqs = collection.mutable.Map.empty[(String, String), Long]
      census.foreach { case (seq, c) =>
        val syms = seq.split(Sep).filter(_.nonEmpty)
        syms.zip(syms.tail).foreach(p => freqs(p) = freqs.getOrElse(p, 0L) + c)
      }
      val ((c1, c2), f) = freqs.minBy { case ((a, b), n) => (-n, a, b) }
      census = census.map { case (seq, c) =>
        (seq.replace(s"$Sep$c1$Sep$c2$Sep", s"$Sep$c1$c2$Sep"), c)
      }
      (r, c1, c2, f)
    }
  }

  test("the 4 learned merges equal a sequential brute-force replay at " +
    "sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val words = Tables.table(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val want = brute(words, 4)
    val got = graft.queries.TextAnalysis.x23BpeTrain.fn(spark, sf)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got == want, s"query merges $got != brute force $want")
    // merges must be 4 distinct pairs with non-increasing... frequencies
    // need NOT be monotone (a merge can create a new high-count pair),
    // but each round's pick must be the max of ITS round — already pinned
    // by the brute force; sanity: all pairs distinct
    assert(got.map(r => (r._2, r._3)).distinct.size == 4)
  }

  test("a run of the same pair merges with the framed-replace semantics " +
    "(documented variant: consumed boundary, one merge per scan)") {
    val words = Map("aaaa" -> 1L, "ab" -> 3L)
    val rules = brute(words, 2)
    // round 1: pairs are (a,a)x3 + (a,b)x3 — tie broken to (a,a); 'aaaa'
    // becomes [aa, a, a] (the consumed-boundary scan), NOT [aa, aa]
    assert(rules.head._2 == "a" && rules.head._3 == "a" && rules.head._4 == 3L)
    // round 2: from [aa, a, a]: pairs (aa,a)x1, (a,a)x1, (a,b)x3 → (a,b)
    assert(rules(1)._2 == "a" && rules(1)._3 == "b" && rules(1)._4 == 3L)
  }

  // ——— x33 to-vocab convergence cases (r11 verdict #5) ———

  /** The x33 loop replayed sequentially: merge until vocab hits `v`,
    * the best pair drops below `minCount`, or pairs run out.
    */
  private def bruteVocab(words: Map[String, Long], v: Long, minCount: Long,
      rmax: Int): Seq[(Int, String, String, Long, Long)] = {
    var census: Map[String, Long] = words.map { case (w, c) =>
      (Sep + w.toSeq.mkString(Sep.toString) + Sep, c)
    }
    val v0 = census.keys.flatMap(_.split(Sep).filter(_.nonEmpty)).toSet.size.toLong
    val m = math.min(math.max(0L, v - v0), rmax.toLong)
    var out = Vector.empty[(Int, String, String, Long, Long)]
    var r = 1
    var go = m >= 1
    while (go) {
      val freqs = collection.mutable.Map.empty[(String, String), Long]
      census.foreach { case (seq, c) =>
        val syms = seq.split(Sep).filter(_.nonEmpty)
        syms.zip(syms.tail).foreach(p => freqs(p) = freqs.getOrElse(p, 0L) + c)
      }
      if (freqs.isEmpty) go = false
      else {
        val ((c1, c2), f) = freqs.minBy { case ((a, b), n) => (-n, a, b) }
        if (f < minCount) go = false
        else {
          out = out :+ ((r, c1, c2, f, v0 + r))
          census = census.map { case (seq, c) =>
            (seq.replace(s"$Sep$c1$Sep$c2$Sep", s"$Sep$c1$c2$Sep"), c)
          }
          r += 1
          go = r <= m
        }
      }
    }
    out
  }

  private def docsDir(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpedocs").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") }
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def runX33(dir: String): Seq[(Int, String, String, Long, Long)] = {
    import spark.implicits._
    graft.queries.TextAnalysis.x33BpeVocab.fn(spark, dir)
      .as[(Int, String, String, Long, Long)].collect().toSeq
  }

  test("x33 equals the sequential to-vocab replay on sf0.001 (vocab-budget " +
    "stop) and emits vocab_size = v0 + round") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val words = Tables.table(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val want = bruteVocab(words, v = 34, minCount = 2, rmax = 12)
    val got = runX33(sf)
    assert(got == want, s"x33 $got != brute $want")
    assert(want.nonEmpty, "sf0.001 should execute at least one merge")
  }

  test("x33 min-count stop: after the only frequent pair merges, the best " +
    "remaining pair sits below MinCount and the loop halts early") {
    // (a,b) x3 is the lone >=2 pair; everything after round 1 is freq 1
    val dir = docsDir(Seq("ab ab ab cd ef gh"))
    val got = runX33(dir)
    val want = bruteVocab(Map("ab" -> 3L, "cd" -> 1L, "ef" -> 1L, "gh" -> 1L),
      v = 34, minCount = 2, rmax = 12)
    assert(got == want && got.size == 1 && got.head._2 == "a" && got.head._3 == "b",
      s"min-count convergence drifted: $got")
  }

  test("x33 pairs-exhausted stop: single-character words train zero rules") {
    val dir = docsDir(Seq("a b c a b c"))
    assert(runX33(dir).isEmpty)
  }

  /** Encode one word with a learned rule table (sequential replay of
    * x34's application order).
    */
  private def bruteEncodeLen(word: String,
      rules: Seq[(Int, String, String, Long, Long)]): Int = {
    var seq = Sep + word.toSeq.mkString(Sep.toString) + Sep
    rules.foreach { case (_, c1, c2, _, _) =>
      seq = seq.replace(s"$Sep$c1$Sep$c2$Sep", s"$Sep$c1$c2$Sep")
    }
    seq.split(Sep).count(_.nonEmpty)
  }

  test("x34 per-doc token counts equal a sequential encode under the x33 " +
    "rule table at sf0.001, with the exact integer compression column") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val words = Tables.table(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val rules = bruteVocab(words, v = 34, minCount = 2, rmax = 12)
    val lens = words.keys.map(w => w -> bruteEncodeLen(w, rules)).toMap
    val want = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, ws) =>
        id -> (ws.size.toLong, ws.map(_.length.toLong).sum,
          ws.map(w => lens(w).toLong).sum)
      }.toMap
    val got = graft.queries.TextAnalysis.x34BpeEncode.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (id, nw, nc, nb, pm) =>
      val (ww, wc, wb) = want(id)
      assert((nw, nc, nb) == (ww, wc, wb),
        s"doc $id: got ($nw, $nc, $nb) want ($ww, $wc, $wb)")
      assert(pm == 1000L * nc / nb, s"doc $id compression column drifted")
    }
  }

  test("x34 with zero learned rules (single-char words) degrades to " +
    "token count = char count at 1000 permille") {
    import spark.implicits._
    val dir = docsDir(Seq("a b c a b c"))
    val rows = graft.queries.TextAnalysis.x34BpeEncode.fn(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 1)
    val (_, nw, nc, nb, pm) = rows.head
    assert(nw == 6 && nc == 6 && nb == 6 && pm == 1000,
      s"degenerate encode drifted: ($nw, $nc, $nb, $pm)")
  }

  test("x33 vocab-budget stop: a rich repetitive corpus runs its full " +
    "merge budget (capped at the oracle unroll), not to pair exhaustion") {
    // 8 chars -> v0 = 8; the 8 rotations of "abcdefgh" keep every cyclic
    // pair at weight 7x40, so merges stay frequent far past 12 rounds and
    // the loop must stop on the budget min(34-8, 12) = 12
    val base = "abcdefgh"
    val rots = (0 until 8).map(k => base.drop(k) + base.take(k))
    val dir = docsDir(rots.map(w => Seq.fill(40)(w).mkString(" ")))
    val got = runX33(dir)
    val want = bruteVocab(rots.map(_ -> 40L).toMap, v = 34, minCount = 2,
      rmax = 12)
    assert(got == want, s"budget convergence drifted: $got != $want")
    assert(got.size == 12, s"expected the 12-round budget stop, got ${got.size}")
    assert(got.last._5 == 8L + 12L)
  }

  test("the AQE-off round window restores the session conf on exit " +
    "(r13: the trainers toggle spark.sql.adaptive.enabled around the " +
    "vocab-bounded merge rounds)") {
    val key = "spark.sql.adaptive.enabled"
    val sf = "/root/testdata/sf0.001"
    val before = spark.conf.getOption(key)
    graft.queries.TextAnalysis.x23BpeTrain.fn(spark, sf).collect()
    assert(spark.conf.getOption(key) == before,
      s"x23 must restore $key: was $before, now ${spark.conf.getOption(key)}")
    spark.conf.set(key, "true") // explicit value must round-trip too
    graft.queries.TextAnalysis.x33BpeVocab.fn(spark, sf).collect()
    assert(spark.conf.get(key) == "true",
      "x33 must restore the explicitly-set value")
    spark.catalog.clearCache()
  }
}
