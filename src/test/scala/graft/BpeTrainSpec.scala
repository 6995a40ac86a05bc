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
}
