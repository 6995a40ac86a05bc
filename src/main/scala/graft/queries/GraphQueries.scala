package graft.queries

import graft.{Q, Tables}
import graft.operators.PageRank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Graph analytics over relation-derived graphs — the iterative-compute
  * family next to d5's connected components. The reference pipeline has no
  * graph operator; a training-data engine needs one for link-graph quality
  * signals (Common-Crawl-style domain ranking feeds the quality score that
  * x3/c3 consume downstream).
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  private val PrMass = 1000000000000L
  private val PrIters = 6

  /** The DuckDB oracle unrolls the same K power-iteration rounds the engine
    * runs, with identical integer arithmetic (`//` is floor division; all
    * operands non-negative, so it matches Spark's truncating `div`).
    * `CAST(sum(..) AS BIGINT)` guards the HUGEINT→float64 driver-hash trap.
    */
  private def prOracle(k: Int): String = {
    val iters = (1 to k).map { i =>
      s""",
      c$i AS (SELECT e.b AS id, CAST(sum(p.r // o.d) AS BIGINT) AS s
              FROM r${i - 1} p JOIN outdeg o ON o.a = p.id JOIN edges e ON e.a = p.id
              GROUP BY e.b),
      r$i AS (SELECT n.id, (15 * (SELECT $PrMass // n FROM nn)) // 100
                           + (85 * coalesce(c.s, 0)) // 100 AS r
              FROM nodes n LEFT JOIN c$i c ON c.id = n.id)"""
    }.mkString
    s"""WITH pair AS (SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
             FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      edges AS (
        SELECT 2*ck AS a, 2*sk + 1 AS b FROM pair
        UNION ALL
        SELECT 2*sk + 1 AS a, 2*ck AS b FROM pair),
      outdeg AS (SELECT a, count(*) AS d FROM edges GROUP BY a),
      nodes AS (SELECT DISTINCT a AS id FROM edges),
      nn AS (SELECT count(*) AS n FROM nodes),
      r0 AS (SELECT id, (SELECT $PrMass // n FROM nn) AS r FROM nodes)$iters
      SELECT CASE WHEN id % 2 = 1 THEN 'supplier' ELSE 'customer' END AS kind,
             id // 2 AS key, r AS rank_u
      FROM r$k ORDER BY rank_u DESC, kind, key LIMIT 100"""
  }

  /** G1: PageRank over the bipartite customer⇄supplier purchase graph —
    * "a supplier is important if important customers buy from it, and a
    * customer is important if it buys from important suppliers", the exact
    * recursive-importance semantics PageRank formalizes. Nodes are
    * parity-encoded (`2·custkey` / `2·suppkey+1`) so the two key spaces
    * can't collide; the undirected purchase relation is symmetrized into a
    * directed edge list.
    *
    * Scale: the edge derivation is one keyed shuffle of lineitem on
    * orderkey plus a distinct on the (cust, supp) pair; each of the K=6
    * rounds is one keyed shuffle with map-side partial sums, with the edge
    * and degree tables computed once and reused (see `PageRank.ranks` for
    * the lineage-truncation and unpersist discipline). Integer-exact, so
    * the result is bit-identical regardless of partitioning or cluster
    * size.
    */
  val g1PageRank: Q = Q(
    "g1_pagerank",
    (s, dir) => {
      val pair = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("ck"), (col("l_suppkey") * 2 + 1).as("sk"))
        .distinct()
      val edges = pair.select(col("ck").as("a"), col("sk").as("b"))
        .unionAll(pair.select(col("sk").as("a"), col("ck").as("b")))
      PageRank.ranks(edges, iterations = PrIters, totalMass = PrMass)
        .select(
          when(col("id") % 2 === 1, lit("supplier"))
            .otherwise(lit("customer")).as("kind"),
          expr("id div 2").as("key"),
          col("r").as("rank_u"))
        .orderBy(desc("rank_u"), col("kind"), col("key"))
        .limit(100)
    },
    Some(prOracle(PrIters))
  )

  val all: Seq[Q] = Seq(g1PageRank)
}
