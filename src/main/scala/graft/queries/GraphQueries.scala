package graft.queries

import graft.{Q, Tables}
import graft.operators.{Lineage, PageRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics over relation-derived graphs — the iterative-compute
  * family next to d5's connected components. The reference pipeline has no
  * graph operator; a training-data engine needs one for link-graph quality
  * signals (Common-Crawl-style domain ranking feeds the quality score that
  * x3/c3 consume downstream).
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)

  /** The part co-purchase graph g2/g3/g4 share: parts connected when the
    * same order buys both at least twice (w ≥ 2 kills one-off random
    * co-occurrences — 97% of the raw edge set at sf0.1). Per-order pair
    * fanout is bounded (order size ≤ 7 lines) and the weight threshold is
    * applied INSIDE the map-side-combinable edge aggregation, so no
    * sub-threshold edge ever shuffles twice.
    */
  private[graft] def partCoEdges(s: SparkSession, dir: String): DataFrame = {
    val co = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    co.select(col("ok"), col("pk").as("u"))
      .join(co.select(col("ok"), col("pk").as("v")), Seq("ok"))
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("u", "v")
  }

  /** Materialized view of the co-purchase graph: the SYMMETRIZED adjacency
    * `(a, b)` and the degree table `(id, d)`, written ONCE per (JVM, dir)
    * as BUCKETED tables (`sources/Bucketed`: bucketBy + sortBy on the join
    * key) and memoized per session. Round 5's verdict measured the edge
    * derivation (lineitem distinct + self-join + weighted agg) paid per
    * inlined copy; round 6's memo shared it per session but every ISOLATED
    * query (bench min-of-2 clears the memo) still rebuilt it — the top
    * line of the slowest-15. This is the 100 TB answer the repo already
    * ships for fact-to-fact reuse: pay the derivation + shuffle once at
    * write time, and every later consumer gets a hash-partitioned,
    * sorted scan — per-round `groupBy(a)` / equi-joins on `a` plan with
    * NO Exchange on the edge side (PlanSpec-asserted). On a cluster this
    * is a bucketed warehouse table; here it lives under /tmp per JVM.
    *
    * Not a correctness shortcut: each query's semantics are unchanged —
    * the table IS `partCoEdges` symmetrized, and `clearMemo` (bench
    * hygiene) drops only the in-memory handles; the on-disk materialized
    * view intentionally survives, exactly like a warehouse table would.
    */
  private val CoBuckets = 16

  /** Drop the memoized in-memory handles (benchmark hygiene — called by
    * Bench next to `DedupQueries.clearMemo`). The bucketed TABLES stay
    * ([[graft.sources.MatView]] owns them): they are the materialized view
    * a cluster deployment would keep in its warehouse; a re-measure after
    * clearMemo re-plans from the table scan, not from this session's RAM.
    */
  def clearMemo(): Unit = {
    graft.sources.MatView.clearMemo(); labelCache.clear(); triCache.clear()
  }

  /** Materialize this family's views once per session (Bench pre-build —
    * r8 verdict #7; build cost lands in view_build_sec).
    */
  def prebuildViews(s: SparkSession, dir: String): Unit = {
    coAdjDeg(s, dir); coPair(s, dir); coPrGraph(s, dir)
  }

  /** Memoized (adjacency, degrees) of the shared co-purchase graph, both
    * bucketed on their join key via [[graft.sources.MatView]]. Table names
    * carry the corpus dir so scale factors never collide.
    */
  private[graft] def coAdjDeg(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val adj = graft.sources.MatView.of(s, s"graft_co_adj_$tag", "a", CoBuckets) {
      val e = partCoEdges(s, dir)
      e.select(col("u").as("a"), col("v").as("b"))
        .unionAll(e.select(col("v").as("a"), col("u").as("b")))
    }
    val deg = graft.sources.MatView.of(s, s"graft_co_deg_$tag", "id", CoBuckets) {
      adj.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
    }
    (adj, deg)
  }

  /** The de-symmetrized edge view (u < v) of [[coAdjDeg]]'s adjacency —
    * a narrow filter over the bucketed scan, for consumers that count
    * each undirected edge once (g2/g6/g8).
    */
  private[graft] def coEdgesDeg(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (adj, deg) = coAdjDeg(s, dir)
    (adj.filter(col("a") < col("b")).select(col("a").as("u"), col("b").as("v")), deg)
  }

  /** The OTHER shared graph base: the bipartite customer⇄supplier purchase
    * pair table `(ck, sk)` g1's PageRank and g10's HITS both derive from
    * `orders ⋈ lineitem` + distinct — materialized once per (JVM, dir) as
    * a bucketed table like [[coAdjDeg]], so an isolated g1/g10 pays a scan
    * instead of the fact join. Bucketed on `ck`: HITS' hub half-round
    * joins on it shuffle nothing on the pair side (the authority
    * half-round alternates to `sk`, whose shuffle AQE handles; bucketing
    * can only pin one key — documented trade-off, the hub side is the
    * bigger relation at real scale since customers outnumber suppliers).
    */
  private[graft] def coPair(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    graft.sources.MatView.of(s, s"graft_co_pair_$tag", "ck", CoBuckets) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(
          t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
    }
  }

  /** g1's PageRank inputs as materialized views: the parity-encoded
    * symmetrized purchase graph with the out-degree PRE-JOINED onto every
    * edge (`a`, `b`, `d` — bucketed on `a`, so each power round's
    * contribution join shuffles nothing on the edge side) plus the node
    * set (`id`, bucketed). Built from [[coPair]]'s table, once per
    * (JVM, dir): an isolated g1 pays ~a scan for graph prep instead of
    * the fact join + three persist barriers `PageRank.ranks` needs when
    * handed raw edges.
    */
  private[graft] def coPrGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val e = graft.sources.MatView.of(s, s"graft_co_predge_$tag", "a", CoBuckets) {
      val pair = coPair(s, dir)
        .select((col("ck") * 2).as("ck"), (col("sk") * 2 + 1).as("sk"))
      val edges = pair.select(col("ck").as("a"), col("sk").as("b"))
        .unionAll(pair.select(col("sk").as("a"), col("ck").as("b")))
      val outdeg = edges.groupBy("a").agg(count(lit(1)).as("d"))
      edges.join(outdeg, Seq("a"))
    }
    val n = graft.sources.MatView.of(s, s"graft_co_prnode_$tag", "id", CoBuckets) {
      e.select(col("a").as("id")).distinct()
    }
    (e, n)
  }

  /** The same edge table in DuckDB SQL (CTE body producing columns u, v). */
  private val sqlCoEdges =
    """co AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (SELECT x.pk AS u, y.pk AS v FROM co x JOIN co y
                ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2 HAVING count(*) >= 2)"""

  private val PrMass = 1000000000000L
  private val PrIters = 6

  /** The DuckDB oracle unrolls the same K power-iteration rounds the engine
    * runs, with identical integer arithmetic (DuckDB's `//` truncates
    * toward zero like Spark's `div`; all operands non-negative here).
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
      // The degree-joined parity graph and node set come from the bucketed
      // materialized views (coPrGraph) — the power rounds then skip the
      // generic ranks() prep barriers entirely, and each round's
      // contribution join reads the bucketed edge layout.
      val (edgedT, nodes) = coPrGraph(s, dir)
      PageRank.ranksPrepared(edgedT, nodes, iterations = PrIters, totalMass = PrMass)
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

  /** G2: triangle counting over the part co-purchase graph — the local
    * clustering primitive (Schank–Wade degree orientation) a link-graph
    * quality pipeline runs next to PageRank: parts are connected when the
    * same order buys both at least TWICE (w ≥ 2 kills the one-off random
    * co-occurrences, which at sf0.1 is 97% of the raw edge set), and each
    * node's triangle count measures how clique-like its co-purchase
    * neighborhood is.
    *
    * Scale: per-order pair generation has bounded fanout (order size ≤ 7
    * lines), the weight threshold is applied INSIDE the edge aggregation
    * (map-side combinable count, then filter — no thresholded edge ever
    * shuffles twice), and the wedge join runs on DEGREE-ORIENTED edges:
    * every edge points from its lower (degree, id) endpoint to the higher,
    * so per-node out-degree is O(√m) regardless of hub skew and the wedge
    * count is bounded by m^1.5 instead of Σdeg² (the difference between a
    * straggler-free join and a hot-key collapse on a power-law graph).
    * Ranks pack as `degree·2³² + id` into one long (partkeys fit 32 bits
    * at any tested SF), so orientation is a branch, not a struct compare.
    * Integer counts everywhere — bit-identical across engines and
    * partitionings.
    */
  val g2TriangleCount: Q = Q(
    "g2_triangle_count",
    (s, dir) => triCensus(s, dir)
      .select(col("id").as("part_id"), col("n_tri"))
      .orderBy(desc("n_tri"), col("part_id")),
    Some("""WITH co AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (SELECT x.pk AS u, y.pk AS v FROM co x JOIN co y
                ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT id, count(*) AS d FROM (
                SELECT u AS id FROM edges UNION ALL SELECT v FROM edges)
              GROUP BY id),
      r AS (SELECT e.u, e.v, p.d * 4294967296 + e.u AS ru, q.d * 4294967296 + e.v AS rv
            FROM edges e JOIN deg p ON p.id = e.u JOIN deg q ON q.id = e.v),
      o AS (SELECT CASE WHEN ru < rv THEN u ELSE v END AS a,
                   CASE WHEN ru < rv THEN v ELSE u END AS b,
                   CASE WHEN ru < rv THEN rv ELSE ru END AS rb
            FROM r),
      tri AS (SELECT e1.a AS a, e1.b AS b1, e2.b AS b2
              FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.rb < e2.rb
              JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b)
      SELECT part_id, count(*) AS n_tri FROM (
        SELECT a AS part_id FROM tri
        UNION ALL SELECT b1 FROM tri
        UNION ALL SELECT b2 FROM tri)
      GROUP BY part_id ORDER BY n_tri DESC, part_id""")
  )

  /** Memoized per-node triangle census `(id, n_tri)` over the
    * degree-oriented co-purchase edges — the Schank–Wade wedge pipeline
    * shared by g2 (raw counts) and g11 (clustering coefficient). One
    * definition, one session persist of the oriented edge set: the two
    * previously-inlined copies each built and cached it (double work in a
    * run executing both, drift risk under future edits). Cleared by
    * [[clearMemo]]; the oriented set's RAM is reclaimed by the caller's
    * `catalog.clearCache()` (Bench's clean-slate protocol).
    */
  private val triCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def triCensus(s: SparkSession, dir: String): DataFrame =
    triCache.getOrElseUpdate((s, dir), {
      val (edges, deg) = coEdgesDeg(s, dir)
      val ranked = edges
        .join(deg.select(col("id").as("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("id").as("v"), col("d").as("dv")), Seq("v"))
        .select(col("u"), col("v"),
          (col("du") * 4294967296L + col("u")).as("ru"),
          (col("dv") * 4294967296L + col("v")).as("rv"))
      val o = ranked.select(
          when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("a"),
          when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("b"),
          greatest(col("ru"), col("rv")).as("rb"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      o.count() // eager: the wedge join scans `o` from three subtrees at once
      val tri = o.select(col("a"), col("b").as("b1"), col("rb").as("rb1"))
        .join(o.select(col("a"), col("b").as("b2"), col("rb").as("rb2")), Seq("a"))
        .filter(col("rb1") < col("rb2"))
        .join(o.select(col("b").as("b2"), col("a").as("b1")), Seq("b1", "b2"))
      tri.select(explode(array(col("a"), col("b1"), col("b2"))).as("id"))
        .groupBy("id").agg(count(lit(1)).as("n_tri"))
    })

  private val KcoreK = 2
  private val KcoreRounds = 4

  /** The oracle unrolls the same R peel rounds the engine runs: drop every
    * node whose surviving degree is below k, drop edges touching dropped
    * nodes, repeat. Pure integer counts; `CAST(count AS BIGINT)` on the
    * output guards the HUGEINT→float64 driver-hash trap.
    */
  private def kcoreOracle(k: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s""",
      k$i AS (SELECT a FROM a${i - 1} GROUP BY a HAVING count(*) >= $k),
      a$i AS (SELECT t.a, t.b FROM a${i - 1} t
              JOIN k$i x ON t.a = x.a JOIN k$i y ON t.b = y.a)"""
    }.mkString
    s"""WITH co AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (SELECT x.pk AS u, y.pk AS v FROM co x JOIN co y
                ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2 HAVING count(*) >= 2),
      a0 AS (SELECT u AS a, v AS b FROM edges
             UNION ALL SELECT v AS a, u AS b FROM edges)$iters
      SELECT a AS part_id, CAST(count(*) AS BIGINT) AS core_deg
      FROM a$rounds GROUP BY a ORDER BY core_deg DESC, part_id"""
  }

  /** G3: k-core decomposition (k=2, R=4 peel rounds) over g2's part
    * co-purchase graph — the subgraph-density primitive next to triangle
    * counting: a node survives the 2-core iff it keeps ≥2 neighbors after
    * every lower-degree node (and its edges) is repeatedly peeled away.
    * Link-graph pipelines use the core number as a spam/quality signal
    * (low-core pages are link-farm leaves; high-core ones sit in dense
    * organic neighborhoods).
    *
    * Scale: each peel round is ONE map-side-combinable degree aggregation
    * plus two semi-joins of the edge list against the (strictly smaller)
    * survivor set — never an all-pairs product, never a driver collect.
    * Rounds are a fixed R (the oracle unrolls the identical R), each
    * round's edge list is persisted and the predecessor unpersisted, so
    * lineage stays O(1) deep exactly like `PageRank.ranks` /
    * `ConnectedComponents.minLabels`. Peeling strictly shrinks the edge
    * set, so round cost is monotonically decreasing; on a 100 TB graph the
    * degree agg shuffles only (node, count) pairs, not payloads.
    * Integer-exact throughout — bit-identical across partitionings.
    */
  val g3KCore: Q = Q(
    "g3_kcore",
    (s, dir) => {
      // Round 0 reads the bucketed adjacency straight off disk (no persist
      // needed — the materialized table IS the cache, and its groupBy("a")
      // plans with no Exchange on the edge side); later rounds persist
      // their shrinking survivor sets as before.
      val adj0 = coAdjDeg(s, dir)._1
      var m = adj0.count()
      var persisted: DataFrame = null
      var adj = adj0
      // Peeling is monotone: if a round drops NO edge, every node kept
      // ≥ k neighbors, so all remaining rounds are identity — exit early
      // (the oracle's fixed R unrolled rounds compute the same result,
      // since identity rounds are free in SQL but cost a degree agg, two
      // semi-joins, a persist and a count here).
      var round = 0
      var fixed = false
      while (round < KcoreRounds && !fixed) {
        if (Thread.currentThread().isInterrupted)
          throw new InterruptedException("kcore cancelled")
        round += 1
        val keep = adj.groupBy("a").agg(count(lit(1)).as("d"))
          .filter(col("d") >= KcoreK).select("a")
        val next = adj
          .join(keep, Seq("a"), "left_semi")
          .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
          .select("a", "b")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val m2 = next.count()
        if (persisted != null) persisted.unpersist()
        persisted = next
        adj = Lineage.truncate(next)
        fixed = m2 == m
        m = m2
      }
      adj.groupBy(col("a").as("part_id"))
        .agg(count(lit(1)).as("core_deg"))
        .orderBy(desc("core_deg"), col("part_id"))
    },
    Some(kcoreOracle(KcoreK, KcoreRounds))
  )

  private val LpRounds = 4
  private val LpPack = 4294967296L // 2^32: labels are partkeys, < 2^32 at any SF

  /** The oracle unrolls the same R synchronous rounds with the identical
    * packed argmax: `max(cnt·2³² + (2³²−1 − lab))` picks the most frequent
    * neighbor label with smallest-label tie-break, in one BIGINT max.
    */
  /** The WITH-clause body shared by g4's and g8's oracles: co-purchase
    * edges, symmetrized adjacency, and the unrolled label rounds l0..lR.
    */
  private def lpCtes(rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s""",
      c$i AS (SELECT e.a, l.lab, count(*) AS c
              FROM adj e JOIN l${i - 1} l ON l.id = e.b GROUP BY e.a, l.lab),
      l$i AS (SELECT a AS id,
                     4294967295 - (max(c * $LpPack + (4294967295 - lab)) % $LpPack) AS lab
              FROM c$i GROUP BY a)"""
    }.mkString
    s"""$sqlCoEdges,
      adj AS (SELECT u AS a, v AS b FROM edges
              UNION ALL SELECT v AS a, u AS b FROM edges),
      l0 AS (SELECT DISTINCT a AS id, a AS lab FROM adj)$iters"""
  }

  private def lpOracle(rounds: Int): String =
    s"""WITH ${lpCtes(rounds)}
      SELECT lab AS community, CAST(count(*) AS BIGINT) AS size
      FROM l$rounds GROUP BY lab ORDER BY size DESC, community"""

  /** G4: community detection by synchronous label propagation (Raghavan
    * et al. 2007) over the part co-purchase graph — the clustering
    * primitive link-graph pipelines run after PageRank/triangles: every
    * node starts as its own community and repeatedly adopts its
    * neighborhood's most frequent label, so dense co-purchase
    * neighborhoods collapse onto one label within a few rounds.
    *
    * Determinism: plain LPA is tie-unstable; here the argmax is TOTAL —
    * `(count desc, label asc)` packed into one long
    * (`cnt·2³² + (2³²−1 − lab)`, labels are partkeys < 2³²), so every
    * engine, partitioning and cluster size picks the same label. Rounds
    * are a fixed R=4 (synchronous JACOBI update — all nodes flip on the
    * same snapshot — which is what makes an unrolled SQL oracle possible).
    *
    * Scale: each round is ONE keyed equi-join of the adjacency against
    * the label table (both hash-partitioned on the join key) feeding a
    * two-level aggregation whose first level is map-side combinable;
    * per-round state is persisted and the predecessor unpersisted, so
    * lineage stays O(1) deep exactly like `PageRank.ranks`. Only
    * (node, label, count) triples ever shuffle — payload-free at 100 TB.
    */
  /** The g4 core on an arbitrary undirected edge list (u, v) — also driven
    * by `ScaleProbe.graphProbe` at growing edge counts.
    */
  private[graft] def labelPropagate(
      edges: DataFrame,
      rounds: Int): DataFrame = {
    val adj = edges.select(col("u").as("a"), col("v").as("b"))
      .unionAll(edges.select(col("v").as("a"), col("u").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count() // eager: scanned by l0 and every round's join
    val out = labelAssign(Lineage.truncate(adj), rounds)
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("size"))
      .orderBy(desc("size"), col("community"))
    adj.unpersist()
    out
  }

  /** The g4 loop's node → label assignment (id, lab), shared by g4's
    * census and g8's modularity scoring. REQUIRES a SYMMETRIZED adjacency
    * `(a, b)` (both callers pass one): the round joins the edge table on
    * `a` and groups neighbor labels by `b`, which on a symmetric edge set
    * is exactly the join-on-b/group-on-a multiset (every (n, x) row has
    * its (x, n) twin). For the registry path — [[coAdjDeg]]'s table,
    * hash-partitioned and sorted on `a` — the per-round neighbor join
    * therefore genuinely needs no Exchange on the edge side (r9 fix: the
    * previous join-on-b form shuffled the fat side every round against
    * the `a` bucketing) and no persist (the materialized table is the
    * cache). The returned frame is lineage-truncated over the final
    * persisted round, so consumers never re-run the propagation.
    *
    * Input skew: this round IS the join-feeding-same-key-agg shape AQE's
    * skew splitter declines (PROBES `skew_label_aqe` — the groupBy reuses
    * the join's hashpartitioning, so splitting is refused; ~100‰ hot-task
    * share under a planted super-node). The registry corpus is balanced;
    * on a skewed graph wrap the neighbor join in
    * [[graft.operators.Skew.autoSaltedJoin]] (census-triggered, no
    * hand-set salt — PROBES r12 `skew_label_autosalt` bounds the share
    * at ~43‰ with an identical result) and re-aggregate per key, the g8
    * two-level fold.
    */
  private[graft] def labelAssign(
      adj: DataFrame,
      rounds: Int): DataFrame = {
    val l0 = adj.select(col("a").as("id")).distinct()
      .withColumn("lab", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    l0.count()
    var persisted = l0
    var labels = Lineage.truncate(l0)
    // Synchronous LPA reaches a fixed point when NO node flips its label;
    // from then on every round is identity, so exit early. The round's one
    // action doubles as the change detector: `next` carries a `chg` flag
    // (new label ≠ old), and counting the flagged rows both materializes
    // the persisted round and decides convergence — the
    // ConnectedComponents frontier pattern. The oracle's fixed R unrolled
    // rounds compute the same result (identity rounds are free in SQL).
    var round = 0
    var changed = 1L
    while (round < rounds && changed > 0) {
      if (Thread.currentThread().isInterrupted)
        throw new InterruptedException("label propagation cancelled")
      round += 1
      // Join on `a` — the bucket key — and GROUP on `b`: on a SYMMETRIC
      // adjacency the neighbor-label multiset of node n is identical
      // whether read from (n, x) rows or (x, n) rows, so this computes
      // the same labels as the join-on-b form while the fat side needs
      // NO Exchange against the a-bucketed view (r9: the join-on-b form
      // shuffled |E| rows per round INTO the join on top of the |E|-row
      // groupBy shuffle — this halves per-round movement; the node-sized
      // labels side shuffles instead).
      val upd = adj
        .join(labels.select(col("id").as("a"), col("lab")), Seq("a"))
        .groupBy(col("b"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("b"))
        .agg(max(col("c") * LpPack + (lit(LpPack - 1) - col("lab"))).as("sc"))
        .select(col("b").as("id"),
          (lit(LpPack - 1) - col("sc") % LpPack).as("lab"))
      val next = upd
        .join(labels.select(col("id"), col("lab").as("old")), Seq("id"))
        .select(col("id"), col("lab"), (col("lab") =!= col("old")).as("chg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("chg")).count()
      persisted.unpersist()
      persisted = next
      labels = Lineage.truncate(next.select("id", "lab"))
    }
    labels
  }

  val g4LabelProp: Q = Q(
    "g4_label_prop",
    (s, dir) => coLabels(s, dir)
      .groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("size"))
      .orderBy(desc("size"), col("community")),
    Some(lpOracle(LpRounds))
  )

  private val BfsRounds = 6

  /** G5: single-source BFS hop distance from the graph's hub (highest
    * co-purchase degree, smallest-id tie-break) over g2's part graph —
    * the reachability primitive next to d5's connected components:
    * "how many co-purchase hops from the catalog's most-connected part
    * is every other part?" feeds the same neighborhood-quality signals
    * (a part many hops from every hub sits in a thin, disconnected
    * corner of the catalog).
    *
    * Scale: classic frontier expansion — each round is ONE semi-join of
    * the adjacency against the (strictly new) frontier plus one
    * anti-join against the visited set, both keyed equi-joins shuffling
    * only (id, hop) pairs; the frontier is new nodes only, so total work
    * across all rounds is O(E) edge touches, not O(E·rounds). Rounds
    * persist/truncate/unpersist exactly like `labelPropagate`, and the
    * loop exits the moment a frontier comes back empty (the oracle's
    * bounded recursion computes the same result — a node's min hop is
    * its BFS distance, and distances beyond the bound appear in
    * neither engine).
    */
  /** The g5 frontier loop on an arbitrary directed adjacency (a, b) and a
    * 1-row seed (id) — also driven by PropertySpec on random graphs
    * (every hop-h node must have a hop-(h−1) in-neighbor, and hops must
    * equal a driver BFS's distances).
    */
  private[graft] def bfsHops(
      adj: DataFrame,
      seedIds: DataFrame,
      rounds: Int): DataFrame = {
    val seed = seedIds.select(col("id"), lit(0L).as("hop"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var visitedCount = seed.count()
    var persisted = seed
    var visited = Lineage.truncate(seed)
    var frontier = visited
    var round = 0
    var fSize = visitedCount
    // One materialize action per round: the round's ONLY persisted state is
    // visited ∪ frontier, its count doubles as the frontier-size detector
    // (the sets are disjoint by the anti-join), and the next frontier is a
    // narrow hop==round filter OVER that cache — never a recompute.
    while (round < rounds && fSize > 0) {
      if (Thread.currentThread().isInterrupted)
        throw new InterruptedException("bfs cancelled")
      round += 1
      val next = adj
        .join(frontier.select(col("id").as("a")), Seq("a"), "left_semi")
        .select(col("b").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .select(col("id"), lit(round.toLong).as("hop"))
      val nv = visited.unionAll(next).persist(StorageLevel.MEMORY_AND_DISK)
      val c = nv.count()
      fSize = c - visitedCount
      visitedCount = c
      persisted.unpersist()
      persisted = nv
      visited = Lineage.truncate(nv)
      frontier = visited.filter(col("hop") === round)
    }
    visited
  }

  val g5BfsHops: Q = Q(
    "g5_bfs_hops",
    (s, dir) => {
      // The bucketed adjacency replaces the per-query symmetrize+persist:
      // every round's expansion join scans the materialized table with no
      // Exchange on the edge side.
      val (adj, deg) = coAdjDeg(s, dir)
      val seed = deg.orderBy(desc("d"), col("id")).limit(1).select("id")
      bfsHops(adj, seed, BfsRounds)
        .select(col("id").as("part_id"), col("hop"))
        .orderBy("hop", "part_id")
    },
    Some(s"""WITH RECURSIVE
      co AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (SELECT x.pk AS u, y.pk AS v FROM co x JOIN co y
                ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2 HAVING count(*) >= 2),
      adj AS (SELECT u AS a, v AS b FROM edges
              UNION ALL SELECT v AS a, u AS b FROM edges),
      deg AS (SELECT a AS id, count(*) AS d FROM adj GROUP BY a),
      seed AS (SELECT id FROM deg ORDER BY d DESC, id LIMIT 1),
      bfs(id, hop) AS (
        SELECT id, 0 FROM seed
        UNION
        SELECT e.b, bfs.hop + 1 FROM bfs JOIN adj e ON e.a = bfs.id
        WHERE bfs.hop < $BfsRounds)
      SELECT id AS part_id, CAST(min(hop) AS BIGINT) AS hop
      FROM bfs GROUP BY id ORDER BY hop, part_id""")
  )

  /** G6: link prediction by common-neighbor counting — rank the top-25
    * NON-adjacent part pairs by how many co-purchase neighbors they share
    * (Liben-Nowell & Kleinberg 2003's strongest unsupervised baseline).
    * Recommender pipelines run this on the same graph g1–g5 analyze:
    * a high-CN non-edge is the "customers who bought X also bought Y"
    * candidate before any model training.
    *
    * Scale: wedges come from ONE self equi-join of the adjacency on the
    * center node (u < v cuts each unordered pair to one row), the CN
    * census is map-side combinable, existing edges leave via an anti-join
    * on the canonical (u, v), and the top-25 is TakeOrdered with a total
    * (cn desc, u, v) tie-break. Exact CN counting is inherently
    * Σ C(deg, 2) wedge rows — bounded here by construction (order fanout
    * ≤ 7 lines and the w ≥ 2 threshold kill hub degrees); on an open-
    * degree graph the same plan takes a per-center neighbor cap or the
    * minhash-CN approximation, both documented trade-offs, and AQE's
    * skew split handles residual hot centers.
    */
  val g6LinkPredict: Q = Q(
    "g6_link_predict",
    (s, dir) => {
      // Wedge self-join on the bucketed adjacency: BOTH sides carry the
      // table's hash-partitioning + sort on `a`, so the join plans as a
      // zero-Exchange sort-merge (PlanSpec-asserted).
      val (adj, _) = coAdjDeg(s, dir)
      val edges = adj.filter(col("a") < col("b"))
        .select(col("a").as("u"), col("b").as("v"))
      val wedges = adj.select(col("a"), col("b").as("u"))
        .join(adj.select(col("a"), col("b").as("v")), Seq("a"))
        .filter(col("u") < col("v"))
      wedges.groupBy("u", "v").agg(count(lit(1)).as("cn"))
        .join(edges, Seq("u", "v"), "left_anti")
        .orderBy(desc("cn"), col("u"), col("v"))
        .limit(25)
    },
    Some(s"""WITH $sqlCoEdges,
      adj AS (SELECT u AS a, v AS b FROM edges
              UNION ALL SELECT v AS a, u AS b FROM edges),
      cn AS (SELECT x.b AS u, y.b AS v, CAST(count(*) AS BIGINT) AS cn
             FROM adj x JOIN adj y ON x.a = y.a AND x.b < y.b
             GROUP BY x.b, y.b)
      SELECT c.u, c.v, c.cn FROM cn c
      LEFT JOIN edges e ON e.u = c.u AND e.v = c.v
      WHERE e.u IS NULL
      ORDER BY c.cn DESC, c.u, c.v LIMIT 25""")
  )

  private val PprMass = 1000000000000L
  private val PprIters = 4

  /** G7: personalized PageRank — random walk with restart anchored at the
    * hub part (g5's seed): "importance FROM this node's point of view",
    * the metric recommender and trust pipelines use where global PageRank
    * (g1) answers a different question ("important overall"). Teleport
    * mass returns to the SEED each round instead of spreading uniformly,
    * so rank decays with distance from the hub and the top-50 is the
    * hub's weighted neighborhood.
    *
    * Exactness: g1's integer-mass arithmetic with a seed-concentrated
    * teleport — `(15·M) div 100` at the seed, 0 elsewhere; the oracle
    * unrolls the same 4 rounds. The seed id is a driver value from a
    * 1-row bounded collect (the e10 contract — `limit(1)` by
    * construction).
    *
    * Scale: rounds are fixed and each round's output feeds exactly one
    * consumer, so all 4 rounds chain LAZILY into one job (no per-round
    * barrier — the g1 materialize-cadence lesson taken to its fixed-K
    * conclusion; plan depth is bounded at 4). Edges and degrees come
    * from the shared session memo; each round is one keyed shuffle with
    * map-side partial sums.
    */
  val g7PersonalizedPr: Q = Q(
    "g7_personalized_pagerank",
    (s, dir) => {
      val (adj, deg) = coAdjDeg(s, dir)
      val seed = deg.orderBy(desc("d"), col("id")).limit(1)
        .select("id").collect()(0).getLong(0) // 1-row bounded collect
      val teleport = (15L * PprMass) / 100L
      val nodes = deg.select("id")
      var ranks = nodes.withColumn("r",
        when(col("id") === lit(seed), lit(PprMass)).otherwise(lit(0L)))
      for (_ <- 1 to PprIters) {
        val contrib = ranks.withColumnRenamed("id", "a")
          .join(deg.select(col("id").as("a"), col("d")), Seq("a"))
          .join(adj, Seq("a"))
          .select(col("b").as("id"), expr("r div d").as("q"))
          .groupBy("id").agg(sum(col("q")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (when(col("id") === lit(seed), lit(teleport)).otherwise(lit(0L))
              + expr("(85 * coalesce(s, 0)) div 100")).as("r"))
      }
      ranks.filter(col("r") > 0)
        .orderBy(desc("r"), col("id"))
        .limit(50)
        .select(col("id").as("part_id"), col("r").as("ppr"))
    },
    Some {
      val iters = (1 to PprIters).map { i =>
        s""",
      c$i AS (SELECT e.b AS id, CAST(sum(p.r // d.d) AS BIGINT) AS s
              FROM r${i - 1} p JOIN deg d ON d.id = p.id JOIN adj e ON e.a = p.id
              WHERE p.r > 0 GROUP BY e.b),
      r$i AS (SELECT n.id,
                CASE WHEN n.id = (SELECT id FROM seed) THEN ${(15L * PprMass) / 100L}
                     ELSE 0 END + (85 * coalesce(c.s, 0)) // 100 AS r
              FROM deg n LEFT JOIN c$i c ON c.id = n.id)"""
      }.mkString
      s"""WITH $sqlCoEdges,
      adj AS (SELECT u AS a, v AS b FROM edges
              UNION ALL SELECT v AS a, u AS b FROM edges),
      deg AS (SELECT a AS id, count(*) AS d FROM adj GROUP BY a),
      seed AS (SELECT id FROM deg ORDER BY d DESC, id LIMIT 1),
      r0 AS (SELECT id, CASE WHEN id = (SELECT id FROM seed) THEN $PprMass
                             ELSE 0 END AS r FROM deg)$iters
      SELECT id AS part_id, CAST(r AS BIGINT) AS ppr FROM r$PprIters
      WHERE r > 0 ORDER BY ppr DESC, part_id LIMIT 50"""
    }
  )

  /** G8: modularity scoring of g4's communities — Newman's Q decomposed
    * per community: Q_c = e_c/m − (D_c/2m)², where e_c counts
    * intra-community edges, D_c sums member degrees and m = |edges|. The
    * quality gate every community detector runs on its own output (LPA
    * can collapse to one giant label; a near-zero ΣQ_c is how a pipeline
    * notices before shipping the clustering downstream).
    *
    * Exactness: e_c, D_c, m are exact BIGINT censuses; the contribution
    * is the cross-multiplied identity (4·m·e_c − D_c²)/(4·m²) — one IEEE
    * division of identical integer operands per community row. Headroom:
    * D_c ≤ 2m, so terms stay under 4m² (< 2^63 to m ≈ 2^30 edges).
    *
    * Scale: labels come from the memoized assignment (shared with g4 —
    * the propagation never runs twice per session); e_c is ONE edge scan
    * joined twice against the label table (both keyed equi-joins);
    * the degree join reuses the memoized degree table; everything after
    * is an O(communities) census. m broadcasts as one row.
    */
  val g8Modularity: Q = Q(
    "g8_modularity",
    (s, dir) => {
      val (edges, deg) = coEdgesDeg(s, dir)
      val labels = coLabels(s, dir)
      val mdf = edges.agg(count(lit(1)).as("m"))
      val intra = edges
        .join(labels.select(col("id").as("u"), col("lab").as("cu")), Seq("u"))
        .join(labels.select(col("id").as("v"), col("lab").as("cv")), Seq("v"))
        .filter(col("cu") === col("cv"))
        .groupBy(col("cu").as("community")).agg(count(lit(1)).as("e"))
      labels.join(deg, Seq("id"))
        .groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("d")).as("deg_sum"))
        .join(intra, Seq("community"), "left")
        .crossJoin(broadcast(mdf))
        .select(col("community"), col("n_nodes"), col("deg_sum"),
          coalesce(col("e"), lit(0L)).as("intra_edges"),
          ((lit(4) * col("m") * coalesce(col("e"), lit(0L)) -
            col("deg_sum") * col("deg_sum")).cast("double") /
            (lit(4) * col("m") * col("m"))).as("q_contrib"))
        .orderBy("community")
    },
    Some(s"""WITH ${lpCtes(LpRounds)},
      deg AS (SELECT a AS id, count(*) AS d FROM adj GROUP BY a),
      mm AS (SELECT count(*) AS m FROM edges),
      lab AS (SELECT id, lab FROM l$LpRounds),
      intra AS (SELECT lu.lab AS community, count(*) AS e
                FROM edges ed
                JOIN lab lu ON lu.id = ed.u
                JOIN lab lv ON lv.id = ed.v
                WHERE lu.lab = lv.lab GROUP BY 1),
      degc AS (SELECT l.lab AS community, count(*) AS n_nodes,
                      CAST(sum(d.d) AS BIGINT) AS deg_sum
               FROM lab l JOIN deg d ON d.id = l.id GROUP BY 1)
      SELECT dc.community, dc.n_nodes, dc.deg_sum,
             coalesce(i.e, 0) AS intra_edges,
             CAST(4 * mm.m * coalesce(i.e, 0) - dc.deg_sum * dc.deg_sum AS DOUBLE)
               / (4 * mm.m * mm.m) AS q_contrib
      FROM degc dc LEFT JOIN intra i ON i.community = dc.community
      CROSS JOIN mm ORDER BY dc.community""")
  )

  /** Memoized g4 label assignment shared by g4/g8 (the edge-memo rule:
    * one propagation per session, cleared by [[clearMemo]]).
    */
  private val labelCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def coLabels(s: SparkSession, dir: String): DataFrame =
    labelCache.getOrElseUpdate((s, dir),
      labelAssign(coAdjDeg(s, dir)._1, LpRounds))

  private val HitsMass = 1000000L
  private val HitsRounds = 3

  /** The HITS oracle unrolls the same K mutual-reinforcement rounds the
    * engine runs with identical integer arithmetic: each round rescales by
    * FLOOR-dividing through `max(score) // mass` (clamped to ≥ 1), so no
    * value ever exceeds ~mass·maxdeg and nothing approaches 64-bit range —
    * the overflow-free alternative to multiplying scores UP by the mass
    * (which would hit the long ceiling at in-degrees ≳ 9·10⁶; this form is
    * safe to in-degrees ~9·10¹²). DuckDB's `//` truncates toward zero
    * (verified: -7//2 = -3), exactly like Spark's `div` — the two agree
    * on ALL operands, and here they are non-negative anyway.
    */
  private def hitsOracle(k: Int): String = {
    val rounds = (1 to k).map { i =>
      s""",
      ar$i AS (SELECT p.sk, CAST(sum(h.h) AS BIGINT) AS ar
               FROM pair p JOIN h${i - 1} h ON h.ck = p.ck GROUP BY p.sk),
      a$i AS (SELECT sk, ar // greatest((SELECT max(ar) FROM ar$i) // $HitsMass, 1) AS a
              FROM ar$i),
      hr$i AS (SELECT p.ck, CAST(sum(a.a) AS BIGINT) AS hr
               FROM pair p JOIN a$i a ON a.sk = p.sk GROUP BY p.ck),
      h$i AS (SELECT ck, hr // greatest((SELECT max(hr) FROM hr$i) // $HitsMass, 1) AS h
              FROM hr$i)"""
    }.mkString
    s"""WITH pair AS (SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
             FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      h0 AS (SELECT DISTINCT ck, $HitsMass AS h FROM pair)$rounds
      SELECT sk AS s_suppkey, a AS authority
      FROM a$k ORDER BY authority DESC, s_suppkey LIMIT 20"""
  }

  /** G10: HITS hubs & authorities over the customer→supplier purchase
    * graph — the OTHER classic link-analysis fixed point next to g1's
    * PageRank: a supplier is a good authority when good hub customers buy
    * from it, and a customer is a good hub when it buys from good
    * authorities. On the bipartite purchase graph the two score vectors
    * live on disjoint node sets, so each half-round is one keyed shuffle.
    *
    * Integer-exact normalization: instead of L2-normalizing (float), each
    * half-round floor-divides by `max(score) // mass` (clamped ≥ 1), which
    * keeps every score in [0, ~mass·maxdeg] — deterministic, overflow-free
    * to in-degrees ~9·10¹² (headroom documented on [[hitsOracle]]), and
    * bit-identical across engines and partitionings.
    *
    * Scale: the edge list is computed once, persisted, lineage-truncated,
    * and reused by all 2K half-rounds; each half-round is one
    * map-side-combinable sum keyed on one side's ids plus a broadcast of
    * the 1-row max — never a collect, never a float. Score tables are
    * node-sized, edges are scanned 2K times from cache.
    */
  val g10Hits: Q = Q(
    "g10_hits",
    (s, dir) => {
      // The bipartite pair table comes from the bucketed materialized view
      // (coPair), but the 2K lazy half-rounds each reference their
      // predecessor TWICE (rescale join + broadcast-max subtree), so the
      // pair scan is re-entered ~2^(2K) times unless the duplicated
      // subtrees dedup. With the r7 in-memory pair (persist + lineage
      // truncate → LogicalRDD) ReuseExchange collapsed them; the r8 switch
      // to a raw table scan broke that under AQE and g10 regressed
      // 2.0 → 4.6 s (CPU-bound, eff 4.2). Restore the r7 inner design ON
      // TOP of the view: one cheap pass persists the node-pair table
      // (|E| rows, far smaller than the fact join it replaced), the loop
      // chains lazily against the truncated in-memory scan. Measured r9
      // isolated sf0.1: lazy-over-table 4.6 s, per-half-round persists
      // 5.8 s (12 count barriers, eff 1.5), this form 2.1 s.
      val pairP = coPair(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
      pairP.count()
      val pairT = Lineage.truncate(pairP)

      // Driver-held rescale divisor (e20/e21's iterate pattern — r9
      // verdict #6): each half-round rescales by a ONE-ROW statistic
      // (max(score) div mass, clamped ≥ 1), so the divisor is collected to
      // the driver and inlined as a LITERAL — the rescale becomes a narrow
      // map instead of a crossJoin(broadcast(max)) subtree, and the chain
      // executes as 2K cache-backed jobs (one collect each) instead of one
      // lazy tree whose duplicated predecessor subtrees AQE re-plans per
      // stage. Raw score tables are persisted (each is read by BOTH its
      // max-collect and the next half-round's join) — node-sized cache,
      // released together after the final materialization.
      var hub = pairT.select("ck").distinct().withColumn("h", lit(HitsMass))
      var auth: DataFrame = null
      val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      // max(score) over an EMPTY half-round table is SQL NULL (a filtered-
      // empty or degenerate graph): read it nullable and default the
      // divisor to 1 so the chain degrades to empty results like the old
      // crossJoin(broadcast(max)) form did, instead of NPE-ing the driver.
      def maxOr1(df: DataFrame, c: String): Long =
        Option(df.agg(max(c)).head().getAs[java.lang.Long](0))
          .map(_.longValue).getOrElse(1L)
      var r = 1
      while (r <= HitsRounds) {
        val aRaw = pairT.join(hub, Seq("ck")).groupBy("sk").agg(sum("h").as("ar"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        cached += aRaw
        val aDiv = math.max(maxOr1(aRaw, "ar") / HitsMass, 1L)
        auth = aRaw.select(col("sk"), expr(s"ar div ${aDiv}L").as("a"))
        val hRaw = pairT.join(auth, Seq("sk")).groupBy("ck").agg(sum("a").as("hr"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        cached += hRaw
        val hDiv = math.max(maxOr1(hRaw, "hr") / HitsMass, 1L)
        hub = hRaw.select(col("ck"), expr(s"hr div ${hDiv}L").as("h"))
        r += 1
      }
      // Materialize the final (supplier-sized) score table — the returned
      // plan reads the persisted scores, and a rare cache miss recomputes
      // through the captured physical plan (the g4 end-of-loop discipline).
      val authP = auth.persist(StorageLevel.MEMORY_AND_DISK)
      authP.count()
      cached.foreach(_.unpersist())
      Lineage.truncate(authP)
        .select(col("sk").as("s_suppkey"), col("a").as("authority"))
        .orderBy(desc("authority"), col("s_suppkey"))
        .limit(20)
    },
    Some(hitsOracle(HitsRounds))
  )

  /** G11: local clustering coefficient — g2's per-node triangle census
    * normalized by the node's wedge count: coeff = 2·T(v) / (d(v)·(d(v)−1)),
    * the per-node cliquishness statistic (Watts–Strogatz) a link-graph
    * quality pipeline reads next to the raw triangle counts — a part with
    * high degree but near-zero coefficient is a promiscuous hub (spam
    * signal), high coefficient at moderate degree is a genuine community.
    * Reported in integer permille so the division is the exact
    * `(2000·T) div (d·(d−1))` on BIGINTs in both engines; zero-triangle
    * nodes stay in the output via a left join from the degree table
    * (their absence from the wedge join is data, not a dropped row).
    *
    * Scale: identical to g2 — the wedge join runs on degree-oriented
    * edges (out-degree O(√m) under any skew), and the only addition is a
    * node-sized left join between two map-side-combinable censuses.
    */
  val g11ClusteringCoeff: Q = Q(
    "g11_clustering_coeff",
    (s, dir) => {
      val deg = coAdjDeg(s, dir)._2
      deg.join(triCensus(s, dir), Seq("id"), "left")
        .select(col("id").as("part_id"), col("d").as("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"))
        .withColumn("coeff_pm",
          when(col("degree") >= 2,
            expr("(2000 * n_tri) div (degree * (degree - 1))")).otherwise(0L))
        .orderBy("part_id")
    },
    Some("""WITH co AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      edges AS (SELECT x.pk AS u, y.pk AS v FROM co x JOIN co y
                ON x.ok = y.ok AND x.pk < y.pk GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT id, count(*) AS d FROM (
                SELECT u AS id FROM edges UNION ALL SELECT v FROM edges)
              GROUP BY id),
      r AS (SELECT e.u, e.v, p.d * 4294967296 + e.u AS ru, q.d * 4294967296 + e.v AS rv
            FROM edges e JOIN deg p ON p.id = e.u JOIN deg q ON q.id = e.v),
      o AS (SELECT CASE WHEN ru < rv THEN u ELSE v END AS a,
                   CASE WHEN ru < rv THEN v ELSE u END AS b,
                   CASE WHEN ru < rv THEN rv ELSE ru END AS rb
            FROM r),
      tri AS (SELECT e1.a AS a, e1.b AS b1, e2.b AS b2
              FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.rb < e2.rb
              JOIN o e3 ON e3.a = e1.b AND e3.b = e2.b),
      ntri AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM (
                 SELECT a AS id FROM tri
                 UNION ALL SELECT b1 FROM tri
                 UNION ALL SELECT b2 FROM tri)
               GROUP BY id)
      SELECT deg.id AS part_id, CAST(deg.d AS BIGINT) AS degree,
        coalesce(ntri.n_tri, 0) AS n_tri,
        CASE WHEN deg.d >= 2
             THEN (2000 * coalesce(ntri.n_tri, 0)) // (deg.d * (deg.d - 1))
             ELSE 0 END AS coeff_pm
      FROM deg LEFT JOIN ntri ON ntri.id = deg.id
      ORDER BY part_id""")
  )

  val all: Seq[Q] =
    Seq(g1PageRank, g2TriangleCount, g3KCore, g4LabelProp, g5BfsHops, g6LinkPredict,
      g7PersonalizedPr, g8Modularity, g10Hits, g11ClusteringCoeff)
}
