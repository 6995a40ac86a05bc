package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Write-once BUCKETED materialized views for shared derivations — the
  * generalization of the r7 g-family fix (co-purchase adjacency/degrees,
  * bipartite pairs) now also carrying the dedup family's verified-pair and
  * cluster-label tables.
  *
  * The problem it solves: several registry queries consume one expensive
  * derivation (the MinHash-LSH verified near-dup pairs, the co-purchase
  * edge set). An in-memory memo shares it per session, but every ISOLATED
  * measurement (bench hygiene clears memos + cache between queries, as a
  * fresh cluster job would) rebuilt the whole pipeline per query — d5 paid
  * d3's full LSH rebuild (14.9 s in the r7 driver artifact). On a cluster
  * the answer is a warehouse table: pay the derivation + shuffle ONCE at
  * write time, bucketed+sorted on the downstream join/group key so every
  * consumer plans bucket-local reads with NO Exchange (PlanSpec-asserted).
  * This object is that warehouse table, scoped to /tmp for the sandbox.
  *
  * Semantics are unchanged — the table IS the derivation's output; only
  * the physical pass is shared. `clearMemo` (bench hygiene) drops the RAM
  * handles; the on-disk table intentionally survives, exactly like a
  * warehouse table would between cluster jobs.
  *
  * Paths are (JVM, session)-scoped: the per-JVM random root keeps a fresh
  * run from ever reading a stale corpus, and the per-SESSION subdirectory
  * keeps a second SparkSession in the same JVM (whose own catalog reports
  * tableExists = false) from SaveMode.Overwrite-deleting parquet files a
  * prior session's live plans may still reference — it rebuilds under its
  * own subdir instead (r7 advice).
  */
object MatView {

  private val memo = TrieMap.empty[(SparkSession, String), DataFrame]

  /** table → one-time build seconds, accumulated across sessions; dumped
    * into the bench artifact so view-backed timings stay self-describing
    * (the min-of-2 clean-slate protocol otherwise reports only the
    * warm-table read and the build cost would vanish from the JSON).
    */
  private val buildLog = TrieMap.empty[String, Double]

  private val buildLock = new Object

  /** Tables resolved since the last [[drainTouched]] — lets the bench tag
    * each measurement as view-backed (r7 advice: min-of-2 under the
    * clean-slate protocol reports warm-table time, so the artifact must
    * say which timings lean on a materialized view).
    */
  private val touched = TrieMap.empty[String, Unit]

  /** The view tables resolved since the last call, then reset. */
  def drainTouched(): Set[String] = {
    val t = touched.keySet.toSet
    t.foreach(touched.remove)
    t
  }

  /** One root per JVM; deleted on exit so repeated bench/test runs don't
    * accumulate abandoned table directories in /tmp.
    */
  private lazy val root = {
    val r = s"/tmp/graft-mv-${java.util.UUID.randomUUID().toString.take(8)}"
    sys.addShutdownHook {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r))
    }
    r
  }

  /** Unique per-session path component. identityHashCode is NOT unique
    * (two sessions in one JVM can collide, re-enabling the Overwrite
    * clobber hazard the subdirectory exists to prevent) — assign each
    * session a monotonic id on first sight instead; the map is weak-keyed
    * so closed sessions don't pin.
    */
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Integer]())
  private val nextSessionId = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sessionTag(s: SparkSession): String =
    s"s${sessionIds.computeIfAbsent(s, _ => nextSessionId.getAndIncrement())}"

  /** The memoized bucketed table `table`, built from `build` exactly once
    * per (session, table) — later calls (and later SESSIONS sharing the
    * catalog) read the existing table. `key`/`buckets` fix the bucket
    * layout; consumers joining or grouping on `key` plan with no Exchange.
    */
  def of(s: SparkSession, table: String, key: String, buckets: Int)(
      build: => DataFrame): DataFrame = {
    touched.put(table, ())
    memo.getOrElseUpdate((s, table), buildLock.synchronized {
      if (!s.catalog.tableExists(table)) {
        val t0 = System.nanoTime()
        Bucketed.write(build, table, key, buckets,
          Some(s"$root/${sessionTag(s)}/$table"))
        buildLog.put(table,
          buildLog.getOrElse(table, 0.0) + (System.nanoTime() - t0) / 1e9)
      }
      s.table(table)
    })
  }

  /** Drop the in-memory handles (bench hygiene). Tables stay on disk. */
  def clearMemo(): Unit = memo.clear()

  /** One-time build cost per table (seconds), for artifact self-description. */
  def buildCosts: Map[String, Double] = buildLog.toMap

  /** table → (refresh count, appended rows, total refresh seconds) — the
    * staleness contract in e26's style: a consumer can read how far the
    * view has drifted from its base build and decide when to compact.
    */
  private val refreshLog = TrieMap.empty[String, (Long, Long, Double)]

  def refreshCosts: Map[String, (Long, Long, Double)] = refreshLog.toMap

  /** APPEND-DELTA refresh of an existing bucketed view (r9 verdict #4):
    * the corpus-refresh world d7/d8/CorpusIngest model grows by a batch,
    * and the batch's derived rows (shingles, window fingerprints, pairs
    * involving new docs) are appended WITHOUT rebuilding the view —
    * refresh cost is O(delta), not O(corpus). Spark appends to a bucketed
    * table by hashing only the delta into the SAME bucket layout (bucket
    * spec must match — `require`d here): each bucket accumulates one more
    * file, reads stay bucket-local with no Exchange, and within-bucket
    * ordering degrades from globally-sorted to per-file-sorted, which
    * bucketed SortMergeJoin handles with a (cheap, bucket-local) sort and
    * zero shuffle. Deltas must be DISJOINT from existing rows by
    * construction (the d7 admission contract: only rows derived from
    * newly-admitted keys are appended) — the view stays exactly equal to
    * a from-scratch build over the grown corpus, a parity
    * MatViewRefreshSpec asserts. Call through [[of]] first so the base
    * table exists; the refresh is logged to [[refreshCosts]] (count,
    * rows, seconds) — the artifact-visible staleness contract.
    */
  def append(s: SparkSession, table: String, key: String, buckets: Int)(
      delta: DataFrame): Unit = buildLock.synchronized {
    require(s.catalog.tableExists(table),
      s"append-refresh target $table does not exist — build it with of() first")
    val t0 = System.nanoTime()
    // Persist before count+write: the staleness-log count and the bucketed
    // write otherwise each execute the full delta plan, so the logged
    // refresh seconds (the numerator of the O(delta) claim) would include
    // a redundant recomputation of the delta derivation.
    val deltaP = delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = deltaP.count()
    deltaP.write
      .format("parquet")
      .mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
    deltaP.unpersist()
    val (c, r, sec) = refreshLog.getOrElse(table, (0L, 0L, 0.0))
    refreshLog.put(table,
      (c + 1, r + n, sec + (System.nanoTime() - t0) / 1e9))
    // Cached plans hold the table's file listing at resolve time; drop the
    // handle so the next consumer re-resolves and sees the appended files.
    memo.remove((s, table))
    s.catalog.refreshTable(table)
  }
}
