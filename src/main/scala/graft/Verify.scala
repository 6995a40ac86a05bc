package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); see graft.Tables.table
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Same small-shuffle hygiene as graft.Bench (see its scaladoc):
      // one sort-shuffle file per map task, AQE coalesce of tiny
      // exchanges, scratch dirs on tmpfs (root fs mounts ext4+discard;
      // cleaner delete bursts stall the virtio device).
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      // ContextCleaner is GC-driven; reclaim dereferenced shuffle files
      // during the full-registry session (see Bench's scaladoc).
      .config("spark.cleaner.periodicGC.interval", "5min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (comma-separated names); the driver never sets
    // it, so the full registry always runs in the real gate.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Per-query engine dtype manifest (column → Spark simpleString), written
    // alongside the parquet: lets oracle/engine type drift (e.g. DuckDB
    // HUGEINT→float64 vs Spark bigint, the r4 failure class) be diffed
    // from artifacts alone, without running DuckDB.
    val dtypes = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(String, String)]]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        dtypes(name) = df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Cache hygiene between queries (Bench's clean-slate discipline):
      // per-query persists whose consumers live INSIDE the returned plan
      // (d17's docs projection, e22's proj, c15's census, …) are done once
      // the parquet write above materialized the result, but nothing
      // unpersists them — over the full-registry session the
      // MEMORY_AND_DISK entries accumulate and evict each other. Memos are
      // cleared together with the cache so no memoized plan silently
      // recomputes through a dropped persist.
      graft.queries.DedupQueries.clearMemo()
      graft.queries.GraphQueries.clearMemo()
      graft.queries.SimilarityQueries.clearPcaMemo()
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // SF-parametric oracles: a query whose DuckDB mirror must name a
    // filesystem path literally (o4's read_blob — DuckDB table functions
    // take literal paths, not views) carries the __GRAFT_SF_DIR__
    // placeholder, substituted here with the corpus dir THIS dump ran
    // against — so the oracle always inspects the same corpus as the
    // engine, at every scale factor.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GRAFT_SF_DIR__", sfDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val dtypeJson = dtypes
      .map { case (name, cols) =>
        s"${q(name)}: ${cols.map { case (c, t) => s"${q(c)}: ${q(t)}" }.mkString("{", ",", "}")}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/dtypes.json"), dtypeJson)
    spark.stop()
  }
}
