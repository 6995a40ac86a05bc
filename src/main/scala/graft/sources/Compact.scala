package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for partitioned Parquet stores — the maintenance
  * operator every long-running ingest needs at scale. A streaming upsert
  * like [[graft.streaming.LiveFeed]] adds a file per touched partition per
  * micro-batch; after a day that is thousands of KB-sized files per
  * partition, and at 100 TB the scan's task count (and the namenode's
  * listing cost) is driven by file COUNT, not data size.
  *
  * `compact` rewrites ONLY the partitions whose file population violates
  * the policy (more than `maxFiles` files, or average file size below
  * `minBytes`), each into `ceil(bytes / targetBytes)` files, and publishes
  * them with the same crash-safe aside-swap as the streaming sink: stage
  * to `<dir>.compact-tmp`, move the live partition ASIDE (dot-prefixed, so
  * a crashed swap never surfaces as a bogus partition), promote, drop the
  * aside copy. Healthy partitions are never read, written, or renamed —
  * I/O is O(violating partitions), the property that lets this run as a
  * rolling background job against a live store.
  *
  * The reference has no analogue (one file per symbol by construction,
  * `download_historical_price.py:74-82`); this is the engine-completeness
  * extension that keeps that one-file-per-key invariant once the layout
  * becomes a multi-writer partitioned dataset.
  */
object Compact {

  /** One partition directory's health. */
  case class PartitionStats(dir: String, nFiles: Int, bytes: Long) {
    def violates(maxFiles: Int, minBytes: Long): Boolean =
      nFiles > maxFiles || (nFiles > 1 && bytes / nFiles < minBytes)
  }

  private def dataFiles(fs: FileSystem, dir: Path) =
    fs.listStatus(dir).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith(".") && !n.startsWith("_")
    }

  /** Stats for every leaf `<col>=<value>` partition directory under `dir`
    * (one partition column level, the [[BarStore]]/LiveFeed day layout;
    * nested layouts recurse on the caller's side).
    */
  def partitionStats(spark: SparkSession, dir: String): Seq[PartitionStats] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { p =>
        val files = dataFiles(fs, p.getPath)
        PartitionStats(p.getPath.getName, files.length, files.map(_.getLen).sum)
      }
      .toSeq
  }

  /** Compact the violating partitions of a one-level partitioned store.
    *
    * @return the partition names that were rewritten
    */
  def compact(
      spark: SparkSession,
      dir: String,
      maxFiles: Int = 8,
      minBytes: Long = 8L << 20,
      targetBytes: Long = 128L << 20): Seq[String] = {
    val victims = partitionStats(spark, dir)
      .filter(_.violates(maxFiles, minBytes))
    if (victims.isEmpty) return Seq.empty

    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".compact-tmp")
    fs.delete(tmp, true)
    victims.foreach { v =>
      val nOut = math.max(1L, (v.bytes + targetBytes - 1) / targetBytes).toInt
      spark.read.parquet(s"$dir/${v.dir}")
        .repartition(nOut)
        .write.mode("overwrite").parquet(s"$tmp/${v.dir}")
      AtomicSwap.publish(fs, new Path(tmp, v.dir), new Path(dir, v.dir))
    }
    fs.delete(tmp, true)
    victims.map(_.dir)
  }
}
