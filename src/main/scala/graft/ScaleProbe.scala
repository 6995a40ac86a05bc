package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-linearity probe for the dedup pipeline: inflate `documents` by
  * unioning token-SALTED copies (every token gets a per-copy suffix, so
  * shingle spaces are disjoint across copies — the duplicate structure of
  * each copy is preserved instead of creating a pathological all-dup
  * corpus) and time the full MinHash-LSH near-dup pipeline at growing
  * factors. A subquadratic pipeline must scale ~linearly in the factor;
  * an all-pairs formulation would scale quadratically and show up
  * immediately at factor 8.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ScaleProbe"
  *
  * Results are recorded in SURVEY.md §6. This is a measurement harness,
  * not a registry query: the inflated table is derived on the fly purely
  * for timing, never written, never used as oracle input.
  */
object ScaleProbe {

  def inflate(docs: DataFrame, factor: Int): DataFrame = {
    val salted = (0 until factor).map { k =>
      docs.select(
        (col("doc_id") * factor + k).as("doc_id"),
        // suffix every token: "a b c" -> "a_k b_k c_k" (regex on the
        // token boundary; keeps per-copy shingle structure, disjoint
        // across copies)
        regexp_replace(concat(col("text"), lit(" ")), lit(" "), lit(s"_$k "))
          .as("text"))
    }
    salted.reduce(_.unionByName(_))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id * 2)").collect() // JIT warmup
    val docs = Tables.table(spark, sfDir, "documents").select("doc_id", "text")
    docs.persist(); docs.count()
    Seq(1, 2, 4, 8).foreach { f =>
      val inflated = inflate(docs, f)
      // min of 2 runs from a clean slate (host parallelism varies)
      val times = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        docs.persist(); docs.count()
        val t0 = System.nanoTime()
        val pairs = graft.operators.MinHashLSH
          .nearDupPairs(inflated, "doc_id", "text",
            shingleN = 3, numHashes = 8, bands = 4, threshold = 0.3)
          .count()
        (System.nanoTime() - t0) / 1e9 -> pairs
      }
      val (best, pairs) = times.minBy(_._1)
      println(f"[scale] factor=$f%2d docs=${docs.count() * f}%7d pairs=$pairs%7d time=$best%7.2f s")
    }
    spark.stop()
  }
}
