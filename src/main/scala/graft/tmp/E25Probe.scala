package graft.tmp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{FastVec, Vectors}

/** Throwaway r13 probe: per-phase walls of e25's pipeline (kept in sync
  * with SimilarityQueries.balancedCells/balancedPairs). Not registered.
  */
object E25Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id * 2)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[e25probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    FastVec.register(spark)
    val emb = graft.Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), Vectors.toDoubleVec(col("embedding")).as("v"))
    val n = t("emb.count")(emb.count())
    val nC = math.max(8, math.ceil(math.sqrt(n.toDouble)).toInt)
    val A = graft.queries.SimilarityQueries.e25AssignTop
    val cap = 2L * math.ceil(A * n.toDouble / nC).toLong
    val cent = emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nC).select(col("vec_id").as("cid"), col("v").as("cv"))
    val centArr = cent.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))
    val a1 = emb.crossJoin(broadcast(centArr))
      .select(col("vec_id"),
        posexplode(slice(array_sort(transform(col("cents"), c =>
          struct(FastVec.l2sq(col("v"), c("cv")).as("d2"), c("cid").as("cid")))),
          1, A)))
      .select(col("vec_id"), col("col.cid").as("cid"),
        (col("pos") + 1).cast("int").as("arank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBig = t("census (materializes a1)")(
      a1.groupBy("cid").agg(count(lit(1)).as("sz")).filter(col("sz") > cap).count())
    System.err.println("  big cells: " + nBig)
    val fin = a1.select(col("vec_id"), col("cid"), lit(-1L).as("scid"), col("arank"))
    val idx = fin.filter(col("arank") === 1)
      .select(col("vec_id").as("ia"), col("cid"), col("scid"))
    val probe = fin.select(col("vec_id").as("ib"), col("cid"), col("scid"))
    val raw = idx.join(probe, Seq("cid", "scid"))
      .filter(col("ia") =!= col("ib"))
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("cid"), col("scid"))
    t("raw cand count")(System.err.println("  raw cands: " + raw.count()))
    val cand = raw.groupBy("a", "b")
      .agg(min(struct(col("cid"), col("scid"))).as("cs"))
      .select(col("a"), col("b"), col("cs.cid").as("cid"), col("cs.scid").as("scid"))
    t("dedup cand noop")(cand.write.format("noop").mode("overwrite").save())
    val embN = emb.select(col("vec_id"), col("v"), FastVec.norm(col("v")).as("nv"))
    val out = cand
      .join(embN.select(col("vec_id").as("a"), col("v").as("va"), col("nv").as("na")), Seq("a"))
      .join(embN.select(col("vec_id").as("b"), col("v").as("vb"), col("nv").as("nb")), Seq("b"))
      .select(col("a"), col("b"), col("cid"), col("scid"),
        FastVec.cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .orderBy(col("sim").desc, col("a"), col("b"))
      .limit(20)
    t("full top20")(out.collect())
    t("full top20 again")(out.collect())
    spark.stop()
  }
}
