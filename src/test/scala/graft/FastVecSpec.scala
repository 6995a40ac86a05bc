package graft

import graft.functions.{FastVec, Vectors}
import org.apache.spark.sql.functions._

/** The custom codegen expressions must be drop-in replacements: bit-exact
  * vs the builtin zip_with/aggregate formulation, null-correct, and inside
  * WholeStageCodegen (the whole point of tier (b) over a UDF).
  */
class FastVecSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("graft_dot and graft_l2sq are bit-identical to the builtin fold on real embeddings") {
    import spark.implicits._
    FastVec.register(spark)
    val emb = Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), Vectors.toDoubleVec(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      (FastVec.dot(col("v"), col("qv")) === Vectors.dot(col("v"), col("qv"))).as("dot_eq"),
      (FastVec.l2sq(col("v"), col("qv")) === Vectors.l2sq(col("v"), col("qv"))).as("l2_eq"))
    val bad = both.filter(!col("dot_eq") || !col("l2_eq")).count()
    assert(bad == 0, s"$bad rows diverge from the builtin formulation")
  }

  test("null and edge-case semantics") {
    import spark.implicits._
    FastVec.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))), // 11.0
      (None, Some(Seq(1.0))), // null
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])), // 0.0
      (Some(Seq(2.0, 5.0, 9.0)), Some(Seq(3.0))) // common prefix: 6.0
    ).toDF("a", "b")
    val out = df.select(FastVec.dot(col("a"), col("b"))).as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(11.0), None, Some(0.0), Some(6.0)))
  }

  test("graft_ldot matches the builtin integer fold (m8's DCT coefficient shape)") {
    import spark.implicits._
    FastVec.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(64)(
      (Seq.fill(64)(rnd.nextInt(256).toLong),
        Seq.fill(64)(rnd.nextLong() % 32768)))
    val df = rows.toDF("p", "w")
    val both = df.select(
      (FastVec.ldot(col("p"), col("w")) ===
        aggregate(zip_with(col("p"), col("w"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x)).as("eq"))
    assert(both.filter(!col("eq")).count() == 0)
    // null / empty / prefix semantics mirror graft_dot
    val edge = Seq(
      (Some(Seq(2L, 3L)), Some(Seq(5L, 7L))), // 31
      (None, Some(Seq(1L))), // null
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])), // 0
      (Some(Seq(2L, 5L)), Some(Seq(3L))) // common prefix: 6
    ).toDF("a", "b")
    val out = edge.select(FastVec.ldot(col("a"), col("b")))
      .as[Option[Long]].collect().toSeq
    assert(out == Seq(Some(31L), None, Some(0L), Some(6L)))
  }

  test("fused expressions run inside WholeStageCodegen, not as UDFs") {
    FastVec.register(spark)
    val emb = Tables.table(spark, sf, "embeddings")
      .select(Vectors.toDoubleVec(col("embedding")).as("v"))
    val df = emb.select(sum(FastVec.dot(col("v"), col("v"))).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan.take(2000))
    assert(plan.contains("*("), "not inside WholeStageCodegen: " + plan.take(2000))
    assert(!plan.contains("ScalaUDF"))
  }

  test("SparkSessionExtensions injection path registers the same functions") {
    // simulate what .config("spark.sql.extensions", ...) does at build time
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions()(ext)
    // runtime registry already carries them (idempotent); SQL resolution works
    FastVec.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(r == 11.0)
  }
}
