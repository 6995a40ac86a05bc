package graft

/** Smoke: every registered query executes at sf0.001 (schema + plan
  * validity); entry returns rows; names and oracle keys are consistent.
  */
class RegistrySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registry names are unique and oracle keys ⊆ query names") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("s4 scheduler boundary: an event exactly at close+1h fires SAME day " +
    "(the reference's strict next < now comparison)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      java.sql.Timestamp.valueOf("2024-03-05 17:00:00"), // exactly at fire
      java.sql.Timestamp.valueOf("2024-03-05 17:00:01"), // one second past
      java.sql.Timestamp.valueOf("2024-03-05 16:59:59")) // just before
      .toDF("ts")
      .withColumn("day_fire", expr("date_trunc('DAY', ts) + INTERVAL '17' HOUR"))
      .withColumn("next_fire",
        when(col("ts") <= col("day_fire"), col("day_fire"))
          .otherwise(expr("day_fire + INTERVAL '1' DAY")))
      .select("next_fire").as[java.sql.Timestamp].collect()
    assert(rows(0) == java.sql.Timestamp.valueOf("2024-03-05 17:00:00"))
    assert(rows(1) == java.sql.Timestamp.valueOf("2024-03-06 17:00:00"))
    assert(rows(2) == java.sql.Timestamp.valueOf("2024-03-05 17:00:00"))
  }
}
