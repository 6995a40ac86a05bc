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

  test("bench headline names ⊆ registry (a typo would zero a bench column)") {
    val names = SparkEntry.queries.keySet
    val stray = Bench.headline.filterNot(names)
    assert(stray.isEmpty, s"headline names not in registry: $stray")
  }

  test("PLANS.md selection rule: every PlanSpec-asserted registry query is " +
    "annotated in graft.Plans (a reviewer can resolve any name to either " +
    "a ran-plan or the explicit exclusion rule)") {
    // The rule lives in Plans' scaladoc; this assert makes it mechanical:
    // scrape the PlanSpec SOURCE for the query names it asserts plan
    // properties on, and require each to carry a PLANS.md annotation.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/test/scala/graft/PlanSpec.scala")), "UTF-8")
    val asserted =
      ("""executedPlan\("([a-z0-9_]+)"\)""".r.findAllMatchIn(src).map(_.group(1)) ++
        """queries\("([a-z0-9_]+)"\)""".r.findAllMatchIn(src).map(_.group(1))).toSet
    assert(asserted.size > 100, s"PlanSpec scrape looks broken: $asserted")
    val annotated = Plans.annotated.map(_._1).toSet
    val missing = (asserted -- annotated).toSeq.sorted
    assert(missing.isEmpty,
      s"PlanSpec asserts plan properties for unannotated queries " +
        s"(add them to Plans.annotated and regenerate PLANS.md): $missing")
    // and every annotation must resolve to a real registry query
    val stray = (annotated -- SparkEntry.queries.keySet).toSeq.sorted
    assert(stray.isEmpty, s"annotations for unknown queries: $stray")
  }

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("s4 scheduler boundary: an event exactly at close+1h fires SAME day " +
    "(the reference's strict next < now comparison) — via the shipped query") {
    import spark.implicits._
    // drive the REAL registry query on a synthetic events table so a change
    // to s4ScheduleFire's comparison cannot slip past this test
    val dir = java.nio.file.Files.createTempDirectory("s4spec").toString
    // Tables.table("events") expects the driver file's shape: epoch-NANO
    // long ts (the TIMESTAMP(NANOS) repair path) and the full column set.
    def nanos(s: String) = java.sql.Timestamp.valueOf(s).getTime * 1000000L
    Seq(
      (1L, nanos("2024-03-05 17:00:00"), 1L, "click", 1.0, "{}"), // exactly at fire
      (2L, nanos("2024-03-05 17:00:01"), 1L, "click", 1.0, "{}"), // one second past
      (3L, nanos("2024-03-05 16:59:59"), 1L, "click", 1.0, "{}")) // just before
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.WindowQueries.s4ScheduleFire.fn(spark, dir)
      .select("next_fire", "n_events")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(out == Map(
      java.sql.Timestamp.valueOf("2024-03-05 17:00:00") -> 2L, // ids 1 and 3
      java.sql.Timestamp.valueOf("2024-03-06 17:00:00") -> 1L)) // id 2
  }
}
