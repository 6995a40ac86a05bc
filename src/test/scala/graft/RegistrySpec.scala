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
}
