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

  /** Best-effort alias extraction from an oracle's OUTERMOST select list
    * (r8 verdict #8: the recurring gate-trip cause is a Spark/oracle
    * column-name mismatch, which the driver only catches AFTER a commit).
    * Scans at paren depth 0 outside string literals, takes the LAST
    * top-level SELECT, splits its list on top-level commas, and reads
    * each item's `AS alias` (or the bare/dotted identifier). Returns None
    * when any item is an unaliased expression or `*` — those few oracles
    * are exempt (house style is to alias every computed column anyway).
    */
  private def oracleCols(sql: String): Option[Seq[String]] = {
    val s = sql
    // depth/quote-aware scan: record top-level keyword positions
    var depth = 0; var inStr = false; var i = 0
    var lastSelect = -1
    val fromAfter = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def wordAt(p: Int, w: String): Boolean =
      s.regionMatches(true, p, w, 0, w.length) &&
        (p == 0 || !s(p - 1).isLetterOrDigit && s(p - 1) != '_') &&
        (p + w.length >= s.length ||
          !s(p + w.length).isLetterOrDigit && s(p + w.length) != '_')
    while (i < s.length) {
      val c = s(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0) {
            if (wordAt(i, "select")) lastSelect = i
            else if (wordAt(i, "from")) fromAfter += ((i, lastSelect))
          }
      }
      i += 1
    }
    if (lastSelect < 0) return None
    val fromPos = fromAfter.collectFirst {
      case (f, sel) if sel == lastSelect && f > lastSelect => f
    }.getOrElse(return None)
    var list = s.substring(lastSelect + "select".length, fromPos).trim
    if (list.toLowerCase.startsWith("distinct "))
      list = list.substring("distinct ".length)
    // split on top-level commas
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    var d = 0; var q0 = false; var start = 0
    for (j <- list.indices) list(j) match {
      case '\'' => q0 = !q0
      case '(' if !q0 => d += 1
      case ')' if !q0 => d -= 1
      case ',' if !q0 && d == 0 =>
        items += list.substring(start, j).trim; start = j + 1
      case _ =>
    }
    items += list.substring(start).trim
    val ident = "[A-Za-z_][A-Za-z0-9_]*"
    val asRe = s"""(?is).*\\bas\\s+($ident)\\s*$$""".r
    val bareRe = s"""(?s)^\\s*(?:$ident\\.)?($ident)\\s*$$""".r
    val cols = items.map {
      case asRe(a) => a.toLowerCase
      case bareRe(c) => c.toLowerCase
      case _ => return None
    }
    Some(cols.toSeq)
  }

  test("every oracle's outermost select list matches the Spark columns " +
    "(name AND order) — the gate's schema compare, run before any commit") {
    val unparsed = scala.collection.mutable.ArrayBuffer.empty[String]
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.registry.foreach { q =>
      SparkEntry.oracleSql.get(q.name).foreach { sql =>
        oracleCols(sql) match {
          case None => unparsed += q.name
          case Some(cols) =>
            val sparkCols = q.fn(spark, sf).columns.toSeq.map(_.toLowerCase)
            if (cols != sparkCols)
              bad += s"${q.name}: oracle=$cols spark=$sparkCols"
        }
      }
    }
    assert(bad.isEmpty, s"oracle/Spark column mismatches:\n${bad.mkString("\n")}")
    // the parser must keep covering ~the whole registry — a style drift
    // that silently exempted new queries would hollow the assert out
    assert(unparsed.size <= 12,
      s"too many unparseable oracle select lists: $unparsed")
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
