package graft

import org.apache.spark.sql.functions._

/** The DataSourceV2 feed connector honors the reference's ingestion
  * contract: batch partitioning, declared schema, deterministic payloads,
  * and pushed-down column pruning.
  */
class BarFeedSpec extends SparkSpec {

  private val syms = (1 to 25).map(i => s"S$i").mkString(",")

  private def feed(extra: (String, String)*) = {
    val r = spark.read.format("graft.sources.BarFeedProvider")
      .option("symbols", syms).option("days", 3)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("one input partition per fetch batch (dhp:322-335 batching)") {
    assert(feed("batchSize" -> "10").rdd.getNumPartitions == 3) // ceil(25/10)
    assert(feed("batchSize" -> "25").rdd.getNumPartitions == 1)
  }

  test("declared canonical bar schema, no inference") {
    val df = feed()
    assert(df.columns.toSeq ==
      Seq("symbol", "ts", "open", "high", "low", "adj_close", "volume"))
    assert(df.schema("ts").dataType.typeName == "timestamp")
  }

  test("deterministic payloads: re-read is identical, rows = symbols x days") {
    val a = feed().orderBy("symbol", "ts").collect().toSeq
    val b = feed().orderBy("symbol", "ts").collect().toSeq
    assert(a == b)
    assert(a.size == 25 * 3)
    val hi = feed().filter(col("high") < col("low")).count()
    assert(hi == 0)
  }

  test("column pruning reaches the reader (SupportsPushDownRequiredColumns)") {
    val pruned = feed().select("symbol")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("symbol"))
    assert(pruned.distinct().count() == 25)
  }

  test("throttle applies per fetch batch") {
    val t0 = System.nanoTime()
    feed("batchSize" -> "5", "throttleMs" -> "200").count() // 5 partitions
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms >= 200.0, s"expected at least one 200ms throttle, took $ms ms")
  }
}
