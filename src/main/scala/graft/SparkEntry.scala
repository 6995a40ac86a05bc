package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import graft.queries.{Aggregates, AnalyticsExtras, DedupQueries, GraphQueries, Joins, MiscQueries, MixtureQueries, PipelineExtras, Relational, SimilarityQueries, TextAnalysis, TimeSeries, TrainPipeline, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries`/`oracleSql` are insertion-ordered (ListMap) so Verify output and
  * bench JSON are stable run-to-run (SURVEY §7.3.6).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** Full registry: one `Q` per implemented operator from SURVEY.md §2. */
  lazy val registry: Seq[Q] =
    Relational.all ++ Joins.all ++ Aggregates.all ++ WindowQueries.all ++
      TextAnalysis.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      MiscQueries.all ++ AnalyticsExtras.all ++ PipelineExtras.all ++
      TrainPipeline.all ++ MixtureQueries.all ++ GraphQueries.all ++ TimeSeries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(registry.map(q => q.name -> q.fn): _*)

  /** DuckDB-runnable ANSI SQL per query; omitted entries get the driver's
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    ListMap(registry.flatMap(q => q.oracle.map(o => q.name -> o)): _*)
}
