package graft

import graft.queries.SimilarityQueries

/** r12 verdict #7: under the e9 4-thread leg pool, two legs requesting
  * the same ADC key used to race TrieMap.getOrElseUpdate — both ran
  * `pqAdcBuild` and the losing thread's persisted table leaked until
  * clearAdcMemo. The memo now stores one-shot lazy cells: racing callers
  * must observe exactly ONE build and the SAME DataFrame instance.
  */
class AdcCellSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("two concurrent pqAdcDists calls on one key run one build " +
    "and share the result") {
    SimilarityQueries.clearAdcMemo()
    val before = SimilarityQueries.adcBuilds.get()
    val results =
      new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 2).map { _ =>
      val t = new Thread(() => {
        start.await()
        results.add(SimilarityQueries.pqAdcDists(spark, sf, normalize = true))
      })
      t.start(); t
    }
    start.countDown()
    threads.foreach(_.join(120000))
    assert(results.size == 2, "both callers must return")
    assert(SimilarityQueries.adcBuilds.get() - before == 1,
      "exactly one pqAdcBuild must run for one key under concurrent callers")
    val Seq(a, b) = results.toArray(Array.empty[org.apache.spark.sql.DataFrame]).toSeq
    assert(a eq b, "both callers must receive the memoized instance")
    SimilarityQueries.clearAdcMemo()
  }
}
