package graft

import org.apache.spark.sql.functions._

/** x28's chunk geometry, proven on the corpus: spans tile each document
  * exactly (full coverage, fixed stride, fixed overlap except the short
  * tail), and every chunk's text is the tokens its span claims.
  */
class ChunkingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("chunks cover [0, n) per doc with stride 24, overlap 8, short tail " +
    "allowed, and chunk_text matches the claimed token span") {
    val docs = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = SparkEntry.queries("x28_chunking")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (docId, rows) =>
      val toks = docs(docId)
      val sorted = rows.sortBy(_._2)
      // ids are dense from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case ((_, cid, s0, e0, text), i) =>
        assert(cid == i.toLong)
        assert(s0 == i.toLong * 24)
        assert(e0 == math.min(s0 + 32, toks.length.toLong))
        assert(text == toks.slice(s0.toInt, e0.toInt).mkString(" "),
          s"doc $docId chunk $cid text mismatch")
      }
      // the last chunk reaches the end of the doc: full coverage
      assert(sorted.last._4 == toks.length.toLong, s"doc $docId truncated")
      // no spurious extra chunk: the second-to-last (if any) must not
      // already cover the tail
      if (sorted.length > 1)
        assert(sorted(sorted.length - 2)._4 < toks.length.toLong,
          s"doc $docId has a redundant trailing chunk")
    }
    assert(chunks.exists(c => c._4 - c._3 < 32), "corpus must exercise a short tail")
  }
}
