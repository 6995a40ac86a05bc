package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeAll extracts deterministic typed features per partition") {
    val recs = Seq(
      MediaRecord(1L, "image", "hello world".getBytes("UTF-8")),
      MediaRecord(2L, "audio", "abc".getBytes("UTF-8")),
      MediaRecord(3L, "image", Array.emptyByteArray)
    ).toDS().repartition(2)
    val out = Multimodal.decodeAll(recs).collect().map(f => f.id -> f).toMap
    assert(out(1L).n_bytes == 11L)
    assert(out(1L).channels == 3)
    assert(out(2L).channels == 1)
    assert(out(3L).n_bytes == 0L && out(3L).mean_intensity == 0.0)
    // deterministic: same input → same features regardless of partitioning
    val again = Multimodal.decodeAll(recs.repartition(3)).collect().map(f => f.id -> f).toMap
    assert(out == again)
  }

  test("fromDocuments builds the typed media frame from the corpus") {
    val docs = Seq((0L, "some text"), (1L, "other text"))
      .toDF("doc_id", "text")
    val recs = Multimodal.fromDocuments(spark, docs).collect().map(r => r.id -> r).toMap
    assert(recs(0L).kind == "image" && recs(1L).kind == "audio")
    assert(new String(recs(0L).media, "UTF-8") == "some text")
  }
}
