package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromDocuments(
    Seq((1L, "hello world"), (2L, ""), (3L, "aaaa"))
      .toDF("doc_id", "text"))

  test("extractFeatures: fixed-dim L1-normalized histograms, batch-shaped") {
    val feats = Multimodal.extractFeatures(media, "media_id", "content")
      .orderBy("media_id").collect()
    assert(feats.length == 3)
    val f1 = feats(0).getSeq[Float](1)
    assert(f1.length == 16)
    assert(math.abs(f1.sum - 1.0) < 1e-5) // normalized
    assert(feats(1).getSeq[Float](1).sum == 0f) // empty payload → zero vector
    // 'aaaa' → all mass in one bin
    assert(feats(2).getSeq[Float](1).max == 1.0f)
  }

  test("decodeStub is deterministic") {
    val b = "payload".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b).toSeq == Multimodal.decodeStub(b).toSeq)
    assert(Multimodal.decodeStub(null).toSeq == Seq.fill(16)(0f))
  }

  test("sampleFrames yields nFrames rows per media with in-range offsets") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 1),
      "media_id", "content", nFrames = 4).collect()
    assert(frames.length == 4)
    val offsets = frames.map(_.getAs[Long]("frame_offset"))
    assert(offsets.forall(o => o >= 0 && o < 11))
    assert(offsets.distinct.length == 4)
  }
}
