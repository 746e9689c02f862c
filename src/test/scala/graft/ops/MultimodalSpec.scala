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

  test("resizeFeatures pools adjacent bins, preserving total mass") {
    val feats = Multimodal.extractFeatures(media, "media_id", "content")
    val resized = Multimodal.resizeFeatures(feats, "features", 4)
      .orderBy("media_id").collect()
    val full = feats.orderBy("media_id").collect()
    resized.zip(full).foreach { case (r, f) =>
      val small = r.getSeq[Float](r.fieldIndex("features_resized"))
      val big = f.getSeq[Float](f.fieldIndex("features"))
      assert(small.length == 4)
      assert(math.abs(small.sum - big.sum) < 1e-5) // mass preserved
      // each output bin is the sum of its 4 source bins
      assert(math.abs(small.head - big.take(4).sum) < 1e-6)
    }
  }

  test("resizeFeatures on non-divisible sizes: last bin absorbs the remainder") {
    val df = Seq(Tuple1((1 to 10).map(_.toFloat))).toDF("features")
    val out = Multimodal.resizeFeatures(df, "features", 4)
      .select("features_resized").head().getSeq[Float](0)
    // width 2, last bin takes 4 elements: [1+2, 3+4, 5+6, 7+8+9+10]
    assert(out == Seq(3f, 7f, 11f, 34f))
    assert(out.sum == (1 to 10).sum.toFloat) // no element dropped
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
