package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, partition-batched decode, feature
  * extraction into the similarity operators, frame explode. The codec
  * itself is the deterministic [[Multimodal.StubDecoder]]. */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = {
    val rows = java.util.Arrays.asList(
      Row("img1", "image", "fake-jpeg-bytes-1".getBytes, Map("src" -> "a")),
      Row("img2", "image", "fake-jpeg-bytes-2".getBytes, Map("src" -> "b")),
      Row("bad", "image", Array.empty[Byte], Map.empty[String, String]),
      Row("vid1", "video", "fake-mp4-bytes-##".getBytes, Map.empty[String, String]))
    spark.createDataFrame(rows, Multimodal.MediaSchema)
  }

  test("decodeImages: typed dims for good bytes, ok=false for bad") {
    val out = Multimodal.decodeImages(media, Multimodal.StubDecoder)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("img1").getBoolean(4))
    assert(out("img1").getInt(1) >= 64 && out("img1").getInt(3) === 3)
    assert(!out("bad").getBoolean(4))
    assert(out("bad").isNullAt(1))
  }

  test("decode is deterministic per content (idempotent re-runs)") {
    val a = Multimodal.decodeImages(media, Multimodal.StubDecoder)
      .collect().map(_.toSeq).toSet
    val b = Multimodal.decodeImages(media, Multimodal.StubDecoder)
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("extractFeatures feeds similarity search end-to-end") {
    val feats = Multimodal.extractFeatures(media, Multimodal.StubDecoder, 8)
    assert(feats.head().getSeq[Float](1).length === 8)
    val knn = SimilaritySearch.bruteForceTopK(
      feats.limit(1), "media_id", feats, "media_id", "features", k = 2)
    assert(knn.count() === 2)
  }

  test("sampleFrames explodes videos only, n rows each") {
    val frames = Multimodal.sampleFrames(media, Multimodal.StubDecoder, 5)
      .collect()
    assert(frames.length === 5)
    assert(frames.forall(_.getString(0) === "vid1"))
    assert(frames.map(_.getInt(1)).sorted.toSeq === (0 until 5))
  }

  test("bucketize spreads rows across requested partitions") {
    val out = Multimodal.bucketize(media, 3)
    assert(out.rdd.getNumPartitions === 3)
    assert(out.count() === 4)
  }
}
