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

  // ---- real-container video-frame dedup (r6) ----------------------

  /** Textured deterministic PNG frame: per-pixel pseudo-random
    * brightness keyed by the frame seed, so distinct frames get
    * far-apart dHashes (a solid color hashes to 0 and everything
    * would collide). */
  private def frame(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) {
      val v = ((x * 73 + y * 151 + seed * 997) * 0x9E3779B1) >>> 24
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII"))
      (0 until 4).foreach(i => b.write((payload.length >> (8 * i)) & 0xff))
      b.write(payload)
      if (payload.length % 2 == 1) b.write(0)
      b.toByteArray
    }
    def list(kind: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ children)
    val avih = new Array[Byte](56)
    def put32(o: Int, v: Int): Unit =
      (0 until 4).foreach(i => avih(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    put32(0, 33333); put32(16, frames.length); put32(32, 16); put32(36, 8)
    val body = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih)) ++
      list("movi", frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    bos.write("RIFF".getBytes("US-ASCII")); le32(body.length)
    bos.write(body)
    bos.toByteArray
  }

  test("videoFrameNearDups finds a planted duplicate frame across " +
      "AVI files end-to-end (r6)") {
    // clip A carries frames 0/1/2; clip B re-cuts frame 1 between its
    // own frames 3/4 — the one cross-file near-dup pair
    val vids = java.util.Arrays.asList(
      Row("clipA", "video", avi(Seq(frame(0), frame(1), frame(2))),
        Map.empty[String, String]),
      Row("clipB", "video", avi(Seq(frame(3), frame(1), frame(4))),
        Map.empty[String, String]))
    val media = spark.createDataFrame(vids, Multimodal.MediaSchema)
    val pairs = Multimodal.videoFrameNearDups(media,
        MultimodalCodecs.JdkImageDecoder, framesPerVideo = 3,
        maxHamming = 2)
      .collect()
      .map(r => Set(r.getString(0), r.getString(1)) -> r.getInt(2))
    assert(pairs.toMap === Map(Set("clipA#1", "clipB#1") -> 0),
      s"expected exactly the planted pair, got ${pairs.toSeq}")
  }

  test("bucketize spreads rows across requested partitions") {
    val out = Multimodal.bucketize(media, 3)
    assert(out.rdd.getNumPartitions === 3)
    assert(out.count() === 4)
  }
}
