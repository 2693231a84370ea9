package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Real JDK codecs: ImageIO-backed dimensions/features and RIFF/WAVE
  * header parsing + PCM energy features. */
class MultimodalCodecsSpec extends SparkTestBase {

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Minimal PCM16 mono WAV: header + a 440-ish square wave. */
  private def wavBytes(rate: Int, seconds: Double): Array[Byte] = {
    val n = (rate * seconds).toInt
    val dataLen = n * 2
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    def le16(v: Int): Unit =
      (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    bos.write("RIFF".getBytes); le32(36 + dataLen)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); le32(16)
    le16(1); le16(1); le32(rate); le32(rate * 2); le16(2); le16(16)
    bos.write("data".getBytes); le32(dataLen)
    (0 until n).foreach { i =>
      le16(if ((i / 50) % 2 == 0) 12000 else -12000)
    }
    bos.toByteArray
  }

  test("JdkImageDecoder reads real PNG dimensions and histogram " +
      "features") {
    val png = pngBytes(32, 16)
    assert(MultimodalCodecs.JdkImageDecoder.imageDims(png)
      === Some((32, 16, 3)))
    val f = MultimodalCodecs.JdkImageDecoder.features(png, 8)
    assert(f.length === 8)
    // checkerboard: half black (bin 0), half white (last bin)
    assert(math.abs(f(0) - 0.5f) < 1e-6)
    assert(math.abs(f(7) - 0.5f) < 1e-6)
    assert(f.sum === 1.0f)
    // deterministic
    assert(MultimodalCodecs.JdkImageDecoder.features(png, 8).toSeq
      === f.toSeq)
    // garbage bytes are undecodable
    assert(MultimodalCodecs.JdkImageDecoder
      .imageDims("not an image".getBytes).isEmpty)
  }

  test("WavAudio parses RIFF headers and computes RMS features") {
    val wav = wavBytes(8000, 0.5)
    val info = MultimodalCodecs.WavAudio.info(wav)
    assert(info === Some(MultimodalCodecs.WavInfo(1, 8000, 16, 0.5)))
    val f = MultimodalCodecs.WavAudio.rmsFeatures(wav, 4).get
    assert(f.length === 4)
    // constant-amplitude square wave: every bucket near 12000/32768
    f.foreach(v => assert(math.abs(v - 12000f / 32768f) < 0.01f))
    assert(MultimodalCodecs.WavAudio.info("RIFFjunk".getBytes).isEmpty)
  }

  test("decodeImages and decodeAudio drive the Spark pipeline with " +
      "real codecs") {
    import spark.implicits._
    val media = Seq(
      ("img1", "image", pngBytes(8, 8), Map.empty[String, String]),
      ("aud1", "audio", wavBytes(16000, 0.25), Map.empty[String, String]),
      ("bad1", "image", "garbage".getBytes, Map.empty[String, String]))
      .toDF("media_id", "kind", "bytes", "meta")
    val imgs = Multimodal.decodeImages(media,
      MultimodalCodecs.JdkImageDecoder)
      .orderBy("media_id").collect()
    assert(imgs.find(_.getString(0) == "img1").get.getInt(1) === 8)
    assert(!imgs.find(_.getString(0) == "bad1").get.getBoolean(4))
    val auds = MultimodalCodecs.decodeAudio(media)
      .filter(col("ok")).collect()
    assert(auds.length === 1)
    assert(auds(0).getInt(2) === 16000)
    assert(math.abs(auds(0).getDouble(4) - 0.25) < 1e-9)
  }
}
