package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Corpus media is routinely damaged, so every binary parser must
  * fail CLOSED on arbitrary and corrupted bytes — no exceptions, no
  * hangs. Two deterministic fuzz modes per parser: pure random
  * buffers, and bit/truncation mutations of VALID fixtures (the mode
  * that actually finds walk bugs — a corrupt length field inside an
  * otherwise-valid container; this suite caught a negative-chunk-len
  * infinite loop in the WAV walk when first written). Runs without a
  * SparkSession — these are plain JVM functions. */
class ParserFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813L)

  private def randomBytes(maxLen: Int): Array[Byte] = {
    val b = new Array[Byte](rnd.nextInt(maxLen))
    rnd.nextBytes(b)
    b
  }

  /** A valid fixture, mutated: truncation, byte flips, or both. */
  private def mutate(valid: Array[Byte]): Array[Byte] = {
    var b = valid.clone()
    if (rnd.nextBoolean() && b.length > 1)
      b = b.take(1 + rnd.nextInt(b.length - 1))
    val flips = rnd.nextInt(8)
    for (_ <- 0 until flips if b.nonEmpty)
      b(rnd.nextInt(b.length)) =
        (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
    b
  }

  /** Run `f` over N random + N mutated inputs with a hang guard. */
  private def fuzz(name: String, valid: Array[Byte], n: Int = 150)
      (f: Array[Byte] => Any): Unit = {
    val inputs =
      (0 until n).map(_ => randomBytes(2048)) ++
        (0 until n).map(_ => mutate(valid))
    inputs.zipWithIndex.foreach { case (in, i) =>
      val t = new java.util.concurrent.FutureTask(
        new java.util.concurrent.Callable[Any] { def call(): Any = f(in) })
      val th = new Thread(t); th.setDaemon(true); th.start()
      try t.get(10, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          fail(s"$name HUNG on input $i (${in.length} bytes)")
        case e: java.util.concurrent.ExecutionException =>
          fail(s"$name THREW on input $i: ${e.getCause}")
      }
    }
  }

  // ---- valid fixtures (same construction as the format specs) ----
  private def validWav(): Array[Byte] = {
    val n = 800
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = bos.write(Array[Byte](v.toByte,
      (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
    def le16(v: Int): Unit =
      bos.write(Array[Byte](v.toByte, (v >> 8).toByte))
    bos.write("RIFF".getBytes); le32(36 + n * 2)
    bos.write("WAVE".getBytes); bos.write("fmt ".getBytes); le32(16)
    le16(1); le16(1); le32(16000); le32(32000); le16(2); le16(16)
    bos.write("data".getBytes); le32(n * 2)
    (0 until n).foreach(i => le16(if ((i / 30) % 2 == 0) 9000 else -9000))
    bos.toByteArray
  }

  private def validTar(): Array[Byte] = {
    val h = new Array[Byte](512)
    System.arraycopy("a.txt".getBytes, 0, h, 0, 5)
    System.arraycopy("0000010".getBytes, 0, h, 124, 7) // size 8
    h(156) = '0'
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(h); bos.write("12345678".getBytes)
    bos.write(new Array[Byte](504)); bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  private def validPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // AVI and MP4 valid fixtures: reuse tiny hand-built containers
  private def validAvi(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    def le32(v: Int): Unit = bos.write(Array[Byte](v.toByte,
      (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
    w("RIFF"); le32(4 + 8 + 12); w("AVI ")
    w("JUNK"); le32(4); le32(0)
    bos.toByteArray
  }

  private def validPdf(): Array[Byte] =
    ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 12 >> stream\nBT (x) Tj ET\nendstream endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n").getBytes("ISO-8859-1")

  test("WavAudio info/rmsFeatures fail closed") {
    fuzz("WavAudio", validWav()) { b =>
      MultimodalCodecs.WavAudio.info(b)
      MultimodalCodecs.WavAudio.rmsFeatures(b, 16)
      MultimodalCodecs.audioHash64(b)
    }
  }

  test("TarShards.entries fails closed") {
    fuzz("TarShards", validTar())(TarShards.entries)
  }

  test("Mp4Video info/sampleFrames fail closed") {
    // a structurally interesting valid-ish seed: ftyp + moov shell
    val seed = {
      val bos = new java.io.ByteArrayOutputStream()
      def be32(v: Int): Unit = bos.write(Array[Byte]((v >> 24).toByte,
        (v >> 16).toByte, (v >> 8).toByte, v.toByte))
      be32(16); bos.write("ftyp".getBytes); bos.write("isom".getBytes)
      be32(0); be32(16); bos.write("moov".getBytes)
      be32(8); bos.write("mvhd".getBytes)
      bos.toByteArray
    }
    fuzz("Mp4Video", seed) { b =>
      MultimodalCodecs.Mp4Video.info(b)
      MultimodalCodecs.Mp4Video.sampleFrames(b, 3)
    }
  }

  test("AviVideo info/sampleFrames fail closed") {
    fuzz("AviVideo", validAvi()) { b =>
      MultimodalCodecs.AviVideo.info(b)
      MultimodalCodecs.AviVideo.sampleFrames(b, 3)
    }
  }

  test("MkvVideo info/sampleFrames fail closed") {
    // valid-ish seed: EBML magic + Segment(Tracks(video entry) +
    // Cluster(Timestamp + keyframe SimpleBlock)) — same layout as
    // the MultimodalCodecsSpec fixture, compact form
    val seed = {
      def id(v: Long, w: Int): Array[Byte] =
        (0 until w).map(i => ((v >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
      def el(i: Long, w: Int, p: Array[Byte]): Array[Byte] =
        id(i, w) ++ Array[Byte]((0x80 | p.length).toByte) ++ p
      val trk = el(0xAEL, 1,
        el(0xD7L, 1, Array[Byte](1)) ++ el(0x83L, 1, Array[Byte](1)) ++
          el(0x86L, 1, "V_VP9".getBytes))
      val cluster = el(0x1F43B675L, 4,
        el(0xE7L, 1, Array[Byte](0)) ++
          el(0xA3L, 1, Array[Byte](0x81.toByte, 0, 0, 0x80.toByte) ++
            "FRAME".getBytes))
      id(0x1A45DFA3L, 4) ++ Array[Byte](0x80.toByte) ++
        el(0x18538067L, 4, el(0x1654AE6BL, 4, trk) ++ cluster)
    }
    fuzz("MkvVideo", seed) { b =>
      MultimodalCodecs.MkvVideo.info(b)
      MultimodalCodecs.MkvVideo.sampleFrames(b, 3)
    }
  }

  test("near-Int.MaxValue declared chunk lengths fail closed " +
      "(Int-overflow pattern, r6)") {
    // `o + 8 + len` overflows Int for len near Int.MaxValue, turning
    // the walk cursor negative and defeating a same-width bounds
    // guard — a byte pattern the fixed-seed random flips above never
    // produced (advisor finding, r5). The walks must end cleanly.
    def patchLe32(b: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val c = b.clone()
      c(off) = v.toByte; c(off + 1) = (v >> 8).toByte
      c(off + 2) = (v >> 16).toByte; c(off + 3) = (v >> 24).toByte
      c
    }
    // fmt chunk length (offset 16) and data chunk length (offset 40)
    for (off <- Seq(16, 40); len <- Seq(0x7ffffff0, 0x7fffffff)) {
      val w = patchLe32(validWav(), off, len)
      MultimodalCodecs.WavAudio.info(w)
      MultimodalCodecs.WavAudio.rmsFeatures(w, 16)
      MultimodalCodecs.audioHash64(w)
    }
    // AVI: first chunk after the RIFF header (JUNK len at offset 16)
    for (len <- Seq(0x7ffffff0, 0x7fffffff)) {
      val a = patchLe32(validAvi(), 16, len)
      MultimodalCodecs.AviVideo.info(a)
      MultimodalCodecs.AviVideo.sampleFrames(a, 3)
    }
  }

  test("PdfTextExtractor pages/isStructurallyValid fail closed") {
    fuzz("PdfText", validPdf()) { b =>
      PdfTextExtractor.pages(b)
      PdfTextExtractor.isStructurallyValid(b)
    }
  }

  test("image decode paths fail closed") {
    fuzz("dHash64", validPng()) { b =>
      MultimodalCodecs.dHash64(b)
      MultimodalCodecs.JdkImageDecoder.imageDims(b)
    }
  }
}
