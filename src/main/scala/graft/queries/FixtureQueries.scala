package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Extract, MultimodalCodecs, PdfTextExtractor,
  SparseBm25, Tokenizers}

/** Fixture-parquet IDENTITY queries — the device that puts the
  * non-SQL-expressible operator families (PDF text extraction,
  * subword tokenization, multimodal container codecs, stemmed sparse
  * BM25) under the SAME hard driver gate as every relational query:
  * each query synthesizes its fixture inputs DETERMINISTICALLY in
  * code (no external input files), runs the REAL operator through the
  * real Spark plumbing, and emits a scalar-only frame; the oracle is
  * `SELECT * FROM read_parquet(...)` over a RECORDED expected output
  * committed under `fixtures/` (generated once by
  * [[graft.RecordExpected]], values cross-checked against the
  * operator specs' hand-derived cases — PdfTextSpec's exact page
  * strings, TokenizersSpec's greedy-match/merge-order cases,
  * MultimodalCodecsSpec's container fields, StemmerSpec's Porter2
  * vectors). A regression in any of these operators flips the row
  * red even though the semantics are not re-derivable in SQL.
  *
  * Reference surfaces gated here: PDF text-layer extraction
  * (`utils/pdf_utils.py` semantics, S2), tokenizer plumbing (C4),
  * the media container walks (the decode boundary's Spark side), and
  * the full fastembed `Qdrant/bm25` stemmed pipeline
  * (`database_qdrant_sparse_testing.py:154-163`, V4).
  */
object FixtureQueries {

  /** Committed expected-output location (absolute so the driver's
    * DuckDB process resolves it regardless of cwd). */
  val FixturesDir: String =
    sys.props.getOrElse("graft.fixtures.dir", "/root/repo/fixtures")

  // ---- PDF fixtures (same construction as PdfTextSpec) -----------

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Minimal n-page PDF; page content streams optionally
    * Flate-compressed. */
  private def buildPdf(pageStreams: Seq[String],
      compress: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val n = pageStreams.length
    val kidRefs = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    w(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w(s"2 0 obj << /Type /Pages /Kids [$kidRefs] /Count $n >> endobj\n")
    w("3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      ">> endobj\n")
    pageStreams.zipWithIndex.foreach { case (content, i) =>
      val pageObj = 4 + 2 * i
      val contObj = pageObj + 1
      w(s"$pageObj 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents $contObj 0 R " +
        s"/Resources << /Font << /F1 3 0 R >> >> >> endobj\n")
      if (compress) {
        val data = deflate(content)
        w(s"$contObj 0 obj << /Length ${data.length} " +
          "/Filter /FlateDecode >> stream\n")
        bos.write(data)
        w("\nendstream endobj\n")
      } else {
        w(s"$contObj 0 obj << /Length ${content.length} >> stream\n")
        w(content)
        w("\nendstream endobj\n")
      }
    }
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    bos.toByteArray
  }

  private val pdfPage1 =
    "BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj 0 -14 Td " +
      "[(Kerned ) -120 (text runs)] TJ ET"
  private val pdfPage2 =
    "BT /F1 12 Tf 72 720 Td (Second \\(page\\) text) Tj T* " +
      "(with a newline) Tj ET"
  private val pdfPage3 =
    "BT /F1 10 Tf 40 700 Td [(A) -80 (B) -400 (C)] TJ 0 -12 Td " +
      "(tail \\\\ backslash) Tj ET"

  /** Four fixture files: plain 2-page, Flate 2-page, a 1-page with
    * TJ kerning + escapes, and a trailer-truncated (structurally
    * invalid) document that must extract zero pages. */
  private def pdfFiles: Seq[(String, Array[Byte])] = {
    val flate = buildPdf(Seq(pdfPage1, pdfPage2), compress = true)
    Seq(
      ("plain.pdf", buildPdf(Seq(pdfPage1, pdfPage2), compress = false)),
      ("flate.pdf", flate),
      ("kerned.pdf", buildPdf(Seq(pdfPage3), compress = true)),
      ("broken.pdf", flate.take(flate.length - 40)))
  }

  /** q128: the REAL JDK PDF extractor (FlateDecode + BT/ET text ops)
    * over the fixture corpus through the S2 page-explode pipeline,
    * with the F11 structural-validity verdict per file. The invalid
    * file keeps a row (null page) so its verdict is value-checked
    * too. */
  def q128PdfExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = pdfFiles.toDF("source_file", "content")
    val validity = docs.select(col("source_file"),
      graft.functions.TextFunctions.isValidPdf(col("content"))
        .as("file_valid"))
    val pages = Extract.extractPages(docs, "source_file", "content",
      PdfTextExtractor)
    validity.join(pages, Seq("source_file"), "left")
      .select(col("source_file"), col("file_valid"), col("page"),
        col("page_text"))
      .orderBy(col("source_file"), col("page"))
  }

  // ---- tokenizer fixtures (C4: WordPiece + byte-level BPE) -------

  private val wordPieceVocab: Set[String] = Set(
    "the", "quick", "brown", "fox", "jump", "##ed", "##s", "##ing",
    "over", "lazy", "dog", "un", "##believ", "##able", "run", "##ner",
    "fast", "##est", "token", "##ize", "##r", "data", "##set",
    ",", ".", "!", "?")

  private val bpeMerges: Seq[(String, String)] = Seq(
    ("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o"),
    ("Ġ", "w"), ("o", "r"), ("l", "d"), ("Ġw", "or"), ("Ġwor", "ld"),
    ("t", "h"), ("th", "e"), ("Ġ", "the"), ("i", "n"), ("in", "g"))

  private val tokenizerTexts: Seq[(Long, String)] = Seq(
    (1L, "The quick fox jumped over the lazy dog."),
    (2L, "unbelievable tokenizer dataset, running fastest!"),
    (3L, "hello world"),
    (4L, "the thing held in the world"),
    (5L, "zzz unknown glyphs?"))

  /** q129: both subword tokenizers over the fixture texts — one row
    * per emitted token with its position, both algorithms in one
    * frame. Exercises greedy longest-prefix matching with `##`
    * continuations, punctuation isolation, `[UNK]` collapse, and BPE
    * merge-rank order with the `Ġ` space marker — the HF-format
    * surfaces TokenizersSpec pins case-by-case. */
  def q129Tokenize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val texts = tokenizerTexts.toDF("text_id", "text")
      .as[(Long, String)]
    val vocab = wordPieceVocab
    val merges = bpeMerges
    texts.mapPartitions { it =>
      // tokenizers initialize once per partition (the real plumbing
      // shape for table-backed vocabs)
      val wp = new Tokenizers.WordPieceTokenizer(vocab)
      val bpe = new Tokenizers.ByteLevelBpeTokenizer(merges)
      it.flatMap { case (id, t) =>
        wp.tokenize(t).zipWithIndex.map { case (tok, i) =>
          (id, "wordpiece", i.toLong, tok)
        } ++
          bpe.tokenize(t).zipWithIndex.map { case (tok, i) =>
            (id, "bpe", i.toLong, tok)
          }
      }
    }.toDF("text_id", "tokenizer", "pos", "token")
      .orderBy(col("text_id"), col("tokenizer"), col("pos"))
  }

  // ---- multimodal container fixtures -----------------------------

  /** Deterministic PNG: pixel = f(x, y). PNG is lossless, so encode →
    * decode round-trips exact pixel values on any JVM. */
  private def pngBytes(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16 kHz 16-bit mono WAV square wave. */
  private def wavBytes(nSamples: Int, period: Int,
      amp: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = bos.write(Array[Byte](v.toByte,
      (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
    def le16(v: Int): Unit =
      bos.write(Array[Byte](v.toByte, (v >> 8).toByte))
    bos.write("RIFF".getBytes); le32(36 + nSamples * 2)
    bos.write("WAVE".getBytes); bos.write("fmt ".getBytes); le32(16)
    le16(1); le16(1); le32(16000); le32(32000); le16(2); le16(16)
    bos.write("data".getBytes); le32(nSamples * 2)
    (0 until nSamples).foreach(i =>
      le16(if ((i / period) % 2 == 0) amp else -amp))
    bos.toByteArray
  }

  /** Minimal AVI: RIFF('AVI ' LIST('hdrl' avih) LIST('movi' 00dc…))
    * — PNG payload frames (lossless, so recorded features are
    * codec-version-proof). */
  private def aviBytes(frames: Seq[Array[Byte]], w: Int,
      h: Int): Array[Byte] = {
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
    put32(0, 33333); put32(16, frames.length); put32(32, w); put32(36, h)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII")); le32(body.length)
    bos.write(body)
    bos.toByteArray
  }

  /** Minimal ISO-BMFF MP4: 5 samples of 7 bytes, 2-per-chunk stsc
    * layout, keyframes at 1-based samples 1/3/5, 320x240 avc1 (same
    * values MultimodalCodecsSpec asserts field-by-field). */
  private def mp4Bytes(): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val size = payload.length + 8
      out.write(Array[Byte]((size >> 24).toByte, (size >> 16).toByte,
        (size >> 8).toByte, size.toByte))
      out.write(typ.getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }
    def be(vals: Long*): Array[Byte] =
      vals.flatMap(v => Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)).toArray
    val frames = (0 until 5).map(i => s"FRAME_$i")
    val ftyp = box("ftyp", "isom".getBytes ++ be(0))
    val mdat = box("mdat", frames.mkString("").getBytes)
    val base = ftyp.length + 8
    val stsd = box("stsd", be(0, 1) ++ be(8) ++ "avc1".getBytes)
    val stsz = box("stsz", be(0, 7, 5))
    val stsc = box("stsc", be(0, 1, 1, 2, 1))
    val stco = box("stco", be(0, 3, base, base + 14, base + 28))
    val stss = box("stss", be(0, 3, 1, 3, 5))
    val stbl = box("stbl", stsd ++ stsz ++ stsc ++ stco ++ stss)
    val minf = box("minf", stbl)
    val hdlr = box("hdlr", be(0, 0) ++ "vide".getBytes ++ be(0, 0, 0))
    val mdia = box("mdia", hdlr ++ minf)
    val tkhd = box("tkhd", be(0, 0, 0, 1, 0, 1200) ++ be(0, 0) ++
      Array[Byte](0, 0, 0, 0, 1, 0, 0, 0) ++
      be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000) ++
      be(320L << 16, 240L << 16))
    val mvhd = box("mvhd", be(0, 0, 0, 600, 1200))
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ mdia))
    ftyp ++ mdat ++ moov
  }

  /** Minimal Matroska: audio track 2 + video track 1 (64x48 V_VP9),
    * two clusters, 5 video blocks of which 3 are keyframes (same
    * layout MultimodalCodecsSpec asserts). */
  private def mkvBytes(): Array[Byte] = {
    def ebmlId(id: Long): Array[Byte] = {
      val w = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
        else if (id <= 0xffffffL) 3 else 4
      (0 until w).map(i =>
        ((id >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
    }
    def ebmlSize(n: Long): Array[Byte] =
      Array[Byte]((0x40 | ((n >> 8) & 0x3f)).toByte, (n & 0xff).toByte)
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      ebmlId(id) ++ ebmlSize(payload.length) ++ payload
    def uintEl(id: Long, v: Long): Array[Byte] = {
      var w = 1
      while (w < 8 && (v >>> (8 * w)) != 0) w += 1
      el(id, (0 until w).map(i =>
        ((v >> (8 * (w - 1 - i))) & 0xff).toByte).toArray)
    }
    def blockPayload(track: Int, rel: Int, key: Boolean,
        data: String): Array[Byte] =
      Array[Byte]((0x80 | track).toByte, ((rel >> 8) & 0xff).toByte,
        (rel & 0xff).toByte, (if (key) 0x80 else 0x00).toByte) ++
        data.getBytes("US-ASCII")
    val info = el(0x1549A966L, uintEl(0x2AD7B1L, 500000L))
    val trackA = el(0xAEL,
      uintEl(0xD7L, 2) ++ uintEl(0x83L, 2) ++
        el(0x86L, "A_OPUS".getBytes("US-ASCII")))
    val trackV = el(0xAEL,
      uintEl(0xD7L, 1) ++ uintEl(0x83L, 1) ++
        el(0x86L, "V_VP9".getBytes("US-ASCII")) ++
        el(0xE0L, uintEl(0xB0L, 64) ++ uintEl(0xBAL, 48)))
    val tracks = el(0x1654AE6BL, trackA ++ trackV)
    val cluster1 = el(0x1F43B675L,
      uintEl(0xE7L, 0) ++
        el(0xA3L, blockPayload(1, 0, key = true, "K0")) ++
        el(0xA3L, blockPayload(1, 40, key = false, "D1")) ++
        el(0xA3L, blockPayload(2, 0, key = true, "AUDIO")))
    val cluster2 = el(0x1F43B675L,
      uintEl(0xE7L, 1000) ++
        el(0xA0L, el(0xA1L, blockPayload(1, 0, key = false, "K1"))) ++
        el(0xA0L,
          el(0xA1L, blockPayload(1, 250, key = false, "D2")) ++
            uintEl(0xFBL, 0)) ++
        el(0xA3L, blockPayload(1, 500, key = true, "K2")))
    val segment = el(0x18538067L, info ++ tracks ++ cluster1 ++ cluster2)
    el(0x1A45DFA3L, Array.emptyByteArray) ++ segment
  }

  // private[queries], NOT private: an object-private case class
  // compiles without ACC_PUBLIC, so Spark's generated encoder code
  // can't resolve its accessors under Janino and every q130 run
  // falls back to the interpreted serializer (ERROR CodeGenerator +
  // 30 stack traces per bench). Package-private keeps the class
  // public in bytecode and the encoder in codegen.
  private[queries] case class MediaFeatures(media_id: String,
      kind: String,
      ok: Boolean, width: Option[Int], height: Option[Int],
      channels: Option[Int], duration_sec: Option[Double],
      n_frames: Option[Long], n_sync: Option[Long],
      dhash: Option[Long], audio_hash: Option[Long],
      rms0: Option[Double], rms1: Option[Double],
      rms2: Option[Double], rms3: Option[Double])

  // ---- EXIF fixtures (q313) --------------------------------------

  /** Deterministic JPEG via the JDK encoder (only its DIMENSIONS and
    * marker structure matter to q313 — the recorded values are the
    * EXIF parse, not pixel bytes). */
  private def jpegBytes(w: Int, h: Int)(f: (Int, Int) => Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Hand-assembled Exif APP1 segment (TIFF 6.0): IFD0 with
    * Make/Model/Orientation/DateTime + Exif sub-IFD
    * (DateTimeOriginal, PixelX/Y) and optionally a GPS-IFD pointer —
    * in either byte order, so the parser's II and MM walks are both
    * fixture-exercised. */
  private def exifApp1(little: Boolean, make: String, model: String,
      orientation: Int, dateTime: String, dtOrig: String,
      px: Long, py: Long, gps: Boolean): Array[Byte] = {
    val tiff = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (little) { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
      else { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (little) { tiff.write((v & 0xff).toInt)
        tiff.write(((v >> 8) & 0xff).toInt)
        tiff.write(((v >> 16) & 0xff).toInt)
        tiff.write(((v >> 24) & 0xff).toInt) }
      else { tiff.write(((v >> 24) & 0xff).toInt)
        tiff.write(((v >> 16) & 0xff).toInt)
        tiff.write(((v >> 8) & 0xff).toInt)
        tiff.write((v & 0xff).toInt) }
    // layout: header(8) | IFD0 | strings | exif IFD | dto string |
    //         gps IFD (empty)
    val mkB = make + "\u0000"; val mdB = model + "\u0000"
    val dtB = dateTime + "\u0000"; val dtoB = dtOrig + "\u0000"
    val n0 = if (gps) 6 else 5
    val ifd0Size = 2 + n0 * 12 + 4
    val strOff = 8 + ifd0Size
    val mkOff = strOff
    val mdOff = mkOff + mkB.length
    val dtOff = mdOff + mdB.length
    val exifOff = dtOff + dtB.length
    val exifSize = 2 + 3 * 12 + 4
    val dtoOff = exifOff + exifSize
    val gpsOff = dtoOff + dtoB.length
    tiff.write(if (little) 'I' else 'M')
    tiff.write(if (little) 'I' else 'M')
    w16(42); w32(8L)
    def entry(tag: Int, typ: Int, cnt: Long)(value: => Unit): Unit = {
      w16(tag); w16(typ); w32(cnt)
      val before = tiff.size(); value
      while (tiff.size() < before + 4) tiff.write(0)
    }
    def ascii(tag: Int, s: String, off: Int): Unit =
      entry(tag, 2, s.length.toLong) {
        if (s.length <= 4) s.foreach(c => tiff.write(c.toInt))
        else w32(off.toLong)
      }
    w16(n0)
    ascii(0x010f, mkB, mkOff)
    ascii(0x0110, mdB, mdOff)
    entry(0x0112, 3, 1L) { w16(orientation) }
    ascii(0x0132, dtB, dtOff)
    entry(0x8769, 4, 1L) { w32(exifOff.toLong) }
    if (gps) entry(0x8825, 4, 1L) { w32(gpsOff.toLong) }
    w32(0L) // next IFD
    mkB.foreach(c => tiff.write(c.toInt))
    mdB.foreach(c => tiff.write(c.toInt))
    dtB.foreach(c => tiff.write(c.toInt))
    w16(3)
    ascii(0x9003, dtoB, dtoOff)
    entry(0xa002, 4, 1L) { w32(px) }
    entry(0xa003, 4, 1L) { w32(py) }
    w32(0L)
    dtoB.foreach(c => tiff.write(c.toInt))
    w16(0); w32(0L) // empty GPS IFD
    val t = tiff.toByteArray
    val seg = new java.io.ByteArrayOutputStream()
    seg.write(0xff); seg.write(0xe1)
    val len = 2 + 6 + t.length
    seg.write((len >> 8) & 0xff); seg.write(len & 0xff)
    seg.write("Exif".getBytes("ISO-8859-1")); seg.write(0); seg.write(0)
    seg.write(t)
    seg.toByteArray
  }

  /** Splice an APP1 segment right after a JPEG's SOI marker. */
  private def withExif(jpeg: Array[Byte],
      app1: Array[Byte]): Array[Byte] =
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)

  private def exifFixtures: Seq[(String, Array[Byte])] = {
    val jA = jpegBytes(24, 16)((x, y) => ((x * 10) << 16) | (y * 15))
    val jB = jpegBytes(16, 16)((x, y) => ((x ^ y) * 17) << 8)
    val gpsApp1 = exifApp1(little = true, "GraftCam", "GC-100",
      orientation = 6, "2024:03:01 10:00:00", "2024:02:29 09:58:57",
      px = 24L, py = 16L, gps = true)
    val mmApp1 = exifApp1(little = false, "OtherCo", "MM-1",
      orientation = 1, "2023:12:31 23:59:59", "2023:12:31 23:59:58",
      px = 16L, py = 16L, gps = false)
    val truncated = {
      val a = exifApp1(little = true, "TruncCo", "T-1", 3,
        "2024:01:01 00:00:00", "2024:01:01 00:00:00", 8L, 8L,
        gps = false)
      // keep the APP1 header but chop the TIFF directory mid-entry;
      // the segment LENGTH is rewritten to match so the marker walk
      // still parses and the IFD bounds check is what trips
      val cut = a.take(24)
      val len = cut.length - 2
      cut(2) = ((len >> 8) & 0xff).toByte
      cut(3) = (len & 0xff).toByte
      cut
    }
    Seq(
      ("exif_gps_ii", withExif(jA, gpsApp1)),
      ("exif_mm", withExif(jB, mmApp1)),
      ("exif_trunc", withExif(jB, truncated)),
      ("no_exif", jA),
      ("not_jpeg", pngBytes(8, 8)((x, y) => x * y * 1000)))
  }

  private case class ExifRow(media_id: String, decodable: Boolean,
      has_exif: Boolean, byte_order: Option[String],
      make: Option[String], model: Option[String],
      orientation: Option[Int], date_time: Option[String],
      date_time_original: Option[String], pixel_x: Option[Long],
      pixel_y: Option[Long], has_gps: Boolean)

  /** q313: EXIF metadata + GPS-PII audit over the hand-built JPEG
    * fixtures ([[graft.operators.MultimodalCodecs.Exif]]): both TIFF
    * byte orders value-checked, the truncated directory fails
    * CLOSED, EXIF-less and non-JPEG bytes report has_exif=false, and
    * `decodable` proves the APP1 splice keeps every image
    * ImageIO-readable (metadata never costs the pixel path). Oracle
    * = recorded expected parquet (the q128/q130 device — byte-level
    * parsing is not SQL-derivable). */
  def q313ExifMetadata(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.operators.MultimodalCodecs
    val media = exifFixtures.toDF("media_id", "bytes")
      .as[(String, Array[Byte])]
    media.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val dims = MultimodalCodecs.JdkImageDecoder.imageDims(bytes)
        MultimodalCodecs.Exif.parse(bytes) match {
          case Some(e) => ExifRow(id, dims.isDefined, has_exif = true,
            Some(e.byteOrder), e.make, e.model, e.orientation,
            e.dateTime, e.dateTimeOriginal, e.pixelX, e.pixelY,
            e.hasGps)
          case None => ExifRow(id, dims.isDefined, has_exif = false,
            None, None, None, None, None, None, None, None,
            has_gps = false)
        }
      }
    }.toDF().orderBy(col("media_id"))
  }

  private def mediaFixtures: Seq[(String, String, Array[Byte])] = {
    val imgA = pngBytes(16, 16)((x, y) =>
      ((x * 17) << 16) | ((y * 17) << 8) | ((x ^ y) * 17))
    val imgB = pngBytes(32, 16)((x, y) =>
      ((x * 8) << 16) | ((y * 15) << 8) | (((x + y) % 16) * 16))
    val imgC = pngBytes(16, 16)((x, y) =>
      (((15 - x) * 17) << 16) | ((y * 17) << 8) | 0x40)
    Seq(
      ("img_a", "image", imgA),
      ("img_b", "image", imgB),
      ("img_c", "image", imgC),
      ("img_bad", "image", "not an image".getBytes("UTF-8")),
      ("wav_a", "audio", wavBytes(800, 30, 9000)),
      // amplitude ramps across the file so the envelope hash is a
      // NON-trivial bit pattern (a constant envelope hashes to 0,
      // which would record a value that guards nothing)
      ("wav_b", "audio", {
        val bos = new java.io.ByteArrayOutputStream()
        def le32(v: Int): Unit = bos.write(Array[Byte](v.toByte,
          (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte))
        def le16(v: Int): Unit =
          bos.write(Array[Byte](v.toByte, (v >> 8).toByte))
        val n = 1200
        bos.write("RIFF".getBytes); le32(36 + n * 2)
        bos.write("WAVE".getBytes); bos.write("fmt ".getBytes); le32(16)
        le16(1); le16(1); le32(16000); le32(32000); le16(2); le16(16)
        bos.write("data".getBytes); le32(n * 2)
        (0 until n).foreach { i =>
          val amp = 1000 + (i * 23) % 9000 // sawtooth envelope
          le16(if ((i / 50) % 2 == 0) amp else -amp)
        }
        bos.toByteArray
      }),
      ("avi_a", "video",
        aviBytes((0 until 6).map(i =>
          pngBytes(16, 8)((x, y) => (i * 40) << 16)), 16, 8)),
      ("mp4_a", "video", mp4Bytes()),
      ("mkv_a", "video", mkvBytes()))
  }

  /** q130: every container codec over its hand-built fixture, one
    * wide scalar row per media item — image dims + dHash64, WAV
    * duration + envelope hash + 4-bucket RMS, and the AVI/MP4/MKV
    * walks' frame and keyframe counts. Undecodable bytes yield
    * ok=false with nulls (the fail-closed contract). */
  def q130CodecFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = mediaFixtures.toDF("media_id", "kind", "bytes")
      .as[(String, String, Array[Byte])]
    media.mapPartitions { it =>
      it.map { case (id, kind, bytes) =>
        val empty = MediaFeatures(id, kind, ok = false, None, None,
          None, None, None, None, None, None, None, None, None, None)
        kind match {
          case "image" =>
            MultimodalCodecs.JdkImageDecoder.imageDims(bytes) match {
              case Some((w, h, c)) => empty.copy(ok = true,
                width = Some(w), height = Some(h), channels = Some(c),
                dhash = MultimodalCodecs.dHash64(bytes))
              case None => empty
            }
          case "audio" =>
            MultimodalCodecs.WavAudio.info(bytes) match {
              case Some(wi) =>
                val rms = MultimodalCodecs.WavAudio
                  .rmsFeatures(bytes, 4).get
                empty.copy(ok = true, channels = Some(wi.channels),
                  duration_sec = Some(wi.durationSec),
                  audio_hash = MultimodalCodecs.audioHash64(bytes),
                  rms0 = Some(rms(0).toDouble),
                  rms1 = Some(rms(1).toDouble),
                  rms2 = Some(rms(2).toDouble),
                  rms3 = Some(rms(3).toDouble))
              case None => empty
            }
          case _ =>
            val avi = MultimodalCodecs.AviVideo.info(bytes).map { vi =>
              empty.copy(ok = true, width = Some(vi.width),
                height = Some(vi.height),
                n_frames = Some(vi.totalFrames.toLong),
                n_sync = Some(MultimodalCodecs.AviVideo
                  .sampleFrames(bytes, Int.MaxValue).length.toLong))
            }
            val mp4 = MultimodalCodecs.Mp4Video.info(bytes).map { vi =>
              empty.copy(ok = true, width = Some(vi.width),
                height = Some(vi.height),
                duration_sec = Some(vi.durationSec),
                n_frames = Some(vi.nSamples.toLong),
                n_sync = Some(vi.nSync.toLong))
            }
            val mkv = MultimodalCodecs.MkvVideo.info(bytes).map { vi =>
              empty.copy(ok = true, width = Some(vi.width),
                height = Some(vi.height),
                n_frames = Some(vi.nBlocks.toLong),
                n_sync = Some(vi.nKey.toLong))
            }
            avi.orElse(mp4).orElse(mkv).getOrElse(empty)
        }
      }
    }.toDF().orderBy(col("media_id"))
  }

  // ---- stemmed sparse BM25 (the full fastembed pipeline) ---------

  /** Morphology-rich fixture docs built from StemmerSpec's verified
    * Porter2 vectors, so every stem in the expected output is
    * hand-checkable against the published algorithm (e.g. running →
    * run, connections → connect, generously → generous). */
  private val stemmedDocs: Seq[(Long, String)] = Seq(
    (1L, "running runs easily fairly quickly"),
    (2L, "connection connected connecting connections matter"),
    (3L, "argue argued argues arguing generously"),
    (4L, "relational abilities dying lying tying"),
    (5L, "happiness happily unhappily sensational sensible"),
    (6L, "running connection argue relational happiness skies"))

  /** q131: [[SparseBm25.embedStemmed]] — the COMPLETE fastembed
    * `Qdrant/bm25` document-side pipeline with Snowball/Porter2
    * stemming between stopword removal and hashing — posexploded to
    * the scalar (doc_id, n_terms, pos, term_index, weight) contract.
    * Stemming is not SQL-derivable, so the oracle is the recorded
    * expected parquet; term frequencies counted over stems mean e.g.
    * doc 2's connection/connected/connecting/connections collapse to
    * ONE term with tf=4, which the weight value proves. */
  def q131SparseStemmed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = stemmedDocs.toDF("doc_id", "text")
    SparseBm25.embedStemmed(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_terms"),
        posexplode(arrays_zip(col("indices"), col("values"))))
      .select(col("doc_id"), col("n_terms"),
        col("pos").cast("long").as("pos"),
        col("col.indices").as("term_index"),
        col("col.values").as("weight"))
      .orderBy(col("doc_id"), col("term_index"))
  }

  /** Deterministic BPE training corpus: morphologically overlapping
    * words (shared stems/suffixes) so early merges are meaningful,
    * generated by a fixed arithmetic schedule — no RNG, identical on
    * every run. */
  private val bpeTrainVocab: Array[String] = Array(
    "data", "base", "datum", "dates", "update", "upload", "loader",
    "loading", "ready", "steady", "stream", "streams")
  private def bpeTrainCorpus: Seq[(Long, String)] =
    (0 until 100).map { i =>
      val words = (0 until 20).map(j =>
        bpeTrainVocab((i * 13 + j * 7) % bpeTrainVocab.length))
      (i.toLong, words.mkString(" "))
    }

  /** q140: [[Tokenizers.trainBpe]] — BPE merge-table LEARNING (the
    * tokenizer-training leg of a data pipeline): the distributed
    * word-frequency pass + driver merge loop over the type table,
    * then the learned merges driving the REAL
    * [[Tokenizers.ByteLevelBpeTokenizer]] over a probe sentence
    * (including a word never seen in training, which must fall back
    * to smaller units). Training isn't SQL-derivable, so the oracle
    * is the recorded expected parquet; TokenizersSpec pins the merge
    * order against a hand-derived example. */
  def q140BpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corpus = bpeTrainCorpus.toDF("doc_id", "text")
    val merges = Tokenizers.trainBpe(corpus, "text", numMerges = 40)
    val tok = new Tokenizers.ByteLevelBpeTokenizer(merges)
    val probe = "upload the steady data stream"
    val mergeRows = merges.zipWithIndex.map { case ((a, b), r) =>
      ("merge", r.toLong, a, b)
    }
    val tokenRows = tok.tokenize(probe).zipWithIndex.map {
      case (t, i) => ("token", i.toLong, t, "")
    }
    (mergeRows ++ tokenRows).toDF("kind", "idx", "a", "b")
      .orderBy(col("kind"), col("idx"))
  }

  /** q144: tokenizer FERTILITY evaluation — the metric a tokenizer
    * choice is judged by for a training corpus (subword tokens per
    * whitespace word; continuation fraction = how often a word
    * splits): the q140-trained merges driving the real tokenizer
    * over probe classes of increasing distance from the training
    * distribution (seen words, morphological variants sharing stems,
    * fully unseen vocabulary). Fertility must be monotone across
    * those classes — recorded output + spec pin. Each probe
    * tokenizes independently inside one mapPartitions pass (the
    * table-backed-tokenizer plumbing shape); counters are exact
    * ints, fertility one final IEEE division. */
  def q144BpeFertility(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val corpus = bpeTrainCorpus.toDF("doc_id", "text")
    val merges = Tokenizers.trainBpe(corpus, "text", numMerges = 40)
    val probes = Seq(
      ("a_seen", "data base update loader stream ready"),
      ("b_morph", "datum dates loading streams steady upload"),
      ("c_unseen", "zebra quantum flux oracle vertex"))
    val probeDs = probes.toDF("probe", "text").as[(String, String)]
    probeDs.mapPartitions { it =>
      val tok = new Tokenizers.ByteLevelBpeTokenizer(merges)
      it.map { case (p, t) =>
        val words = t.split(" ")
        val pieces = tok.tokenize(t)
        // a word emitted whole is one piece that IS the word (with
        // its Ġ marker for non-initial words)
        val whole = words.indices.count { i =>
          val marked = (if (i > 0) "Ġ" else "") + words(i)
          pieces.contains(marked)
        }
        (p, words.length.toLong, pieces.length.toLong,
          pieces.length.toDouble / words.length, whole.toLong)
      }
    }.toDF("probe", "n_words", "n_subwords", "fertility",
        "n_whole_words")
      .orderBy(col("probe"))
  }

  // ---- PCA projection fixture ------------------------------------

  /** Deterministic correlated embeddings (no RNG): two latent factors
    * with different per-dimension loadings + a small ripple, so the
    * covariance has well-separated leading eigenvalues and the
    * top-3 axes are stable. 60 rows × d=8. */
  private def pcaFixtureRows: Seq[(Long, Seq[Double])] =
    (0 until 60).map { i =>
      val f1 = ((i * 31 + 11) % 97) / 97.0
      val f2 = ((i * 17 + 5) % 89) / 89.0
      (i.toLong, (0 until 8).map { j =>
        f1 * ((j + 1) * 0.25) + f2 * (((j * j) % 5) * 0.3) +
          ((i * 7 + j * 13) % 23) / 23.0 * 0.05
      })
    }

  /** q177: [[graft.operators.Pca.pcaProject]] — the driver-side
    * Jacobi eigensolve + codegen projection that q174 (covariance
    * gate) cannot see: axes are eigenvectors, not SQL-derivable, so
    * the oracle is the recorded expected parquet (the q128 device).
    * The whole pipeline is deterministic — decimal-exact covariance,
    * fixed-sweep Jacobi, fixed-order projection sum — and each
    * projected coordinate is floor-truncated to 9 decimals, so the
    * recorded values are engine- and run-exact. A regression in the
    * eigensolve (sweep order, rotation formula, eigenvalue ordering)
    * or in the projection's mean-centering flips the row red. */
  def q177PcaProject(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = pcaFixtureRows.toDF("vec_id", "embedding")
    graft.operators.Pca.pcaProject(emb, "embedding", k = 3)
      .select(col("vec_id"), posexplode(col("pc")))
      .select(col("vec_id"), col("pos").cast("long").as("pc_idx"),
        (floor(col("col") * lit(1e9)).cast("double") / lit(1e9))
          .as("pc_val"))
      .orderBy(col("vec_id"), col("pc_idx"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_pca_project" -> (q177PcaProject _),
    "q128_pdf_extract" -> (q128PdfExtract _),
    "q129_tokenize" -> (q129Tokenize _),
    "q130_codec_features" -> (q130CodecFeatures _),
    "q313_exif_metadata" -> (q313ExifMetadata _),
    "q131_sparse_stemmed" -> (q131SparseStemmed _),
    "q140_bpe_train" -> (q140BpeTrain _),
    "q144_bpe_fertility" -> (q144BpeFertility _))

  /** Identity oracles over the recorded expected parquet. The driver
    * compares rows sorted, so the ORDER BY is cosmetic. */
  val oracle: Map[String, String] = queries.keys.map { name =>
    name ->
      s"SELECT * FROM read_parquet('$FixturesDir/$name/*.parquet')"
  }.toMap
}
