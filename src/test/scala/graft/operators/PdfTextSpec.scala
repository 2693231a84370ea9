package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Real PDF text-layer extraction (S2): hand-built fixture PDFs —
  * uncompressed and FlateDecode — through [[PdfTextExtractor]] and the
  * Spark page-explode pipeline. */
class PdfTextSpec extends SparkTestBase {

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Two-page PDF; page contents optionally Flate-compressed. */
  private def buildPdf(pageStreams: Seq[String],
      compress: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    val n = pageStreams.length
    val kidRefs = (0 until n).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    w(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w(s"2 0 obj << /Type /Pages /Kids [$kidRefs] /Count $n >> endobj\n")
    w("3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
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

  private val page1 =
    "BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj 0 -14 Td " +
      "[(Kerned ) -120 (text runs)] TJ ET"
  private val page2 =
    "BT /F1 12 Tf 72 720 Td (Second \\(page\\) text) Tj T* " +
      "(with a newline) Tj ET"

  test("extracts text from an uncompressed two-page PDF " +
      "(Tj, TJ arrays, escapes, line moves)") {
    val pdf = buildPdf(Seq(page1, page2), compress = false)
    val pages = PdfTextExtractor.pages(pdf)
    assert(pages.length === 2)
    assert(pages(0) === "Hello PDF world\nKerned text runs")
    assert(pages(1) === "Second (page) text\nwith a newline")
  }

  test("extracts text from a FlateDecode-compressed PDF") {
    val pdf = buildPdf(Seq(page1, page2), compress = true)
    val pages = PdfTextExtractor.pages(pdf)
    assert(pages.length === 2)
    assert(pages(0).startsWith("Hello PDF world"))
    assert(pages(1).contains("Second (page) text"))
  }

  test("non-PDF bytes and empty input yield no pages") {
    assert(PdfTextExtractor.pages("not a pdf".getBytes) === Seq.empty)
    assert(PdfTextExtractor.pages(Array.empty[Byte]) === Seq.empty)
  }

  test("isStructurallyValid accepts complete PDFs and rejects " +
      "magic-valid truncations (F11 page-open parity)") {
    val pdf = buildPdf(Seq(page1, page2), compress = true)
    assert(PdfTextExtractor.isStructurallyValid(pdf))
    // end-truncation cuts the trailer: pdfplumber raises "No /Root"
    assert(!PdfTextExtractor.isStructurallyValid(
      pdf.take(pdf.length - 40)))
    // mid-truncation dangles page 1's content stream
    val doc = new String(pdf, "ISO-8859-1")
    val cut = doc.substring(0, doc.indexOf("endstream")) +
      doc.substring(doc.indexOf("trailer"))
    assert(!PdfTextExtractor.isStructurallyValid(
      cut.getBytes("ISO-8859-1")))
    // magic alone is not enough
    assert(!PdfTextExtractor.isStructurallyValid(
      "%PDF-1.7 nothing else".getBytes("ISO-8859-1")))
    assert(!PdfTextExtractor.isStructurallyValid(null))
  }

  test("drives the Spark page-explode pipeline end to end (S2)") {
    import spark.implicits._
    val pdf = buildPdf(Seq(page1, page2), compress = true)
    val docs = Seq(("a.pdf", pdf)).toDF("source_file", "content")
    val pages = Extract.extractPages(docs, "source_file", "content",
      PdfTextExtractor)
    val got = pages.orderBy("page").collect()
    assert(got.map(_.getInt(1)).toSeq === Seq(1, 2))
    assert(got(0).getString(2).contains("Hello PDF world"))
    // the extracted pages pass the validity magic check upstream
    val valid = docs.select(
      graft.functions.TextFunctions.isValidPdf(col("content")))
      .head().getBoolean(0)
    assert(valid)
  }
}
