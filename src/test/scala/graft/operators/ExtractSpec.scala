package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extraction handlers: page explode, ASR segments, gatekeeper page
  * batching (S2/S5/C5). */
class ExtractSpec extends SparkTestBase {

  private def binDf(rows: (String, String)*) = {
    val schema = StructType(Seq(
      StructField("source_file", StringType),
      StructField("content", BinaryType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        rows.map { case (f, t) => Row(f, t.getBytes("UTF-8")) }: _*),
      schema)
  }

  test("extractPages explodes form-feed pages with 1-based numbering") {
    val docs = binDf("a.pdf" -> "page one\fpage two\fpage three",
      "b.pdf" -> "single page")
    val out = Extract.extractPages(docs, "source_file", "content",
      Extract.FormFeedExtractor).collect()
    assert(out.count(_.getString(0) == "a.pdf") === 3)
    val a2 = out.find(r => r.getString(0) == "a.pdf" && r.getInt(1) == 2)
    assert(a2.get.getString(2) === "page two")
    assert(out.filter(_.getString(0) == "b.pdf").map(_.getInt(1)).toSeq
      === Seq(1))
  }

  test("transcribe emits timed segments (S5)") {
    val media = binDf("talk.mp3" -> "hello world\nsecond segment")
    val out = Extract.transcribe(media, "source_file", "content",
      Extract.LineSegmentAsr).orderBy("segment_index").collect()
    assert(out.length === 2)
    assert(out(0).getDouble(2) === 0.0 && out(0).getDouble(3) === 5.0)
    assert(out(1).getString(4) === "second segment")
  }

  test("batchPages groups 5 pages per batch with INTERNAL_PAGE tags (C5)") {
    val docs = binDf("big.pdf" ->
      (1 to 12).map(i => s"content $i").mkString("\f"))
    val pages = Extract.extractPages(docs, "source_file", "content",
      Extract.FormFeedExtractor)
    val batches = Extract.batchPages(pages, batchSize = 5)
      .orderBy("batch_id").collect()
    assert(batches.length === 3) // 5 + 5 + 2
    val b0 = batches(0).getAs[String]("batch_text")
    assert(b0.contains("### [INTERNAL_PAGE_1]"))
    assert(b0.contains("### [INTERNAL_PAGE_5]"))
    assert(!b0.contains("### [INTERNAL_PAGE_6]"))
    // round-trips through the markdown chunker's page attribution
    val pieces = Chunker.splitMarkdown(b0)
    assert(pieces.forall(p => p.page >= 1 && p.page <= 5))
  }

  test("isValidPdf opens the document, not just the magic (F11, " +
      "text_utils.py:227-249)") {
    import graft.functions.TextFunctions
    // a structurally complete one-page document
    val ok = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 12 >> stream\nBT (x) Tj ET\nendstream endobj\n" +
      "trailer << /Root 1 0 R >>\n%%EOF\n"
    // magic alone no longer passes: pdfplumber's open would raise
    val docs = binDf(
      "ok.pdf" -> ok,
      "magic_only.pdf" -> "%PDF-1.7 rest of file",
      "truncated.pdf" -> ok.substring(0, ok.indexOf("endstream")),
      "bad.pdf" -> "not a pdf at all")
    val got = docs.select(col("source_file"),
      TextFunctions.isValidPdf(col("content")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map("ok.pdf" -> true, "magic_only.pdf" -> false,
      "truncated.pdf" -> false, "bad.pdf" -> false))
  }

  test("ocrFallback routes only quality-gate failures through the " +
      "OCR service (S3 3-tier short-circuit)") {
    val schema = StructType(Seq(
      StructField("source_file", StringType),
      StructField("page", IntegerType, nullable = false),
      StructField("page_text", StringType),
      StructField("img", BinaryType),
      StructField("h", IntegerType, nullable = false),
      StructField("w", IntegerType, nullable = false)))
    val good = "a perfectly normal sentence with plenty of words here"
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("doc.pdf", 1, good, "unused".getBytes("UTF-8"), 2, 3),
        Row("doc.pdf", 2, "", "rescued by ocr from the page image"
          .getBytes("UTF-8"), 2, 3)),
      schema)
    val out = Extract.ocrFallback(df, "source_file", "page",
      "page_text", "img", "h", "w", Extract.EchoOcr)
      .orderBy("page").collect()
    assert(out(0).getAs[String]("extracted_text") === good)
    assert(out(0).getAs[String]("extract_engine") === "text-layer")
    assert(out(1).getAs[String]("extracted_text")
      === "rescued by ocr from the page image")
    assert(out(1).getAs[String]("extract_engine") === "stub-echo")
  }

  test("generate appends answers per partition (R2)") {
    import spark.implicits._
    val contexts = Seq((1L, "ctx a"), (2L, "ctx b")).toDF("qid", "context")
    val out = Rag.generate(contexts, Rag.EchoGenerator)
      .orderBy("qid").collect()
    assert(out.length === 2)
    assert(out.forall(_.getString(2).contains("[source1]")))
  }
}
