package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extraction handlers (SURVEY §2.1 S2-S5): the reference's
  * chain-of-responsibility PDF/OCR/ASR/text handlers re-expressed as
  * partition-batched one-to-many transforms over binary/text columns.
  *
  * The native extraction calls (pdfplumber, Docling OCR, WhisperX) are
  * external services in the reference and remain external boundaries
  * here ([[PageExtractor]] / [[AsrService]]), with deterministic stub
  * implementations so the pipeline is hermetic (SURVEY §7 hard part
  * 3). The Spark-side shape is real: binary scan → per-partition
  * service call → page/segment explode → quality gate → tier routing.
  */
object Extract {

  /** External boundary: bytes → page texts (S2 pdfplumber loop / S3
    * OCR fallback live behind this). */
  trait PageExtractor extends Serializable {
    def pages(bytes: Array[Byte]): Seq[String]
  }

  /** External boundary: media bytes → timed transcript segments (S5). */
  trait AsrService extends Serializable {
    /** (startSec, endSec, text) triples. */
    def transcribe(bytes: Array[Byte]): Seq[(Double, Double, String)]
  }

  /** One OCR'd page: the reply payload of the reference's OCR worker
    * (`workers/ocr_graph.py:86-94` respond_node fields). */
  case class OcrText(text: String, engine: String)

  /** External boundary: one rasterized page image → text (S3 — the
    * reference's Docling/EasyOCR worker behind the
    * `utils/ocr_utils.py:60-112` request/reply protocol). `image` is
    * the preprocessed grayscale row-major buffer with its
    * (height, width) shape, exactly what the reference serializes
    * (`image_shape`/`image_dtype`/`image_base64`). */
  trait OcrService extends Serializable {
    def ocrPage(image: Array[Byte], height: Int, width: Int,
        relPath: String, page: Int): OcrText
  }

  /** Deterministic stub OCR: reads the "image" buffer as UTF-8 text —
    * the routing, batching, and schema plumbing run for real; only
    * the recognition model is canned (SURVEY §7 hard part 3). */
  object EchoOcr extends OcrService {
    def ocrPage(image: Array[Byte], height: Int, width: Int,
        relPath: String, page: Int): OcrText =
      OcrText(if (image == null) "" else new String(image, "UTF-8"),
        "stub-echo")
  }

  /** Deterministic stub: pages split on ASCII form-feed (the layout
    * convention text-mode PDFs honor), so page attribution plumbing is
    * exercised without a PDF library. */
  object FormFeedExtractor extends PageExtractor {
    def pages(bytes: Array[Byte]): Seq[String] =
      if (bytes == null || bytes.isEmpty) Seq.empty
      else new String(bytes, "UTF-8").split("\f", -1).toSeq
  }

  /** Deterministic stub ASR: one 5-second segment per line of the
    * payload interpreted as text. */
  object LineSegmentAsr extends AsrService {
    def transcribe(bytes: Array[Byte]): Seq[(Double, Double, String)] =
      if (bytes == null || bytes.isEmpty) Seq.empty
      else new String(bytes, "UTF-8").split("\n", -1).toIndexedSeq
        .filter(_.nonEmpty)
        .zipWithIndex
        .map { case (l, i) => (i * 5.0, (i + 1) * 5.0, l) }
  }

  private val PageSchema = StructType(Seq(
    StructField("source_file", StringType),
    StructField("page", IntegerType, nullable = false),
    StructField("page_text", StringType)))

  /** S2: explode a binary document column into one row per page.
    * Extractor initializes once per partition; pages stream out. */
  def extractPages(docs: DataFrame, fileCol: String, bytesCol: String,
      extractor: PageExtractor): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(PageSchema)
    docs.select(col(fileCol), col(bytesCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          extractor.pages(r.getAs[Array[Byte]](1)).zipWithIndex.map {
            case (text, i) => Row(r.getString(0), i + 1, text)
          }
        }
      }(enc)
  }

  private val SegmentSchema = StructType(Seq(
    StructField("source_file", StringType),
    StructField("segment_index", IntegerType, nullable = false),
    StructField("start_sec", DoubleType, nullable = false),
    StructField("end_sec", DoubleType, nullable = false),
    StructField("segment_text", StringType)))

  /** S5: media → transcript segments, one row each. */
  def transcribe(media: DataFrame, fileCol: String, bytesCol: String,
      asr: AsrService): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(SegmentSchema)
    media.select(col(fileCol), col(bytesCol))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          asr.transcribe(r.getAs[Array[Byte]](1)).zipWithIndex.map {
            case ((s, e, t), i) => Row(r.getString(0), i, s, e, t)
          }
        }
      }(enc)
  }

  /** S3: the PDF→OCR fallback tier. Pages whose text layer fails the
    * quality gate (`is_bad_ocr`, the reference's 3-tier short-circuit
    * `gatekeeper_logic.py:348-365`) are routed through the external
    * [[OcrService]]; pages with a good text layer bypass it entirely
    * — the cheap predicate is evaluated as a Catalyst column BEFORE
    * the per-partition service loop, so the expensive tier only ever
    * sees failing rows. Appends `extracted_text` (winning tier's
    * text) and `extract_engine` ("text-layer" or the OCR worker's
    * engine name). `imageCol` is the page's rasterized grayscale
    * buffer with `heightCol`/`widthCol` shape — rasterization itself
    * is upstream (no JDK PDF renderer; the multimodal decode path
    * produces these for image-born pages). */
  def ocrFallback(pages: DataFrame, fileCol: String, pageCol: String,
      textCol: String, imageCol: String, heightCol: String,
      widthCol: String, ocr: OcrService): DataFrame = {
    val routed = pages.withColumn("_tier",
      when(!graft.functions.TextFunctions.isBadOcr(col(textCol)),
        lit("text_layer")).otherwise(lit("ocr")))
    val schema = StructType(routed.schema.fields.toSeq
      .filterNot(_.name == "_tier") :+
      StructField("extracted_text", StringType) :+
      StructField("extract_engine", StringType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val idx = Map("file" -> routed.schema.fieldIndex(fileCol),
      "page" -> routed.schema.fieldIndex(pageCol),
      "text" -> routed.schema.fieldIndex(textCol),
      "img" -> routed.schema.fieldIndex(imageCol),
      "h" -> routed.schema.fieldIndex(heightCol),
      "w" -> routed.schema.fieldIndex(widthCol))
    val tierIdx = routed.schema.fieldIndex("_tier")
    routed.mapPartitions { rows =>
      rows.map { r =>
        val out = r.toSeq.patch(tierIdx, Nil, 1)
        if (r.getString(tierIdx) == "text_layer")
          Row.fromSeq(out :+ r.getString(idx("text")) :+ "text-layer")
        else {
          val res = ocr.ocrPage(r.getAs[Array[Byte]](idx("img")),
            r.getInt(idx("h")), r.getInt(idx("w")),
            r.getString(idx("file")), r.getInt(idx("page")))
          Row.fromSeq(out :+ res.text :+ res.engine)
        }
      }
    }(enc)
  }

  /** C5: batch pages into groups of `batchSize`, each tagged with its
    * `### [INTERNAL_PAGE_n]` anchor and concatenated — the gatekeeper
    * batching that feeds LLM normalization
    * (`gatekeeper_logic.py:208-231`, GATEKEEPER_BATCH_SIZE=5). */
  def batchPages(pages: DataFrame, batchSize: Int = 5): DataFrame =
    pages
      .withColumn("batch_id",
        floor((col("page") - 1) / batchSize).cast("int"))
      .withColumn("tagged",
        concat(lit("### [INTERNAL_PAGE_"), col("page"), lit("]\n"),
          col("page_text")))
      .groupBy(col("source_file"), col("batch_id"))
      .agg(concat_ws("\n",
        array_sort(collect_list(struct(col("page"), col("tagged"))))
          .getField("tagged")).as("batch_text"))
}
