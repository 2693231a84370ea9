package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.operators.{Chunker, WhitespaceTokenizer}

/** Custom Catalyst `Generator` for the hierarchical markdown split
  * (SURVEY §4 custom-generator item: C1/C2 as a true one-to-many
  * expression). Unlike the UDF-returning-array + explode formulation,
  * rows stream straight out of eval — no per-document array of chunk
  * structs is materialized and serialized through the UDF boundary.
  *
  * Emits (text, page, h1, h2, chunk_index, total_chunks) per piece,
  * with the reference's zero-drop token-window semantics
  * (`processors/text_processor.py:23-147`).
  */
case class SplitMarkdownGenerator(child: Expression, budget: Int,
    overlap: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("page", IntegerType, nullable = false),
    StructField("h1", StringType, nullable = false),
    StructField("h2", StringType, nullable = false),
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("total_chunks", IntegerType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"split_markdown requires STRING input, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val md = child.eval(input).asInstanceOf[UTF8String]
    if (md == null) Iterator.empty
    else Chunker.splitMarkdown(md.toString, WhitespaceTokenizer,
        budget, overlap).iterator.map { p =>
      InternalRow(UTF8String.fromString(p.text), p.page,
        UTF8String.fromString(p.h1), UTF8String.fromString(p.h2),
        p.chunkIndex, p.totalChunks)
    }
  }

  override protected def withNewChildInternal(c: Expression)
      : SplitMarkdownGenerator = copy(child = c)
}
