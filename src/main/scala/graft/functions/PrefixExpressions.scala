package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd common-prefix length (in CODE POINTS) of two strings —
  * the LCP micro-kernel under [[graft.operators.SuffixArray]]'s
  * windowed compare loop.
  *
  * The r14 profile found the loop's per-pair cost dominated by the
  * old formulation: `zip_with(split(wa, ""), split(wb, ""), _ === _)`
  * plus `array_position` allocated ~2·window single-character STRING
  * objects per pair (8192 allocations at the 4096-char window) just
  * to find the first mismatch. This expression walks the two
  * UTF8String payloads code point by code point with zero
  * allocation: equal code points ⇔ equal UTF-8 byte sequences
  * (UTF-8 is injective), so the walk compares raw bytes and counts
  * completed code points — identical semantics to the zip_with form
  * (mismatch stops; the shorter string running out stops at its
  * length, the null-padded "no false flag" case).
  */
case class CommonPrefixChars(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"common_prefix_chars requires STRING inputs, got " +
          s"${left.dataType} / ${right.dataType}")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    CommonPrefixChars.cpl(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixChars.cpl($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CommonPrefixChars = copy(left = l, right = r)
}

object CommonPrefixChars {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form. */
  def of(a: Column, b: Column): Column =
    ColumnBridge.column(CommonPrefixChars(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Matched code-point count of the longest common prefix. A code
    * point counts only when ALL its bytes match (a mid-code-point
    * byte mismatch leaves that code point unmatched). */
  def cpl(a: UTF8String, b: UTF8String): Long = {
    val na = a.numBytes()
    val nb = b.numBytes()
    val n = math.min(na, nb)
    var i = 0
    var cps = 0L
    while (i < n) {
      val ba = a.getByte(i)
      if (ba != b.getByte(i)) return cps
      // length of the code point starting at this byte
      val len =
        if ((ba & 0x80) == 0) 1
        else if ((ba & 0xE0) == 0xC0) 2
        else if ((ba & 0xF0) == 0xE0) 3
        else 4
      if (i + len > n) return cps // truncated tail can't fully match
      var j = i + 1
      val end = i + len
      while (j < end) {
        if (a.getByte(j) != b.getByte(j)) return cps
        j += 1
      }
      cps += 1
      i = end
    }
    cps
  }
}
