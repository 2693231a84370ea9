package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst `Generator` emitting every ORDERED index pair
  * (arr(i), arr(j)), i < j, from an array column — the wedge
  * enumeration primitive for co-citation / shared-neighbor queries
  * (SURVEY §2.14 custom-generator family, the q179 edge-iterator
  * companion).
  *
  * vs the self-join formulation (`mids m1 JOIN mids m2 ON m1.n =
  * m2.n AND m1.x < m2.x`): the adjacency rides ONE groupBy shuffle
  * as packed arrays (Σ deg ints, not Σ deg rows twice), pairs stream
  * straight out of eval with no join machinery and no m1.x > m2.x
  * half ever existing — half the generated rows, zero SMJ sort. The
  * Σ C(deg, 2) wedge volume still exists, but only as generator
  * OUTPUT feeding a map-side-combined count, never as a shuffled or
  * sorted join input. Feed it a `sort_array`-ed array and the pairs
  * come out already (a < b)-canonical.
  *
  * The per-row output is lazily iterated — a hot node's C(deg, 2)
  * pairs are never materialized as one in-memory collection. */
case class OrderedPairsGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def elementSchema: StructType = StructType(Seq(
    StructField("a", elemType, nullable = true),
    StructField("b", elemType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ordered_pairs requires ARRAY input, got $other")
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) Iterator.empty
    else {
      val n = arr.numElements()
      val et = elemType
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          val row = InternalRow(arr.get(i, et), arr.get(j, et))
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression)
      : OrderedPairsGenerator = copy(child = c)
}
