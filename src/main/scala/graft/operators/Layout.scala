package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at 100 TB: Z-order (Morton)
  * clustering co-locates rows that are close in a 2-D key space, so
  * parquet footer min/max statistics prune files for range predicates
  * on EITHER dimension — the public technique behind Delta's
  * `OPTIMIZE ZORDER BY`, Hudi and Iceberg clustering (Morton 1966).
  *
  * Everything here is shift/mask column arithmetic — pure codegen, no
  * UDF — followed by one `repartitionByRange` exchange on the derived
  * z-value. At scale that is exactly the cost of any global layout
  * rewrite (one shuffle), amortized over every subsequent pruned scan.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * ints: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Long arithmetic throughout (bits=16 reaches position 31). */
  def morton2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Equal-width bucket of `c` into [0, 2^bits) given the column's
    * observed [lo, hi] — the quantization step before interleaving.
    * Values at `hi` land in the top bucket; a degenerate lo==hi
    * domain collapses to bucket 0. */
  def widthBucket(c: Column, lo: Double, hi: Double,
      bits: Int): Column = {
    val buckets = (1L << bits).toDouble
    if (hi <= lo) lit(0L)
    else least(
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(buckets))
        .cast("long"),
      lit((1L << bits) - 1L))
  }

  /** Hilbert-curve index of a (x, y) cell (Hilbert 1891; the
    * locality-tighter alternative to Morton used by e.g. Delta's
    * experimental clustering): consecutive curve positions are ALWAYS
    * grid-adjacent, where the Z-curve jumps across the space at
    * quadrant boundaries — so range scans over the curve value touch
    * tighter bounding boxes (LayoutSpec proves the adjacency property
    * exhaustively on a 16×16 grid).
    *
    * The standard xy2d walk carries rotation state bit by bit — an
    * inherently sequential 16-step loop whose pure-expression form
    * doubles the tree per level (the rotated x/y feed the next
    * level), so this is one of the engine's justified scalar UDFs
    * (same rationale as `simhashOf`: per-row state machine, O(bits)
    * work, no data-dependent allocation). */
  def hilbert2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val f = udf { (xi: Long, yi: Long) =>
      var rx = 0L; var ry = 0L; var d = 0L
      var xx = xi; var yy = yi
      var s = 1L << (bits - 1)
      while (s > 0) {
        rx = if ((xx & s) > 0) 1L else 0L
        ry = if ((yy & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0L) { // rotate quadrant
          if (rx == 1L) { xx = s - 1 - xx; yy = s - 1 - yy }
          val t = xx; xx = yy; yy = t
        }
        s >>= 1
      }
      d
    }
    f(x.cast("long"), y.cast("long"))
  }

  /** [[zorderBy]] with the Hilbert curve as the clustering key —
    * same quantize → curve-index → range-partition shape, tighter
    * per-file bounding boxes. Adds `hval`. */
  def hilbertBy(df: DataFrame, colA: String, colB: String,
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    val Array(loA, hiA, loB, hiB) = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head().toSeq.map(v => if (v == null) 0.0
        else v.asInstanceOf[Double]).toArray
    val h = hilbert2(
      widthBucket(col(colA), loA, hiA, bits),
      widthBucket(col(colB), loB, hiB, bits), bits)
    val withH = df.withColumn("hval", h)
    val parted =
      if (partitions > 0) withH.repartitionByRange(partitions, col("hval"))
      else withH.repartitionByRange(col("hval"))
    parted.sortWithinPartitions(col("hval"))
  }

  /** Z-order `df` by two numeric columns: quantize each into 2^bits
    * equal-width buckets (bounds from one min/max aggregation — four
    * scalars to the driver), Morton-interleave, then range-partition
    * and sort by the z-value. The returned frame carries a `zval`
    * column; writing it partition-by-partition yields files whose
    * (colA, colB) bounding boxes tile the space instead of striping
    * it — LayoutSpec measures the bounding-box shrinkage vs the
    * arrival order. */
  def zorderBy(df: DataFrame, colA: String, colB: String,
      bits: Int = 16, partitions: Int = 0): DataFrame = {
    val Array(loA, hiA, loB, hiB) = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head().toSeq.map(v => if (v == null) 0.0
        else v.asInstanceOf[Double]).toArray
    val z = morton2(
      widthBucket(col(colA), loA, hiA, bits),
      widthBucket(col(colB), loB, hiB, bits), bits)
    val withZ = df.withColumn("zval", z)
    val parted =
      if (partitions > 0) withZ.repartitionByRange(partitions, col("zval"))
      else withZ.repartitionByRange(col("zval"))
    parted.sortWithinPartitions(col("zval"))
  }
}
