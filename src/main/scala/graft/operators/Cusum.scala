package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upper-CUSUM change detection (Page 1954) over an ordered count
  * series — the sequential drift alarm for per-day error rates,
  * refusal counts, filter-attrition series: S_t = max(0, S_{t−1} +
  * x_t − k), alarm when S_t > h.
  *
  * The recursion looks inherently sequential, but the prefix
  * identity S_t = C_t − min(0, min_{j≤t} C_j) (C = running sum of
  * x − k) makes it TWO plain windows — exact, integer, and
  * replayable. Series are per-group and time-bucketed, so windows
  * are bucket-count-bounded, never corpus-bounded. */
object Cusum {

  /** Per-group upper CUSUM: returns `(groupCols…, orderCol, x,
    * cusum, alarm)`. `k` is the reference (allowed) level per
    * bucket, `h` the alarm threshold. */
  def upperCusum(df: DataFrame, groupCols: Seq[String],
      orderCol: String, xCol: String, k: Long, h: Long): DataFrame = {
    val w = (if (groupCols.isEmpty)
        Window.orderBy(col(orderCol))
      else Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col(orderCol)))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__c", sum(col(xCol).cast("long") - k).over(w))
      .withColumn("cusum",
        col("__c") - least(lit(0L), min(col("__c")).over(w)))
      .withColumn("alarm", col("cusum") > h)
      .drop("__c")
  }
}
