package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union / coverage ("gaps and islands") — the multimodal
  * bookkeeping primitive: given transcribed/decoded/annotated
  * segments `[start, end)` per media item, how much of each item is
  * actually covered, in how many contiguous islands, and how big is
  * the covered span? The question every ASR/OCR/frame-sampling
  * pipeline answers before declaring an item processed (half-covered
  * audio is not transcribed audio).
  *
  * Semantics: touching segments (next.start = prev.end) MERGE —
  * coverage is over the half-open union. All arithmetic is integer.
  *
  * Scale shape: one shuffle on the media key; two windows
  * PARTITIONED BY media (running max-end to detect island breaks,
  * running sum to number islands) — state per partition is one row's
  * worth; then one hash aggregate per island and one per media. No
  * global windows, no self-joins. */
object Intervals {

  /** Per-media coverage: `(idCol, n_segments, n_islands,
    * covered_len, span_len)` with covered_len = |union of segments|
    * and span_len = max end − min start. Segments with end ≤ start
    * are rejected by precondition. */
  def mergedCoverage(df: DataFrame, idCol: String, startCol: String,
      endCol: String): DataFrame = {
    val seg = df.select(col(idCol).as("__m"),
      col(startCol).cast("long").as("__s"),
      col(endCol).cast("long").as("__e"))
    val order = Window.partitionBy(col("__m"))
      .orderBy(col("__s"), col("__e"))
    val prevMax = Window.partitionBy(col("__m"))
      .orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = seg
      .withColumn("__pm", max(col("__e")).over(prevMax))
      .withColumn("__new",
        when(col("__pm").isNull || col("__s") > col("__pm"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(order))
    val islands = marked.groupBy(col("__m"), col("__isl"))
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"),
        count(lit(1)).as("__n"))
    islands.groupBy(col("__m").as(idCol))
      .agg(sum(col("__n")).as("n_segments"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered_len"),
        (max(col("__ie")) - min(col("__is"))).as("span_len"))
  }
}
