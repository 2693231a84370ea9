package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-dimensional SKYLINE (Pareto front) — the multi-objective
  * curation primitive ("shortest AND least repetitive", "cheapest
  * AND highest quality") that relational engines lack natively
  * (Börzsönyi et al. 2001). A point survives iff no other point is
  * ≤ in both dimensions and strictly < in at least one; both
  * dimensions MINIMIZE (negate a column to maximize it). Duplicate
  * points are all kept — identical points do not dominate each
  * other.
  *
  * Scale design (never a corpus×corpus nested loop):
  *  1. one hash aggregate to the per-x frame (x, min-y) — only the
  *     per-x minimum can be on the front, everything else is
  *     dominated by it;
  *  2. a B-bucket grid on x whose strict-prefix minima (a ≤B-row
  *     broadcast) prune every per-x row dominated across buckets;
  *  3. an EXACT within-bucket running-min window over the pruned
  *     residue (partitioned by bucket — bounded by candidates, and
  *     candidates are already near-front);
  *  4. a semi-join back to the input to emit every point sitting ON
  *     the front (duplicates included).
  *
  * Everything is integer/IEEE-deterministic (integer bucket
  * arithmetic, min aggregates, one strict comparison chain), so a
  * brute-force NOT EXISTS oracle replays the result exactly. */
object Skyline {

  /** Pareto front over integer `xCol` and numeric `yCol` (both
    * minimized). Returns the input rows on the front. `buckets`
    * sizes the prune grid only — never correctness. */
  def paretoFront(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 16): DataFrame = {
    require(buckets >= 1, "need at least one bucket")
    val pts = df.select(col(xCol).cast("long").as("__x"),
      col(yCol).cast("double").as("__y"))
    val perX = pts.groupBy(col("__x")).agg(min(col("__y")).as("__my"))
    val xs = perX.agg(min(col("__x")).as("__xmin"),
      max(col("__x")).as("__xmax"))
    // integer bucket index: exact in any engine
    val bucketed = perX.crossJoin(broadcast(xs))
      .withColumn("__b", when(col("__xmax") === col("__xmin"), lit(0L))
        .otherwise(least(
          (col("__x") - col("__xmin")) * buckets /
            (col("__xmax") - col("__xmin") + 1),
          lit(buckets - 1L))))
    val bmin = bucketed.groupBy(col("__b"))
      .agg(min(col("__my")).as("__bmy"))
    // strict-prefix minimum over the ≤B-row bucket frame
    val pw = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = bmin.withColumn("__pm", min(col("__bmy")).over(pw))
      .select(col("__b"), col("__pm"))
    val cand = bucketed.join(broadcast(prefix), Seq("__b"))
      .where(col("__pm").isNull || col("__my") < col("__pm"))
    // exact within-bucket pass: running strict-prefix min over x
    val ww = Window.partitionBy(col("__b")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = cand
      .withColumn("__rm", min(col("__my")).over(ww))
      .where(col("__rm").isNull || col("__my") < col("__rm"))
      .select(col("__x"), col("__my").as("__y"))
    df.join(front,
        col(xCol).cast("long") === col("__x") &&
          col(yCol).cast("double") === col("__y"),
        "left_semi")
  }
}
