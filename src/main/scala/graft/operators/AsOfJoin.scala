package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Left as-of join — for every probe row, the single build row with
  * the greatest event time ≤ the probe's time, per key (time-series
  * attribution / point-in-time lookup; a training-pipeline staple
  * Spark has no native operator for).
  *
  * Shape (the 100 TB posture): NOT a range join — an inequality join
  * explodes into O(probe·build) pairs per key before its filter.
  * Instead both sides union into one frame, shuffle ONCE on the key,
  * and a single sort-window per key carries the latest build payload
  * forward (`last(_b) ignore nulls` over rows ≤ current). Cost is
  * the one exchange plus a per-key sort — the same shape as a
  * distributed merge join, with no intermediate pair blowup.
  *
  * Semantics: build rows at exactly the probe's timestamp DO match
  * (`≤`, the common as-of convention). Ties among build rows with
  * equal time resolve to the greatest `tieCol` — deterministic where
  * engines' native ASOF picks an arbitrary row.
  */
object AsOfJoin {

  /** @param probe       left side; all its columns survive
    * @param build       right side; `payloadCols` are carried over as
    *                    `asof_<name>` (null when no build row ≤ t)
    * @param keys        equality keys present on both sides
    * @param timeCol     event-time column present on both sides
    * @param tieCol      build-side total-order tiebreak for equal
    *                    timestamps (e.g. an event id)
    * @param payloadCols build-side columns to attach */
  def asOf(probe: DataFrame, build: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val probeCols = probe.columns.toSeq
    val payFields = (timeCol +: tieCol +: payloadCols).distinct
    val payType = StructType(payFields.map(f => build.schema(f)))
    val probeType = StructType(probeCols.map(f => probe.schema(f)))
    val p = probe.select(
      keys.map(col) ++ Seq(col(timeCol).as("_t"), lit(1).as("_side"),
        lit(null).cast("long").as("_tie"),
        lit(null).cast(payType).as("_b"),
        struct(probeCols.map(col): _*).as("_p")): _*)
    val b = build.select(
      keys.map(col) ++ Seq(col(timeCol).as("_t"), lit(0).as("_side"),
        col(tieCol).cast("long").as("_tie"),
        struct(payFields.map(col): _*).as("_b"),
        lit(null).cast(probeType).as("_p")): _*)
    // Build rows sort before probe rows at equal time (side 0 < 1) so
    // same-timestamp builds are visible to the probe; among equal
    // (t, side) build rows the greatest tie wins because last() takes
    // the final row of the ordered frame.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = p.unionByName(b)
      .withColumn("_asof", last(col("_b"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val out = probeCols.map(c => col("_p").getField(c).as(c)) ++
      payloadCols.map(c => col("_asof").getField(c).as(s"asof_$c"))
    matched.select(out: _*)
  }

  /** The same left-as-of-join contract planned through the engine's
    * CUSTOM PHYSICAL OPERATOR ([[graft.plans.AsOfJoinExec]] — logical
    * node + strategy + exec, SURVEY §2.14 option c) instead of the
    * union+window emulation above: both sides co-partitioned on the
    * keys, sorted in-partition, then a single O(L+R) merge pass that
    * holds one candidate build row — probe rows never enter a window
    * buffer and the union's row-widening disappears.
    *
    * AsOfJoinSpec pins `asOfMerge ≡ asOf` row-for-row; q104
    * value-checks it against the DuckDB oracle.
    *
    * Registers [[graft.plans.GraftAsOfStrategy]] on the session's
    * experimental strategies on first use (idempotent), so callers
    * need no session pre-configuration. */
  def asOfMerge(probe: DataFrame, build: DataFrame, keys: Seq[String],
      timeCol: String, tieCol: String,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    import org.apache.spark.sql.graftbridge.PlanBridge
    import graft.plans.{AsOfJoinNode, GraftAsOfStrategy}
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftAsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftAsOfStrategy
    def attrOf(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column $n not found among ${out.map(_.name).mkString(",")}"))
    val lPlan: LogicalPlan = probe.queryExecution.analyzed
    // Prune the build side to the referenced columns and RE-ALIAS to
    // fresh exprIds — binding stays unambiguous even when probe and
    // build derive from the same source (self-as-of).
    val rAnalyzed = build.queryExecution.analyzed
    val needed = (keys ++ Seq(timeCol, tieCol) ++ payloadCols).distinct
    val rPlan = Project(
      needed.map(n => Alias(attrOf(rAnalyzed.output, n), n)()), rAnalyzed)
    val lKeys = keys.map(attrOf(lPlan.output, _))
    val rKeys = keys.map(attrOf(rPlan.output, _))
    val lTime = attrOf(lPlan.output, timeCol)
    val rTime = attrOf(rPlan.output, timeCol)
    require(lKeys.map(_.dataType) == rKeys.map(_.dataType) &&
      lTime.dataType == rTime.dataType,
      "as-of key/time column types must match across sides")
    val payloadAttrs = payloadCols.map(attrOf(rPlan.output, _))
    val payloadOut = payloadAttrs.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    PlanBridge.ofRows(spark, AsOfJoinNode(lPlan, rPlan, lKeys, rKeys,
      lTime, rTime, attrOf(rPlan.output, tieCol), payloadAttrs,
      payloadOut))
  }
}
