package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lifecycle state machine re-expression (SURVEY §1.1: the reference's
  * `ingestion_lifecycle` table does in-place `UPDATE … RETURNING`
  * claims; Spark has no in-place update, so transitions become an
  * append-only event log and the "table" is a latest-state view).
  */
object Lifecycle {

  /** Latest status per entity from an append-only transition log —
    * the arg-max pattern with a full deterministic tiebreak
    * (ts desc, then event id desc). */
  def statusView(log: DataFrame, entityCol: String, statusCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(desc(tsCol), desc(tieCol))
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Phase-latency stats (A2/A3, `docs/analytics.md:56-94`): seconds
    * between consecutive transitions of each entity, aggregated per
    * (from → to) phase pair. */
  def phaseLatencies(log: DataFrame, entityCol: String,
      statusCol: String, tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    log
      .withColumn("prev_status", lag(col(statusCol), 1).over(w))
      .withColumn("prev_us", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("prev_status").isNotNull)
      .withColumn("latency_sec",
        (unix_micros(col(tsCol)) - col("prev_us")).cast("double")
          / 1000000.0)
      .groupBy(col("prev_status").as("from_status"),
        col(statusCol).as("to_status"))
      .agg(
        count(lit(1)).as("n"),
        min(col("latency_sec")).as("min_sec"),
        max(col("latency_sec")).as("max_sec"))
  }
}
