package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-fairness auditing for corpus curation gates (builder brief:
  * a large-scale training-data pipeline's quality filters are
  * classifiers, and classifiers get audited for disparate impact —
  * a Latin-centric quality gate silently deciding "low quality" for
  * most of one language is a curation bug with documented downstream
  * harm).
  *
  * Model (the EEOC "four-fifths rule"; Feldman et al., KDD 2015,
  * "Certifying and removing disparate impact"): per protected group
  * g, the selection rate r_g = accepted_g / n_g; the audit compares
  * every group to the BEST-OFF group (highest rate, ties broken by
  * group name) and flags groups whose impact ratio r_g / r_ref falls
  * below 0.8. The flag is computed on cross-multiplied INTEGERS
  * (10·acc_g·n_ref ≥ 8·acc_ref·n_g) so the 0.8 boundary is exact —
  * never a float-rounded rate comparison; the double ratio and
  * statistical-parity difference ride along for reporting.
  *
  * Scale shape: ONE aggregate over the group column (map-side
  * combined), a 1-row reference frame broadcast back — the audit
  * never touches row×row work and adds nothing data-sized beyond
  * the single aggregate pass.
  */
object Fairness {

  private val Dec38 = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Per-group disparate-impact audit of a boolean acceptance
    * column. Output: (groupName, n_total, n_accepted, accept_rate,
    * ref_group, impact_ratio, four_fifths_ok, parity_diff). A null
    * acceptance counts as rejected (both engines' CASE semantics). */
  def disparateImpact(df: DataFrame, groupCol: Column,
      groupName: String, acceptedCol: Column): DataFrame =
    auditFromCounts(
      df.select(groupCol.as(groupName), acceptedCol.as("__acc"))
        .groupBy(col(groupName))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("__acc"), lit(1L)).otherwise(lit(0L)))
            .as("n_accepted")),
      groupName)

  /** The audit arithmetic over a PRE-AGGREGATED
    * (group, n_total, n_accepted) counter table — shared by
    * [[disparateImpact]] and the streaming monitor's live counter
    * snapshots ([[graft.streaming.StreamingOps]]), so the flag a
    * dashboard shows mid-stream is the exact batch decision. */
  def auditFromCounts(counts: DataFrame,
      groupName: String): DataFrame = {
    // counter table materialized once: the reference row below is a
    // second consumer, and without the checkpoint it would re-run
    // the upstream aggregate
    val g = counts
      .withColumn("accept_rate",
        col("n_accepted").cast("double") / col("n_total"))
      .localCheckpoint()
    val ref = g.orderBy(col("accept_rate").desc, col(groupName))
      .limit(1)
      .select(col(groupName).as("ref_group"),
        col("n_total").as("__rn"), col("n_accepted").as("__ra"))
    g.crossJoin(broadcast(ref))
      .withColumn("impact_ratio",
        col("accept_rate") /
          (col("__ra").cast("double") / col("__rn")))
      .withColumn("four_fifths_ok",
        // DECIMAL(38,0), not BIGINT: acc·n·10 overflows int64 once
        // group sizes pass ~10^9 (trillion-doc corpora); DuckDB's
        // HUGEINT SUM mirrors the exact wide product
        col("n_accepted").cast(Dec38) * col("__rn") * lit(10L) >=
          col("__ra").cast(Dec38) * col("n_total") * lit(8L))
      .withColumn("parity_diff",
        col("accept_rate") - col("__ra").cast("double") / col("__rn"))
      .drop("__rn", "__ra")
  }
}
