package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Privacy
import Tables._

/** Data-governance / release-planning extension family (builder
  * brief): the audits and planning tables a corpus RELEASE needs
  * beyond curation itself — disclosure-risk audits (k-anonymity /
  * l-diversity, generalization ladders) over user-linked tables, and
  * the shard/calibration planning ops added alongside. Every query
  * is value-checked against a DuckDB oracle replaying the identical
  * decision arithmetic.
  */
object GovernanceQueries {

  /** q271: per-QI-group disclosure audit over `customer`
    * ([[Privacy.kAnonymityAudit]]): QIs = (nation, 1000-width
    * account-balance bin), sensitive attribute = market segment;
    * k=5, l=3. ONE hash aggregate over the QI tuple — the audit a
    * release datasheet embeds verbatim. */
  def q271KAnonymityAudit(s: SparkSession, d: String): DataFrame =
    Privacy.kAnonymityAudit(customer(s, d),
        quasiCols = Seq(col("c_nationkey"),
          Privacy.bin(col("c_acctbal"), 1000.0)),
        quasiNames = Seq("c_nationkey", "bal_bucket"),
        sensitiveCol = col("c_mktsegment"), k = 5, l = 3)
      .orderBy(col("c_nationkey"), col("bal_bucket"))

  private val q271Oracle: String =
    """SELECT c_nationkey,
      |  CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
      |  COUNT(*) AS group_size,
      |  COUNT(DISTINCT c_mktsegment) AS l_diversity,
      |  COUNT(*) >= 5 AS k_anonymous,
      |  COUNT(DISTINCT c_mktsegment) >= 3 AS l_diverse
      |FROM customer
      |GROUP BY 1, 2
      |ORDER BY c_nationkey, bal_bucket""".stripMargin

  /** q272: generalization-ladder release plan
    * ([[Privacy.generalizationLadder]]) — every customer anchored at
    * the finest balance-bin width (100 → 500 → 2000 → 10000) at
    * which its (segment × bin) group reaches k=8, rows failing all
    * rungs suppressed; reported as the per-rung release summary (at
    * sf0.01 three distinct rungs anchor rows, so the gate exercises
    * the rung choice, not one degenerate level). Four QI aggregates
    * + four grouped-key joins — the group tables are tiny relative
    * to the corpus. */
  def q272GeneralizationLadder(s: SparkSession, d: String): DataFrame =
    Privacy.generalizationLadder(customer(s, d),
        catQuasi = Seq(col("c_mktsegment")),
        catNames = Seq("c_mktsegment"), numCol = col("c_acctbal"),
        widths = Seq(100.0, 500.0, 2000.0, 10000.0), k = 8)
      .groupBy(col("anchor_level"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("anchor_group_size")).as("min_group_size"),
        max(col("anchor_group_size")).as("max_group_size"))
      .orderBy(col("anchor_level"))

  private val q272Oracle: String =
    """WITH b AS (
      |  SELECT c_custkey, c_mktsegment AS seg,
      |    CAST(FLOOR(c_acctbal / 100.0) AS BIGINT) AS b0,
      |    CAST(FLOOR(c_acctbal / 500.0) AS BIGINT) AS b1,
      |    CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS b2,
      |    CAST(FLOOR(c_acctbal / 10000.0) AS BIGINT) AS b3
      |  FROM customer),
      |g0 AS (SELECT seg, b0, COUNT(*) AS gs0 FROM b GROUP BY 1, 2),
      |g1 AS (SELECT seg, b1, COUNT(*) AS gs1 FROM b GROUP BY 1, 2),
      |g2 AS (SELECT seg, b2, COUNT(*) AS gs2 FROM b GROUP BY 1, 2),
      |g3 AS (SELECT seg, b3, COUNT(*) AS gs3 FROM b GROUP BY 1, 2),
      |j AS (
      |  SELECT b.c_custkey, gs0, gs1, gs2, gs3
      |  FROM b
      |  JOIN g0 USING (seg, b0)
      |  JOIN g1 USING (seg, b1)
      |  JOIN g2 USING (seg, b2)
      |  JOIN g3 USING (seg, b3)),
      |a AS (
      |  SELECT
      |    CASE WHEN gs0 >= 8 THEN 'w100'
      |         WHEN gs1 >= 8 THEN 'w500'
      |         WHEN gs2 >= 8 THEN 'w2000'
      |         WHEN gs3 >= 8 THEN 'w10000'
      |         ELSE 'suppressed' END AS anchor_level,
      |    CASE WHEN gs0 >= 8 THEN gs0
      |         WHEN gs1 >= 8 THEN gs1
      |         WHEN gs2 >= 8 THEN gs2
      |         WHEN gs3 >= 8 THEN gs3 END AS ags
      |  FROM j)
      |SELECT anchor_level, COUNT(*) AS n_rows,
      |  MIN(ags) AS min_group_size, MAX(ags) AS max_group_size
      |FROM a GROUP BY anchor_level ORDER BY anchor_level""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q271_k_anonymity_audit" -> (q271KAnonymityAudit _),
    "q272_generalization_ladder" -> (q272GeneralizationLadder _),
  )

  val oracle: Map[String, String] = Map(
    "q271_k_anonymity_audit" -> q271Oracle,
    "q272_generalization_ladder" -> q272Oracle,
  )
}
