package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spearman rank correlation between quality signals — the
  * datasheet table that answers "which of my curation signals are
  * redundant?" (two signals with ρ ≈ 1 gate the same documents —
  * one of them is wasted compute at 100 TB).
  *
  * Exactness device: with ties handled by AVERAGE ranks, the
  * doubled average rank 2r̄(v) = 2·|{u < v}| + |{u = v}| + 1 is an
  * INTEGER, so every Pearson moment over doubled ranks is an exact
  * integer aggregate (order-free under any partitioning); moments
  * run over DECIMAL(38,0) — headroom past 10⁷ rows per fit, where
  * raw BIGINT fourth-order moments would wrap — and the only
  * floating-point steps are the final casts, one multiply, one
  * division, and one sqrt — and IEEE-754 sqrt is correctly rounded
  * in every conforming engine, so the final double is
  * bit-identical.
  *
  * Scale shape: per signal, one per-value count aggregate plus a
  * prefix-sum window over the DISTINCT-VALUE frame (value-
  * cardinality-bounded, not corpus-bounded), broadcast-joined back;
  * then one moment aggregate per signal pair. No corpus-sized
  * windows. */
object RankCorrelation {

  /** Doubled-average-rank frame for one signal: `(id, dr)` with
    * dr = 2·r̄ as a long. */
  private def doubledRanks(df: DataFrame, idCol: String,
      sigCol: String): DataFrame = {
    val cnts = df.groupBy(col(sigCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val ranked = cnts
      .withColumn("__less", coalesce(sum(col("__c")).over(w), lit(0L)))
      .withColumn("__dr", lit(2L) * col("__less") + col("__c") + 1L)
      .select(col("__v"), col("__dr"))
    df.select(col(idCol).as("__id"), col(sigCol).as("__v"))
      .join(broadcast(ranked), Seq("__v"))
      .select(col("__id"), col("__dr"))
  }

  /** Spearman ρ for every unordered pair of `signalCols` (numeric
    * columns of `df`). One row per pair: `(sig_a, sig_b, n, rho)`
    * with ρ = num / sqrt(var_a · var_b) over the doubled-rank
    * moments, all moments exact in DECIMAL(38,0). */
  def spearmanPairs(df: DataFrame, idCol: String,
      signalCols: Seq[String]): DataFrame = {
    require(signalCols.size >= 2, "need at least two signals")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ranks = signalCols.map { s =>
      s -> doubledRanks(df, idCol, s)
        .withColumnRenamed("__dr", s"__dr_$s")
    }.toMap
    val pairs = for {
      i <- signalCols.indices; j <- signalCols.indices if i < j
    } yield (signalCols(i), signalCols(j))
    pairs.map { case (a, b) =>
      val joined = ranks(a).join(ranks(b), Seq("__id"))
      val m = joined.agg(count(lit(1)).as("n"),
        sum(col(s"__dr_$a").cast(dec)).as("sx"),
        sum(col(s"__dr_$b").cast(dec)).as("sy"),
        sum((col(s"__dr_$a") * col(s"__dr_$a")).cast(dec)).as("sxx"),
        sum((col(s"__dr_$a") * col(s"__dr_$b")).cast(dec)).as("sxy"),
        sum((col(s"__dr_$b") * col(s"__dr_$b")).cast(dec)).as("syy"))
      val num = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double")
      val varA = (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double")
      val varB = (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double")
      m.select(lit(a).as("sig_a"), lit(b).as("sig_b"), col("n"),
        (num / sqrt(varA * varB)).as("rho"))
    }.reduce(_ unionByName _)
  }
}
