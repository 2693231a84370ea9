package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
  * 1969) with EM parameter estimation (Winkler 1988) — the
  * entity-resolution machinery behind deduplicating user records,
  * author tables, and crawl metadata when no shared key exists:
  * given blocked candidate pairs and per-field AGREEMENT flags,
  * learn m_f = P(agree_f | match), u_f = P(agree_f | non-match) and
  * the match prevalence λ, unsupervised, then score each pair by
  * its posterior match probability.
  *
  * EM rounds (conditional independence across fields):
  *   E: w(pair) = λ·Π_f m-term / (λ·Π m-term + (1−λ)·Π u-term)
  *   M: m_f = Σ w·a_f / Σ w,  u_f = Σ (1−w)·a_f / Σ (1−w),
  *      λ = Σ w / N
  *
  * Exactness device (the Graph/BT contract, 9-decimal grade): every
  * per-pair weight and its complement is truncated to 9 decimals,
  * every sum runs over DECIMAL(38,9) (order-free), every updated
  * parameter is re-truncated — so R rounds replay bit-identically in
  * an unrolled SQL oracle. Products inside E are left-associated in
  * field order on both sides.
  *
  * Scale shape: the caller supplies BLOCKED pairs (blocking is what
  * makes linkage tractable — never all-pairs); each round is one
  * broadcast of the 1-row parameter frame + one aggregate over the
  * pair table with map-side partials. No driver state; rounds are
  * checkpointed. */
object RecordLinkage {

  private def t9(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  private def xsum(c: Column): Column =
    sum(c.cast(DecimalType(38, 9))).cast("double")

  /** Per-pair posterior weight under the CURRENT params frame
    * columns `m_i`/`u_i`/`lambda` (joined in). */
  private def weight(fields: Seq[String]): Column = {
    val num = fields.zipWithIndex.foldLeft(col("lambda")) {
      case (acc, (f, i)) => acc *
        when(col(f), col(s"m_$i")).otherwise(lit(1.0) - col(s"m_$i"))
    }
    val denU = fields.zipWithIndex.foldLeft(lit(1.0) - col("lambda")) {
      case (acc, (f, i)) => acc *
        when(col(f), col(s"u_$i")).otherwise(lit(1.0) - col(s"u_$i"))
    }
    t9(num / (num + denU))
  }

  /** EM fit over `pairs` whose `fields` columns are BOOLEAN
    * agreement flags. Returns one row per field:
    * `(field, m, u, lambda, n_pairs)` after `rounds` EM updates
    * from (mInit, uInit, lambdaInit). */
  def emFit(pairs: DataFrame, fields: Seq[String], rounds: Int = 3,
      mInit: Double = 0.9, uInit: Double = 0.1,
      lambdaInit: Double = 0.1): DataFrame = {
    require(fields.nonEmpty, "need at least one agreement field")
    require(rounds >= 1, "need at least one EM round")
    val spark = pairs.sparkSession
    val pr = pairs.select(fields.map(col): _*).localCheckpoint()
    var params = spark.range(1).select(
      fields.indices.flatMap(i => Seq(lit(mInit).as(s"m_$i"),
        lit(uInit).as(s"u_$i"))) :+ lit(lambdaInit).as("lambda"): _*)
    for (_ <- 1 to rounds) {
      val j = pr.crossJoin(broadcast(params))
        .withColumn("__w", weight(fields))
        .withColumn("__wc", t9(lit(1.0) - col("__w")))
      val aggs = Seq(xsum(col("__w")).as("sw"),
        xsum(col("__wc")).as("swc"),
        count(lit(1)).as("n")) ++
        fields.zipWithIndex.flatMap { case (f, i) => Seq(
          xsum(when(col(f), col("__w")).otherwise(lit(0.0)))
            .as(s"swa_$i"),
          xsum(when(col(f), col("__wc")).otherwise(lit(0.0)))
            .as(s"swca_$i")) }
      val m = j.agg(aggs.head, aggs.tail: _*)
      params = m.select(
        fields.indices.flatMap(i => Seq(
          t9(col(s"swa_$i") / col("sw")).as(s"m_$i"),
          t9(col(s"swca_$i") / col("swc")).as(s"u_$i"))) :+
          t9(col("sw") / col("n").cast("double")).as("lambda"): _*)
        .localCheckpoint()
    }
    val n = pr.agg(count(lit(1)).as("n_pairs"))
    fields.zipWithIndex.map { case (f, i) =>
      params.select(lit(f).as("field"), col(s"m_$i").as("m"),
        col(s"u_$i").as("u"), col("lambda"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(n))
  }

  /** Posterior match probability per pair under FIXED params (the
    * scoring pass once [[emFit]] has converged): returns `pairs`
    * plus a `posterior` column. `params` is [[emFit]]'s output. */
  def score(pairs: DataFrame, fields: Seq[String],
      params: DataFrame): DataFrame = {
    val wide = fields.zipWithIndex.map { case (f, i) =>
      params.where(col("field") === f)
        .select(col("m").as(s"m_$i"), col("u").as(s"u_$i"),
          col("lambda"))
    }.reduce((a, b) => a.crossJoin(b.drop("lambda")))
    pairs.crossJoin(broadcast(wide))
      .withColumn("posterior", weight(fields))
      .drop(fields.indices.flatMap(i =>
        Seq(s"m_$i", s"u_$i")) :+ "lambda": _*)
  }
}
