package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data Selection with Importance Resampling (DSIR — Xie et al. 2023)
  * for training-data pipelines: score every corpus document by how
  * much more likely its hashed-n-gram features are under a target
  * distribution (a trusted high-quality slice) than under the raw
  * corpus, then keep/resample by that weight. This is the published
  * device for "select web data that looks like Wikipedia" at corpus
  * scale — the feature space is a fixed hash-bucket histogram, so the
  * model is two count vectors, never a neural scorer.
  *
  * Per document: log w(d) = Σ_{token t∈d} [ ln p̂_target(b(t)) −
  * ln p̂_source(b(t)) ], with add-α smoothed bucket probabilities
  * p̂(b) = (c(b)+α)/(C+αK) over K md5-hash buckets.
  *
  * Engine-portability: the bucket hash is the md5-prefix trick (same
  * as [[Split.splitBucket]] — codegen'd in Spark, reproducible in any
  * engine with md5); each ln is truncated to 9 decimals; the
  * per-document sum is an exact DECIMAL(18,9) aggregation, so the
  * result is bit-identical across engines and partitionings.
  *
  * Scale: one token-stream explode; the per-bucket log-ratio table has
  * exactly K rows (≤ a few thousand) and is BROADCAST back onto the
  * stream — no shuffle on the feature join; the only exchange is the
  * final per-document aggregate. Nothing driver-side, nothing
  * quadratic.
  */
object Importance {

  /** Truncated natural log, identical across engines at 9 decimals. */
  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  /** Deterministic md5-prefix feature bucket in [0, buckets). */
  def featureBucket(w: Column, buckets: Int): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long") % buckets

  /** Per-document DSIR log importance weight of the corpus against the
    * target slice selected by `isTarget` (a boolean column over df's
    * rows, e.g. `col("lang") === "en"`).
    *
    * Output: (idCol, n_tokens, dsir_logweight), ordered by idCol.
    * Positive weights read "more target-like than the corpus average".
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024,
      alpha: Double = 1.0): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc"), isTarget.as("tgt"),
        explode(split(col(textCol), " ")).as("w"))
      .select(col("doc"), col("tgt"),
        featureBucket(col("w"), buckets).as("b"))
    val counts = toks.groupBy(col("b").as("cb"))
      .agg(count(lit(1)).as("cs"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val totals = toks.agg(count(lit(1)).as("cs_tot"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct_tot"))
    val k = lit(buckets.toDouble * alpha)
    val a = lit(alpha)
    val logRatio = counts.crossJoin(broadcast(totals))
      .select(col("cb"),
        (ln9((col("ct") + a) / (col("ct_tot") + k)) -
          ln9((col("cs") + a) / (col("cs_tot") + k))).as("lr"))
    toks
      .join(broadcast(logRatio), col("b") === col("cb"))
      .groupBy(col("doc").as(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("lr").cast(DecimalType(18, 9))).cast("double")
          .as("dsir_logweight"))
      .orderBy(col(idCol))
  }
}
