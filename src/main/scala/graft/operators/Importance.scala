package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    // One explode + immediate map-side-combinable pre-aggregation to
    // (doc, bucket) histograms — every downstream table (per-bucket
    // counts, corpus totals, per-doc weights) derives from this small
    // frame, so the token stream (and its per-token md5) is scanned
    // exactly once. n · round9(lr) is EXACTLY the decimal sum of n
    // per-token round9(lr) terms, so the collapsed aggregation is
    // bit-identical to the per-occurrence form the oracle computes.
    val docBuckets = df
      .select(col(idCol).as("doc"), isTarget.as("tgt"),
        explode(graft.functions.TextFunctions.cjkAwareTokens(
          col(textCol))).as("w"))
      .groupBy(col("doc"), col("tgt"),
        featureBucket(col("w"), buckets).as("b"))
      .agg(count(lit(1)).as("n"))
    val counts = docBuckets.groupBy(col("b").as("cb"))
      .agg(sum(col("n")).as("cs"),
        sum(when(col("tgt"), col("n")).otherwise(0L)).as("ct"))
    // Corpus totals as a global window over the bucket table — the
    // frame is ≤ `buckets` rows BY CONSTRUCTION (a fixed-size model,
    // not data-sized), so the single-partition window is scale-safe
    // and saves a separate aggregate + broadcast-join round trip.
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val k = lit(buckets.toDouble * alpha)
    val a = lit(alpha)
    val logRatio = counts
      .withColumn("cs_tot", sum(col("cs")).over(whole))
      .withColumn("ct_tot", sum(col("ct")).over(whole))
      .select(col("cb"),
        (ln9((col("ct") + a) / (col("ct_tot") + k)) -
          ln9((col("cs") + a) / (col("cs_tot") + k))).as("lr"))
    docBuckets
      .join(broadcast(logRatio), col("b") === col("cb"))
      .groupBy(col("doc").as(idCol))
      .agg(
        sum(col("n")).as("n_tokens"),
        // n as DECIMAL(12,0) keeps the product inside 38-digit
        // precision (12+18+1=31) — a bare LONG would promote to
        // precision 39 and silently trim the scale.
        sum(col("n").cast(DecimalType(12, 0)) *
          col("lr").cast(DecimalType(18, 9)))
          .cast("double").as("dsir_logweight"))
      .orderBy(col(idCol))
  }
}
