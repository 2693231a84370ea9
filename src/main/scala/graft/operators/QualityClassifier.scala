package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Model-based quality filtering — the classifier leg of the published
  * corpus-curation recipes (GPT-3 appx A: a classifier trained
  * "WebText vs raw Common Crawl" gates the crawl; LLaMA §2.1 runs a
  * fastText linear classifier "Wikipedia-reference vs random pages").
  * The reference's pipeline gates documents with per-doc heuristics
  * (`utils/quality_gate.py`) — this is the LEARNED counterpart a
  * 100 TB pipeline adds when hand rules stop scaling: train a
  * seed-vs-rest model IN the engine, score every document, keep by
  * threshold.
  *
  * The model is multinomial Naive Bayes over hashed unigram buckets
  * (the fastText-class linear scorer, expressed as two count vectors):
  *
  *   logodds(d) = ln p̂(seed) − ln p̂(rest)
  *              + Σ_{token t∈d} [ ln p̂(b(t)|seed) − ln p̂(b(t)|rest) ]
  *
  * with add-α smoothing over the FULL K-bucket feature space, so
  * buckets never seen in training still contribute their smoothed
  * prior ratio (a subtle but load-bearing difference from
  * [[Importance.dsirWeights]], where source = the whole corpus and
  * every scored bucket is seen by construction).
  *
  * Engine-portability is the [[Importance]] contract: md5-prefix
  * feature buckets, each ln truncated to 9 decimals ([[ln9]]), all
  * sums exact DECIMAL(18,9) — bit-identical across engines and
  * partitionings, so the DuckDB oracle can replay training AND
  * scoring value-exactly.
  *
  * Scale shape: the training token stream aggregates straight to a
  * K-row count table (map-side combinable); the model (K rows ≤ a few
  * thousand) and the 1-row prior are BROADCAST onto the scoring
  * stream; the only exchange on the scoring side is the per-document
  * aggregate. Nothing driver-side, nothing proportional to corpus².
  */
object QualityClassifier {

  /** Truncated natural log, identical across engines at 9 decimals
    * (same device as [[Importance]]). */
  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  private val Dec = DecimalType(18, 9)

  /** Train on `train` (which must carry boolean `seedCol` — the
    * pseudo-label: "looks like the trusted slice") and score `score`.
    * Both need `idCol` + `textCol`; CJK-aware tokenization.
    *
    * Output: (idCol, n_tokens, nb_logodds, keep) ordered by idCol —
    * one row per scored document with ≥1 token (mirrored by the
    * oracle). `keep` = logodds > 0 (the "more seed-like than not"
    * threshold; callers with precision targets pick their own cut on
    * `nb_logodds`).
    */
  def trainScore(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, seedCol: String, buckets: Int = 1024,
      alpha: Double = 1.0): DataFrame = {
    val spark = train.sparkSession
    val k = lit(buckets.toDouble * alpha)
    val a = lit(alpha)

    // fan out the expression-dense token/hash passes when the scan
    // is one narrow split (the LangId/q157 device; no-op at scale)
    val trainW = graft.GraftSession.fanOutForCompute(train)

    // Class-conditional bucket counts from the training slice only —
    // one token explode, immediately collapsed to ≤K×2 rows.
    val counts = trainW
      .select(col(seedCol).as("sd"),
        explode(graft.functions.TextFunctions.cjkAwareTokens(
          col(textCol))).as("w"))
      .groupBy(Importance.featureBucket(col("w"), buckets).as("cb"))
      .agg(sum(when(col("sd"), 1L).otherwise(0L)).as("cseed"),
        sum(when(col("sd"), 0L).otherwise(1L)).as("crest"))

    // Densify to the FULL feature space: every bucket gets a log
    // ratio, seen in training or not. The frame is K rows BY
    // CONSTRUCTION, so the single-partition window for class totals
    // is scale-safe (the [[Importance.dsirWeights]] device).
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val model = spark.range(buckets).select(col("id").as("b"))
      .join(counts, col("b") === col("cb"), "left")
      .select(col("b"), coalesce(col("cseed"), lit(0L)).as("cseed"),
        coalesce(col("crest"), lit(0L)).as("crest"))
      .withColumn("tseed", sum(col("cseed")).over(whole))
      .withColumn("trest", sum(col("crest")).over(whole))
      .select(col("b"),
        (ln9((col("cseed") + a) / (col("tseed") + k)) -
          ln9((col("crest") + a) / (col("trest") + k))).as("lr"))

    // Class prior from training DOCUMENT counts, add-one smoothed
    // (a labeled class can be empty without a log-of-zero).
    val prior = train
      .agg(sum(when(col(seedCol), 1L).otherwise(0L)).as("nseed"),
        count(lit(1)).as("nall"))
      .select((ln9((col("nseed") + lit(1)) / (col("nall") + lit(2))) -
        ln9((col("nall") - col("nseed") + lit(1)) /
          (col("nall") + lit(2)))).as("prior"))

    // Score: per-doc bucket histogram × broadcast model; n·round9(lr)
    // is exactly the decimal sum of n per-occurrence terms.
    graft.GraftSession.fanOutForCompute(score)
      .select(col(idCol).as("doc"),
        explode(graft.functions.TextFunctions.cjkAwareTokens(
          col(textCol))).as("w"))
      .groupBy(col("doc"),
        Importance.featureBucket(col("w"), buckets).as("db"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(model), col("db") === col("b"))
      .groupBy(col("doc").as(idCol))
      .agg(sum(col("n")).as("n_tokens"),
        // n as DECIMAL(12,0): product stays inside 38-digit precision
        sum(col("n").cast(DecimalType(12, 0)) * col("lr").cast(Dec))
          .as("toksum"))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col("n_tokens"),
        // re-narrow the SUM result (DECIMAL(38,9)) before adding the
        // prior: 38,9 + 18,9 needs precision 39, and Spark's
        // precision-loss rule would silently round the 9th decimal
        // away (scale 8) — the one place the portability contract
        // can break without an overflow ever occurring
        (col("toksum").cast(Dec) + col("prior").cast(Dec))
          .cast("double").as("nb_logodds"))
      .withColumn("keep", col("nb_logodds") > 0.0)
      .orderBy(col(idCol))
  }

  /** Held-out evaluation of a scored frame against its true labels:
    * the confusion matrix + operating-point metrics a filtering run
    * reports before committing a threshold to 100 TB. One aggregate;
    * precision/recall/accuracy are single IEEE divisions of exact
    * long counts (deterministic across engines). */
  def confusion(scored: DataFrame, keepCol: String,
      truthCol: String): DataFrame =
    scored.agg(
      sum(when(col(keepCol) && col(truthCol), 1L).otherwise(0L)).as("tp"),
      sum(when(col(keepCol) && !col(truthCol), 1L).otherwise(0L)).as("fp"),
      sum(when(!col(keepCol) && col(truthCol), 1L).otherwise(0L)).as("fn"),
      sum(when(!col(keepCol) && !col(truthCol), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        (col("tp").cast("double") / (col("tp") + col("fp"))).as("precision"),
        (col("tp").cast("double") / (col("tp") + col("fn"))).as("recall"),
        ((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("fn") + col("tn"))).as("accuracy"))

  /** Calibration (reliability) report for a scored frame: the
    * held-out docs cut into `bins` score-ordered groups (exact NTILE
    * over the total (score, id) order — the q135 device; at 100 TB
    * swap in the mergeable-quantile cutoffs of
    * [[LanguageModel.approxBucketCutoffs]]), each bin reporting its
    * empirical positive rate against the model's mean predicted
    * probability σ(logodds). A well-calibrated filter has the two
    * tracking each other; a confident-but-wrong region shows up as a
    * bin where they diverge — the diagnostic published before
    * trusting `keep` thresholds at corpus scale.
    *
    * Portability: σ is computed per row and TRUNCATED to 1e-9 (the
    * ln9 device — cross-engine exp parity), then decimal-summed, so
    * the bin means are value-exact against the oracle. */
  def calibration(scored: DataFrame, scoreCol: String,
      truthCol: String, idCol: String, bins: Int = 10): DataFrame = {
    val sigma9 = floor((lit(1.0) /
      (lit(1.0) + exp(-col(scoreCol)))) * lit(1e9)) / lit(1e9)
    scored
      .withColumn("bin", ntile(bins).over(
        Window.orderBy(col(scoreCol), col(idCol))))
      .withColumn("pred9", sigma9)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(truthCol), 1L).otherwise(0L)).as("n_pos"),
        min(col(scoreCol)).as("min_logodds"),
        max(col(scoreCol)).as("max_logodds"),
        sum(col("pred9").cast(Dec)).as("psum"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("frac_pos"),
        (col("psum").cast("double") / col("n_docs").cast("double"))
          .as("mean_pred"),
        col("min_logodds"), col("max_logodds"))
      .orderBy(col("bin"))
  }
}
