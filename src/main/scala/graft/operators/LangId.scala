package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Trained language identification — multiclass Naive Bayes over
  * hashed character 1-3-grams, the fastText-LID-class model (Joulin
  * et al. 2016 use char n-gram features for exactly this task)
  * trained IN the engine on the corpus's labeled slice.
  *
  * Why a trained model: the engine's own q187 eval documented that
  * the marker-phrase heuristic
  * ([[graft.functions.TextFunctions.langIdHeuristic]]) has no zh
  * coverage at all (the confusion matrix is off-diagonal for
  * Chinese), and LID gates the per-language curation chain
  * (per-language funnels, perplexity buckets, datasheets). The
  * reference pipeline is Latin-gated with no LID
  * (`utils/text_utils.py:92-127`); this is the extension surface a
  * multilingual 100 TB corpus needs. Character n-grams are the
  * standard LID feature because they need no tokenizer and cover
  * scripts (a single CJK codepoint is already a discriminative
  * 1-gram).
  *
  * Model: per class c and hashed gram bucket b,
  *   lp(b|c) = ln p̂(b|c) = ln((count(b,c) + α)/(total_c + K·α))
  * smoothed over the FULL K-bucket space (the
  * [[QualityClassifier.trainScore]] device, generalized from a
  * binary log-odds to C per-class log-likelihoods); class prior
  * ln((n_c + 1)/(n + C)). Guess = argmax_c [prior_c + Σ_grams lp],
  * ties broken by the LARGER class code (max(struct(score, cls)) —
  * the array_max struct-order discipline of q187).
  *
  * Engine-portability (the [[Importance]] contract): md5-prefix
  * feature buckets, every ln truncated to 9 decimals, all sums exact
  * decimals — the DuckDB oracle replays training AND scoring
  * value-exactly, argmax included (decimal comparison is exact, so
  * even ties agree).
  *
  * Scale shape: the training gram stream collapses map-side to a
  * ≤C·K-row count table; the model and the C-row prior BROADCAST
  * onto the scoring stream; per-doc work is one bounded explode
  * (≤3·cap grams) + one keyed aggregate. Nothing driver-side,
  * nothing corpus².
  */
object LangId {

  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  private val Dec = DecimalType(18, 9)

  /** All character 1-, 2- and 3-grams of the first `cap` CODE POINTS
    * (code-point slicing, not UTF-16 units — the semantics of
    * `substr` in every SQL engine, so the oracle's
    * generate_series/substr replay is exact even for astral chars).
    * The cap bounds per-doc work and matches LID practice: a few
    * hundred characters decide a language. */
  private val charNgramsUdf = udf { (s: String, cap: Int) =>
    if (s == null) Array.empty[String]
    else {
      val all = s.codePoints().toArray
      val cps = if (all.length > cap) all.take(cap) else all
      val out = new scala.collection.mutable.ArrayBuffer[String](
        3 * cps.length)
      var n = 1
      while (n <= 3) {
        var i = 0
        while (i + n <= cps.length) {
          out += new String(cps, i, n)
          i += 1
        }
        n += 1
      }
      out.toArray
    }
  }

  def charNgrams(text: Column, cap: Int): Column =
    charNgramsUdf(text, lit(cap))

  /** Train on `train` (labels in `labelCol`) and score `score`;
    * both need `idCol` + `textCol`. Only classes PRESENT in the
    * training slice can be guessed (a C-class closed world — the
    * fastText-LID contract).
    *
    * Output: (idCol, n_grams, guess, nb_score) ordered by idCol —
    * one row per scored doc with ≥1 gram; nb_score is the winning
    * class's smoothed log-likelihood + prior (comparable across
    * docs of similar length, not a probability). */
  def trainScore(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, labelCol: String, buckets: Int = 1024,
      alpha: Double = 1.0, cap: Int = 200): DataFrame = {
    require(buckets >= 2 && alpha > 0 && cap >= 3,
      s"need buckets >= 2, alpha > 0, cap >= 3 ($buckets, $alpha, $cap)")
    val spark = train.sparkSession
    val k = lit(buckets.toDouble * alpha)
    val a = lit(alpha)

    // Both slices are expression-dense per-row stages (~3·cap gram
    // UDF + one md5 per gram): a one-split documents scan would run
    // them on a single core (r14 StageProbe: the train-count stage
    // was 3.6 s on 1 of 32 tasks at sf0.1) — fan out first, a no-op
    // once the scan splits naturally (the q157 device).
    val trainW = graft.GraftSession.fanOutForCompute(train)
    val scoreW = graft.GraftSession.fanOutForCompute(score)

    // Class-conditional bucket counts from the training slice only —
    // one gram explode, immediately collapsed to ≤C·K rows.
    val counts = trainW
      .select(col(labelCol).as("ccls"),
        explode(charNgrams(col(textCol), cap)).as("g"))
      .groupBy(col("ccls"),
        Importance.featureBucket(col("g"), buckets).as("cb"))
      .agg(count(lit(1)).as("cn"))

    // Densify to classes × the FULL bucket space (every bucket gets
    // a smoothed log-prob, seen in training or not). C·K rows BY
    // CONSTRUCTION, so the per-class window for totals is scale-safe.
    val classes = train.select(col(labelCol).as("cls")).distinct()
    val model = classes
      .crossJoin(broadcast(spark.range(buckets)
        .select(col("id").as("b"))))
      .join(counts,
        col("cls") === col("ccls") && col("b") === col("cb"), "left")
      .select(col("cls"), col("b"),
        coalesce(col("cn"), lit(0L)).as("cn"))
      .withColumn("ctot",
        sum(col("cn")).over(Window.partitionBy(col("cls"))))
      .select(col("cls"), col("b"),
        ln9((col("cn") + a) / (col("ctot") + k)).as("lp"))

    // Class priors from training DOCUMENT counts, add-one smoothed
    // over the C classes (a class can be rare without log-of-zero).
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
    val prior = train.groupBy(col(labelCol).as("pcls"))
      .agg(count(lit(1)).as("nd"))
      .withColumn("ntot", sum(col("nd")).over(whole))
      .withColumn("ncls", count(lit(1)).over(whole))
      .select(col("pcls"),
        ln9((col("nd") + lit(1)) / (col("ntot") + col("ncls")))
          .as("pp"))

    // Score: per-doc bucket histogram × broadcast dense model gives
    // exactly C candidate rows per doc; n·round9(lp) is exactly the
    // decimal sum of n per-occurrence terms (the q133 proof).
    scoreW
      .select(col(idCol).as("doc"),
        explode(charNgrams(col(textCol), cap)).as("g"))
      .groupBy(col("doc"),
        Importance.featureBucket(col("g"), buckets).as("db"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(model), col("db") === col("b"))
      .groupBy(col("doc"), col("cls"))
      .agg(sum(col("n")).as("n_grams"),
        sum(col("n").cast(DecimalType(12, 0)) * col("lp").cast(Dec))
          .as("gsum"))
      .join(broadcast(prior), col("cls") === col("pcls"))
      // re-narrow the SUM (DECIMAL(38,9)) before adding the prior —
      // the q133 precision-loss guard; keep the score DECIMAL so the
      // argmax comparison (and its ties) is exact in both engines
      .select(col("doc"), col("cls"), col("n_grams"),
        (col("gsum").cast(Dec) + col("pp").cast(Dec)).as("sc"))
      .groupBy(col("doc").as(idCol))
      .agg(max(col("n_grams")).as("n_grams"),
        max(struct(col("sc"), col("cls"))).as("m"))
      .select(col(idCol), col("n_grams"), col("m.cls").as("guess"),
        col("m.sc").cast("double").as("nb_score"))
      .orderBy(col(idCol))
  }

  /** Confusion matrix of a guessed frame against true labels:
    * (truth, guess, n) — the multiclass analog of
    * [[QualityClassifier.confusion]], the report that exposes
    * per-language coverage holes before the model gates a corpus. */
  def confusion(scored: DataFrame, truthCol: String,
      guessCol: String): DataFrame =
    scored.groupBy(col(truthCol).as("truth"),
        col(guessCol).as("guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("truth"), col("guess"))
}
