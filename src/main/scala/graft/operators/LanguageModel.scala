package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical language-model quality scoring for training-data
  * pipelines (builder brief extension; the CCNet device — Wenzek et
  * al. 2020 §4.3 — of ranking a corpus by LM perplexity, with the LM
  * here trained on the corpus itself instead of an external KenLM, so
  * the whole signal stays inside the engine and is oracle-checkable).
  *
  * Model: add-one-smoothed bigram LM over CJK-aware tokens
  * ([[graft.functions.TextFunctions.cjkAwareTokens]] — whitespace
  * words, plus character-level CJK so space-free scripts still
  * produce a usable n-gram stream).
  * For each in-document bigram (w1, w2):
  *
  *   surprisal = −ln( (c(w1,w2) + 1) / (c(w1) + V) )
  *
  * where c(·) are corpus counts and V the corpus vocabulary size. A
  * document's score is its mean bigram surprisal — high values mean
  * improbable word sequences (boilerplate soup, OCR noise, wrong-
  * language text), the rows a perplexity filter drops first.
  *
  * Float parity (the [[graft.queries.Tables]] discipline): each ln is
  * truncated to 9 decimals (`floor(ln·1e9)/1e9` — JVM `Math.log` and
  * any libm agree far beyond 9 digits, so the truncation is
  * engine-portable), and the per-document sum goes through an exact
  * DECIMAL(18,9) cast so parallel partial aggregation cannot reorder
  * IEEE additions.
  *
  * Scale: bigrams materialize per row from the token array (zip_with
  * over two slices — no per-document exchange, no window; a lead()
  * window over the exploded stream would cost a full-stream shuffle +
  * sort per consumer). The bigram/unigram count tables are
  * vocabulary-sized hash-join keys; the vocabulary size is a one-row
  * broadcast; the only data-sized exchanges are the count aggregations
  * and the final per-document aggregate. Nothing here is quadratic
  * and no state lives on the driver.
  */
object LanguageModel {

  /** Truncated natural log, identical across engines at 9 decimals. */
  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  /** Per-document mean bigram surprisal under the corpus-trained
    * add-one bigram LM. Documents with fewer than two tokens have no
    * bigrams and are absent from the result (inner-join semantics —
    * a perplexity filter has nothing to say about them).
    *
    * Output: (idCol, n_bigrams, mean_surprisal), ordered by idCol.
    */
  def bigramSurprisal(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // Bigrams are materialized PER ROW from the token array (the
    // lambda only touches the `toks` attribute — O(1) element reads,
    // no re-split) and then exploded. The alternative — a lead()
    // window over an exploded token stream — costs a full-stream
    // shuffle + sort per consumer; this shape needs NO per-document
    // exchange at all: the only shuffles are the vocabulary-sized
    // count aggregations and the final per-document aggregate.
    val toksed = df.select(col(idCol).as("doc"),
      graft.functions.TextFunctions.cjkAwareTokens(col(textCol))
        .as("toks"))
    // The occurrence stream collapses IMMEDIATELY to per-(doc, w1,
    // w2) counts (map-side combinable), so the count tables AND the
    // scoring join all run over distinct-bigram rows, not the raw
    // stream, and the corpus is scanned twice (bigrams + unigrams)
    // instead of three times. n · round9(s) is EXACTLY the decimal
    // sum of n per-occurrence terms (decimal × integer ≡ repeated
    // exact addition — the q102 histogram device), so the collapsed
    // aggregation stays bit-identical to the oracle's
    // per-occurrence form.
    val docBi =
      toksed.select(col("doc"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("doc"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("n"))
    val uni = toksed
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w").as("uw"))
      .agg(count(lit(1)).as("cu"))
    // |vocabulary| = row count of the unigram table — same value as
    // COUNT(DISTINCT w) over the stream, one token-stream scan fewer.
    val voc = uni.agg(count(lit(1)).as("v"))
    val bi = docBi.groupBy(col("w1").as("b1"), col("w2").as("b2"))
      .agg(sum(col("n")).as("cb"))
    val scored = docBi
      .join(bi, col("w1") === col("b1") && col("w2") === col("b2"))
      .join(uni, col("w1") === col("uw"))
      .crossJoin(broadcast(voc))
      .withColumn("s", -ln9((col("cb") + 1).cast("double") /
        (col("cu") + col("v")).cast("double")))
    scored
      .groupBy(col("doc").as(idCol))
      .agg(
        sum(col("n")).as("n_bigrams"),
        // n as DECIMAL(12,0) keeps the product inside 38-digit
        // precision (12+18+1=31), exactly as Importance.dsirWeights
        (sum(col("n").cast(DecimalType(12, 0)) *
          col("s").cast(DecimalType(18, 9))).cast("double") /
          sum(col("n"))).as("mean_surprisal"))
      .orderBy(col(idCol))
  }

  /** CCNet §4.3 perplexity bucketing: per language, rank documents by
    * LM surprisal and cut into equal thirds — "head" (most fluent),
    * "middle", "tail" (the slice CCNet drops or downweights). Exact
    * NTILE form: ordering is (score, id) so ties are total and the
    * result is engine-reproducible.
    *
    * SCALE NOTE: `Window.partitionBy(lang)` sorts each language's
    * documents inside one partition — exact and oracle-checkable, but
    * a dominant language at 100 TB makes that partition the straggler.
    * The production-scale path is [[approxBucketCutoffs]] +
    * [[assignByCutoffs]]: a tiny per-language cutoff table from a
    * mergeable quantile sketch, broadcast back as a pure per-row
    * comparison — no per-language sort anywhere (the CCNet paper
    * itself buckets by precomputed percentile cutoffs).
    */
  def perplexityBuckets(scored: DataFrame, idCol: String,
      langCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(langCol))
      .orderBy(col(scoreCol), col(idCol))
    scored
      .withColumn("tile", ntile(3).over(w))
      .withColumn("ppl_bucket",
        when(col("tile") === 1, "head")
          .when(col("tile") === 2, "middle").otherwise("tail"))
      .drop("tile")
  }

  /** Per-language (lower, upper) score cutoffs at the 1/3 and 2/3
    * quantiles from `approx_percentile` (a mergeable KLL-class
    * sketch: one pass, map-side combinable, bounded state — the
    * quantile that scales). Output is languages × 2 doubles. */
  def approxBucketCutoffs(scored: DataFrame, langCol: String,
      scoreCol: String, accuracy: Int = 10000): DataFrame =
    scored.groupBy(col(langCol))
      .agg(percentile_approx(col(scoreCol),
        array(lit(1.0 / 3), lit(2.0 / 3)), lit(accuracy)).as("cuts"))
      .select(col(langCol).as("cut_lang"),
        col("cuts").getItem(0).as("cut_lo"),
        col("cuts").getItem(1).as("cut_hi"))

  /** Assign head/middle/tail by broadcast cutoff comparison — the
    * no-sort scale path. With exact tertile cutoffs and distinct
    * scores this reproduces [[perplexityBuckets]] (spec-pinned);
    * score ties straddling a cutoff all land in the lower bucket. */
  def assignByCutoffs(scored: DataFrame, langCol: String,
      scoreCol: String, cutoffs: DataFrame): DataFrame =
    scored.join(broadcast(cutoffs),
        col(langCol) === col("cut_lang"))
      .withColumn("ppl_bucket",
        when(col(scoreCol) <= col("cut_lo"), "head")
          .when(col(scoreCol) <= col("cut_hi"), "middle")
          .otherwise("tail"))
      .drop("cut_lang", "cut_lo", "cut_hi")

  /** Moore-Lewis cross-entropy-difference data selection (Moore &
    * Lewis 2010): score every document by
    *
    *   H_target(d) − H_source(d)
    *
    * where each H is the mean add-one bigram surprisal under an LM
    * trained on the TARGET slice (`isTarget` rows — the trusted
    * in-domain data) vs the whole corpus. Low scores read "looks like
    * the target, unlike the general corpus" — THE classic
    * intelligent-selection ranking ([[graft.operators.Importance]]'s
    * DSIR is its hashed-feature descendant). Unlike
    * [[bigramSurprisal]] the scored bigrams are NOT guaranteed seen
    * by the target model, so the count joins are LEFT with zero
    * fallbacks (add-one smoothing absorbs the zeros).
    *
    * Same portability + scale discipline as [[bigramSurprisal]]; the
    * token stream is scanned once into per-doc bigram counts, and
    * both models derive from that table plus one target-filtered
    * pass.
    *
    * Output: (idCol, n_bigrams, h_target, h_source, ml_score),
    * ordered by idCol.
    */
  def mooreLewisScores(df: DataFrame, idCol: String, textCol: String,
      isTarget: org.apache.spark.sql.Column): DataFrame = {
    val toksed = df.select(col(idCol).as("doc"), isTarget.as("tgt"),
      graft.functions.TextFunctions.cjkAwareTokens(col(textCol))
        .as("toks"))
    val docBi = toksed.select(col("doc"), col("tgt"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc"), col("tgt"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("doc"), col("tgt"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n"))
    val docUni = toksed
      .select(col("tgt"), explode(col("toks")).as("w"))
      .groupBy(col("tgt"), col("w"))
      .agg(count(lit(1)).as("cu"))
    def model(bi: DataFrame, uni: DataFrame, tag: String):
        (DataFrame, DataFrame, DataFrame) = (
      bi.groupBy(col("w1").as(s"${tag}b1"), col("w2").as(s"${tag}b2"))
        .agg(sum(col("n")).as(s"${tag}cb")),
      uni.groupBy(col("w").as(s"${tag}uw"))
        .agg(sum(col("cu")).as(s"${tag}cu")),
      uni.select(col("w")).distinct().agg(count(lit(1)).as(s"${tag}v")))
    val (sbi, suni, svoc) = model(docBi, docUni, "s")
    val (tbi, tuni, tvoc) = model(docBi.filter(col("tgt")),
      docUni.filter(col("tgt")), "t")
    def surprisal(cb: Column, cu: Column, v: Column): Column =
      -ln9((coalesce(cb, lit(0L)) + 1).cast("double") /
        (coalesce(cu, lit(0L)) + v).cast("double"))
    val scored = docBi
      .join(sbi, col("w1") === col("sb1") && col("w2") === col("sb2"),
        "left")
      .join(suni, col("w1") === col("suw"), "left")
      .join(tbi, col("w1") === col("tb1") && col("w2") === col("tb2"),
        "left")
      .join(tuni, col("w1") === col("tuw"), "left")
      .crossJoin(broadcast(svoc))
      .crossJoin(broadcast(tvoc))
      .withColumn("ss", surprisal(col("scb"), col("scu"), col("sv")))
      .withColumn("st", surprisal(col("tcb"), col("tcu"), col("tv")))
    def meanOf(c: Column): Column =
      (sum(col("n").cast(DecimalType(12, 0)) *
        c.cast(DecimalType(18, 9))).cast("double") / sum(col("n")))
    scored
      .groupBy(col("doc").as(idCol))
      .agg(sum(col("n")).as("n_bigrams"),
        meanOf(col("st")).as("h_target"),
        meanOf(col("ss")).as("h_source"))
      .withColumn("ml_score", col("h_target") - col("h_source"))
      .orderBy(col(idCol))
  }

  /** Interpolated Kneser-Ney bigram surprisal (Kneser & Ney 1995;
    * the Chen & Goodman 1998 interpolated form with a single absolute
    * discount D=0.75) — the smoothing every published n-gram LM
    * quality filter (KenLM/CCNet-class) actually ships, vs the
    * add-one baseline in [[bigramSurprisal]]:
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + (D·N1+(w1·)/c(w1·)) · (N1+(·w2)/T)
    *
    * where c(w1·) is the bigram-context marginal, N1+(w1·)/N1+(·w2)
    * are distinct-continuation counts, and T the number of distinct
    * bigram types. The continuation distribution (how many DIFFERENT
    * contexts a word follows) is the part add-one smoothing cannot
    * express — "Francisco" is frequent but only ever follows "San".
    *
    * Same portability + scale discipline as [[bigramSurprisal]]:
    * per-row bigrams (zip_with, no window), occurrence stream
    * collapsed to per-(doc,w1,w2) counts immediately, count tables
    * are vocabulary-sized join keys, ln truncated to 9 decimals,
    * per-doc mean via the exact n·round9(s) decimal sum.
    *
    * Output: (idCol, n_bigrams, mean_kn_surprisal), ordered by idCol.
    */
  def kneserNeySurprisal(df: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    val toksed = df.select(col(idCol).as("doc"),
      graft.functions.TextFunctions.cjkAwareTokens(col(textCol))
        .as("toks"))
    val docBi =
      toksed.select(col("doc"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select(col("doc"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .groupBy(col("doc"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("n"))
    // All model tables derive from the distinct-bigram table: the
    // context marginal + forward continuation count in one pass, the
    // backward continuation count in another, T as a one-row
    // broadcast — the raw token stream is scanned exactly once.
    val bi = docBi.groupBy(col("w1").as("b1"), col("w2").as("b2"))
      .agg(sum(col("n")).as("cb"))
    val ctx = bi.groupBy(col("b1").as("c1"))
      .agg(sum(col("cb")).as("cw"), count(lit(1)).as("fw"))
    val bw = bi.groupBy(col("b2").as("d2"))
      .agg(count(lit(1)).as("bw"))
    val types = bi.agg(count(lit(1)).as("t"))
    val dD = lit(discount)
    val scored = docBi
      .join(bi, col("w1") === col("b1") && col("w2") === col("b2"))
      .join(ctx, col("w1") === col("c1"))
      .join(bw, col("w2") === col("d2"))
      .crossJoin(broadcast(types))
      .withColumn("s", -ln9(
        greatest(col("cb").cast("double") - dD, lit(0.0)) / col("cw") +
          ((dD * col("fw")) / col("cw")) *
          (col("bw").cast("double") / col("t"))))
    scored
      .groupBy(col("doc").as(idCol))
      .agg(
        sum(col("n")).as("n_bigrams"),
        (sum(col("n").cast(DecimalType(12, 0)) *
          col("s").cast(DecimalType(18, 9))).cast("double") /
          sum(col("n"))).as("mean_kn_surprisal"))
      .orderBy(col(idCol))
  }
}
