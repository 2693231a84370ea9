package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Retrieval evaluation — the metrics harness a search/RAG stack is
  * tuned against: per-query recall@k, precision@k, MRR, and NDCG@k of
  * a ranked result set against a relevance truth set.
  *
  * Cross-engine exactness (the whole point of registering q124): the
  * log-discounted gains are scaled to INTEGERS before summation —
  * term = floor(1e9 · ln2/ln(rank+1)) — so DCG/IDCG are exact long
  * sums (order-independent, partial-aggregating) and the only
  * floating-point steps are single IEEE divisions at the end, which
  * every engine rounds identically. No float accumulation anywhere.
  *
  * Scale: truth and results join on (qid, cid) — hash joins keyed by
  * query; per-query aggregates are map-side partial. Nothing here
  * holds more than a query's k rows in any buffer.
  */
object Eval {

  private val Ln2 = math.log(2.0)

  private def t9(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  /** Scaled DCG gains for ranks 1..k — floor(1e9·ln2/ln(r+1)) —
    * computed ONCE on the driver and shipped as literals to BOTH the
    * plan and the q124 oracle. At power-of-two ranks the quotient is
    * mathematically an exact integer (1e9/j at rank 2^j − 1), so the
    * double sits within an ulp of the floor boundary: evaluating the
    * floor inside each engine's own libm would make the "bit-exact"
    * contract hostage to a 1-ulp ln() difference. As driver-side
    * constants there is exactly ONE set of gains. */
  def scaledGains(k: Int): Array[Long] =
    Array.tabulate(k)(i =>
      math.floor(1e9 * Ln2 / math.log(i.toDouble + 2.0)).toLong)

  /** Cumulative gains: ideal DCG for a truth set of size i is
    * `cum(min(i, k))`. */
  def scaledGainCums(k: Int): Array[Long] =
    scaledGains(k).scanLeft(0L)(_ + _).tail

  /** Per-query metrics of `results` (qid, cid, rnk — ranks 1-based,
    * already truncated to the list the system returned) against
    * `truth` (qid, cid). Queries with empty truth sets are omitted
    * (their metrics are undefined). Output: (qid, n_gold, hits,
    * recall_at_k, precision_at_k, mrr, ndcg_at_k). */
  def retrievalMetrics(results: DataFrame, truth: DataFrame,
      k: Int): DataFrame = {
    val res = results.select(col("qid"), col("cid"), col("rnk"))
      .filter(col("rnk") <= k)
    val gold = truth.select(col("qid"), col("cid")).distinct()
    val goldSizes = gold.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_gold"))
    val gains = typedlit(scaledGains(k).toSeq)
    val cums = typedlit(scaledGainCums(k).toSeq)
    val rel = res.join(gold, Seq("qid", "cid"))
    val perQuery = rel.groupBy(col("qid")).agg(
      count(lit(1)).as("hits"),
      min(col("rnk")).as("min_rel_rank"),
      sum(element_at(gains, col("rnk").cast("int")))
        .as("dcg_scaled"))
    // ideal DCG for a truth set of size g: the top min(g, k) ranks
    // all relevant — the cumulative literal at min(g, k)
    val idcg = element_at(cums,
      least(col("n_gold"), lit(k.toLong)).cast("int"))
    goldSizes
      .join(perQuery, Seq("qid"), "left")
      .select(
        col("qid"),
        col("n_gold"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_gold")).as("recall_at_k"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(k))
          .as("precision_at_k"),
        coalesce(lit(1.0) / col("min_rel_rank"), lit(0.0)).as("mrr"),
        coalesce(col("dcg_scaled").cast("double") /
          idcg.cast("double"), lit(0.0)).as("ndcg_at_k"))
  }

  private val GramSep = "\u0001"

  private def toks(c: Column) = split(trim(c), "\\s+")

  // n-grams as sep-joined strings; empty array when the text is
  // shorter than n (sequence(1, k<1) would count DOWN — guard it)
  private def grams(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - n + 1),
        i => concat_ws(GramSep, slice(tk, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  // Σ over distinct candidate grams of min(count in cand, count in
  // ref) — multiset intersection size (array_intersect is set-
  // semantics and would undercount repeats)
  private def clipped(c: Column, r: Column): Column =
    aggregate(array_distinct(c), lit(0L),
      (acc, g) => acc +
        least(size(filter(c, x => x === g)),
          size(filter(r, x => x === g))).cast("long"))

  /** BLEU sufficient statistics per (candidate, reference) pair —
    * modified (clipped) n-gram precision counts for n = 1..4 plus
    * token lengths, the exact integers BLEU (Papineni et al. 2002)
    * is assembled from.
    *
    * Output per input row: cand_len, ref_len, m1..m4 (clipped
    * matches), t1..t4 (candidate n-gram totals), p1..p4 (= mₙ/tₙ,
    * null when tₙ = 0), and `bleu_nobp` = ⁴√(p1·p2·p3·p4) — the
    * geometric mean WITHOUT the brevity penalty. The BP factor
    * e^(1−r/c) needs libm `exp`, whose last ulp differs across
    * engines, so it is deliberately NOT emitted: everything here is
    * integer counts, single IEEE divisions, IEEE multiplications and
    * `sqrt` (all correctly rounded by the standard) — bit-exact on
    * any engine. Callers needing the full smoothed corpus BLEU fold
    * these integers on the driver (see BleuSpec).
    *
    * Scale: every column is computed IN-ROW with higher-order array
    * functions — no explode, no shuffle, no state. Per-pair BLEU
    * over 100 TB is a pure map stage. The in-row clip is O(L·D) per
    * n (L tokens, D distinct n-grams), fine for document-sized L;
    * book-length texts should be chunked first.
    */
  def bleuStats(pairs: DataFrame, candCol: String,
      refCol: String): DataFrame = {
    val withGrams = (1 to 4).foldLeft(
      pairs
        .withColumn("__ctk", toks(col(candCol)))
        .withColumn("__rtk", toks(col(refCol)))) { (df, n) =>
      df.withColumn(s"__cg$n", grams(col("__ctk"), n))
        .withColumn(s"__rg$n", grams(col("__rtk"), n))
    }
    val withStats = (1 to 4).foldLeft(
      withGrams
        .withColumn("cand_len", size(col("__ctk")).cast("long"))
        .withColumn("ref_len", size(col("__rtk")).cast("long"))) {
      (df, n) =>
        df.withColumn(s"t$n", size(col(s"__cg$n")).cast("long"))
          .withColumn(s"m$n",
            clipped(col(s"__cg$n"), col(s"__rg$n")))
          .withColumn(s"p$n",
            when(col(s"t$n") > 0,
              col(s"m$n").cast("double") / col(s"t$n")))
    }
    withStats
      .withColumn("bleu_nobp",
        when(col("t4") > 0,
          sqrt(sqrt(col("p1") * col("p2") * col("p3") * col("p4")))))
      .drop((1 to 4).flatMap(n => Seq(s"__cg$n", s"__rg$n")) ++
        Seq("__ctk", "__rtk"): _*)
  }

  /** ROUGE-N sufficient statistics per (candidate, reference) pair —
    * clipped n-gram overlap (Lin 2004) for n = 1..2: mₙ (multiset
    * n-gram intersection), cₙ / rₙ (candidate / reference totals),
    * precision pₙ = mₙ/cₙ, recall recₙ = mₙ/rₙ, and
    * fₙ = 2·pₙ·recₙ/(pₙ+recₙ) (each null when its denominator is 0).
    * The summarization-eval complement of [[bleuStats]]: BLEU is
    * precision-oriented, ROUGE recall-oriented — both emitted here so
    * callers pick either side. Same exactness contract: integer
    * counts, single IEEE divisions/multiplications only, so every
    * engine computes bit-identical values from the same pair.
    *
    * Scale: identical to [[bleuStats]] — all columns are in-row
    * higher-order-function evaluations; a pure map stage, no shuffle,
    * no state, at any corpus size.
    */
  def rougeStats(pairs: DataFrame, candCol: String,
      refCol: String): DataFrame = {
    val withGrams = (1 to 2).foldLeft(
      pairs
        .withColumn("__ctk", toks(col(candCol)))
        .withColumn("__rtk", toks(col(refCol)))) { (df, n) =>
      df.withColumn(s"__cg$n", grams(col("__ctk"), n))
        .withColumn(s"__rg$n", grams(col("__rtk"), n))
    }
    val withStats = (1 to 2).foldLeft(withGrams) { (df, n) =>
      df.withColumn(s"c$n", size(col(s"__cg$n")).cast("long"))
        .withColumn(s"r$n", size(col(s"__rg$n")).cast("long"))
        .withColumn(s"m$n", clipped(col(s"__cg$n"), col(s"__rg$n")))
        .withColumn(s"p$n",
          when(col(s"c$n") > 0,
            col(s"m$n").cast("double") / col(s"c$n")))
        .withColumn(s"rec$n",
          when(col(s"r$n") > 0,
            col(s"m$n").cast("double") / col(s"r$n")))
        .withColumn(s"f$n",
          when(col(s"p$n") + col(s"rec$n") > 0,
            lit(2.0) * col(s"p$n") * col(s"rec$n") /
              (col(s"p$n") + col(s"rec$n"))))
    }
    withStats
      .drop((1 to 2).flatMap(n => Seq(s"__cg$n", s"__rg$n")) ++
        Seq("__ctk", "__rtk"): _*)
  }

  /** Embedding-quality metrics of Wang & Isola 2020 ("Understanding
    * Contrastive Representation Learning through Alignment and
    * Uniformity"): alignment = E‖x−y‖² over POSITIVE pairs (here:
    * same `labelCol`), uniformity = ln E[exp(−2‖x−y‖²)] over random
    * pairs — lower is better for both; together they separate
    * "collapsed" from "spread but unstructured" embedding spaces.
    *
    * Pair shapes, both cartesian-free: positives are an equi-join
    * on the label (Σ n_label² — band hot labels upstream if one
    * label dominates); the uniformity sample is the RANDOM-BUCKET
    * pair design — md5-bucket each id into `buckets` buckets and
    * take all pairs WITHIN a bucket (an equi-join on the bucket,
    * ≈ n²/buckets pairs, deterministic, unbiased over unordered
    * pairs since bucket assignment is independent of content).
    *
    * Exactness: ‖x−y‖² = xx + yy − 2xy from three sequential dots
    * (the list_dot_product-parity kernel), 9-truncated; means are
    * exact decimal sums over counts; exp/ln are floor-truncated
    * (the q133 device). Output: one row (n_align_pairs, alignment,
    * n_unif_pairs, uniformity).
    *
    * PRECONDITION (overflow envelope): embeddings are expected
    * ℓ²-NORMALIZED (as every embed/ANN path in this engine emits) —
    * then ‖x−y‖² ≤ 4 and the DECIMAL(18,9) pair-sum holds ~2.5e8
    * pairs per unit of d2 before overflowing to null. Feeding
    * un-normalized large-magnitude vectors (or >1e8-pair label
    * blocks) can silently null alignment/uniformity; normalize
    * first (the metric is defined on the hypersphere anyway —
    * Wang & Isola §4). */
  def alignmentUniformity(emb: DataFrame, idCol: String,
      labelCol: String, vecCol: String,
      buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets >= 1 ($buckets)")
    import graft.functions.VectorFunctions.dotF64
    def t9(x: Column): Column =
      floor(x * lit(1e9)).cast("double") / lit(1e9)
    def ln9(x: Column): Column =
      floor(log(x) * lit(1e9)).cast("double") / lit(1e9)
    def e9(x: Column): Column =
      floor(exp(x) * lit(1e9)).cast("double") / lit(1e9)
    def dsum9(c: Column): Column =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(18, 9)))
        .cast("double")
    val v = emb.select(col(idCol).as("id"), col(labelCol).as("lb"),
      col(vecCol).cast("array<double>").as("e"),
      (conv(substring(md5(concat(lit("au:"), col(idCol))), 1, 8),
        16, 10).cast("long") % buckets).as("bk"))
    def d2: Column =
      t9(dotF64(col("a.e"), col("a.e")) +
        dotF64(col("b.e"), col("b.e")) -
        lit(2.0) * dotF64(col("a.e"), col("b.e")))
    val align = v.as("a")
      .join(v.as("b"), col("a.lb") === col("b.lb") &&
        col("a.id") < col("b.id"))
      .agg(count(lit(1)).as("n_align_pairs"),
        (dsum9(d2) / count(lit(1))).as("alignment"))
    val unif = v.as("a")
      .join(v.as("b"), col("a.bk") === col("b.bk") &&
        col("a.id") < col("b.id"))
      .agg(count(lit(1)).as("n_unif_pairs"),
        ln9(dsum9(e9(lit(-2.0) * d2)) / count(lit(1)))
          .as("uniformity"))
    align.crossJoin(broadcast(unif))
  }

  /** Unbiased pass@k (Chen et al. 2021, "Evaluating Large Language
    * Models Trained on Code", eq. 1) per problem over an n-sample
    * candidate table: with c of n candidates correct,
    *
    *   pass@k = 1 − C(n−c, k)/C(n, k)
    *          = 1 − Π_{i=0..k−1} (n−c−i)/(n−i),
    *
    * the estimator every code-eval harness reports. Output one row
    * per (problem, k): (problem, k, n, c, pass_at_k); pass_at_k is
    * null when k > n (the estimator needs n ≥ k samples — a
    * diagnostic row, not a silent drop, the ksTwoSample discipline).
    *
    * Cross-engine exactness: n, c, i are integers, each factor is a
    * single IEEE division (correctly rounded from exact integer
    * operands in every engine), and the product folds in fixed
    * ascending-i order — bit-identical to the oracle's list_reduce
    * with NO truncation tricks needed. When k ≤ n−c the product is
    * taken as written; when n−c < k some factor is exactly 0 and
    * pass@k = 1 exactly.
    *
    * Scale shape: ONE corpus aggregate to (problem, n, c) — map-side
    * combining counts, never candidate text through the shuffle —
    * then the k-factor fold runs over the problem-level table
    * (|problems|·|ks| rows; the interpreted-lambda cost lives on
    * that small table, never the corpus — NOTES trap 3 is priced). */
  def passAtK(candidates: DataFrame, problemCol: Column,
      correctCol: Column, ks: Seq[Int]): DataFrame =
    passAtKFromCounts(candidates.select(problemCol.as("problem"),
        when(coalesce(correctCol.cast("boolean"), lit(false)),
          lit(1L)).otherwise(lit(0L)).as("__c"))
      .groupBy(col("problem"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("c")), ks)

  /** The pass@k estimator arithmetic over a PRE-AGGREGATED
    * (problem, n, c) counter table — shared by [[passAtK]] and the
    * streaming monitor's live vote snapshots
    * ([[graft.streaming.StreamingOps]]; the
    * [[Fairness.auditFromCounts]] device), so the pass@k a live
    * eval dashboard shows mid-run is the exact batch estimate. */
  def passAtKFromCounts(counts: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be >= 1")
    counts.select(col("problem"), col("n"), col("c"),
        explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
      .withColumn("pass_at_k",
        when(col("k") > col("n"), lit(null).cast("double"))
          .otherwise(lit(1.0) - aggregate(
            sequence(lit(0L), col("k") - 1L),
            lit(1.0),
            (acc, i) => acc *
              ((col("n") - col("c") - i).cast("double") /
                (col("n") - i).cast("double")))))
      .select(col("problem"), col("k"), col("n"), col("c"),
        col("pass_at_k"))
  }

  /** [[passAtKFromCounts]] over a
    * (problem, answer, votes, ok_votes) VOTE table (the streaming
    * monitor's state grain): n = Σ votes, c = Σ ok_votes — the
    * ACCEPTED-vote count, not votes gated on a per-answer boolean,
    * so a noisy grader (same answer, per-sample disagreement)
    * still reproduces the batch [[passAtK]] exactly (r12 review). */
  def passAtKFromVotes(votes: DataFrame, ks: Seq[Int]): DataFrame =
    passAtKFromCounts(votes.groupBy(col("problem"))
      .agg(sum(col("votes")).as("n"),
        sum(col("ok_votes")).as("c")), ks)

  /** GRPO-style GROUP-NORMALIZED ADVANTAGE (Shao et al. 2024,
    * "DeepSeekMath", eq. 3 — the group-relative policy-optimization
    * baseline): per problem, each sampled candidate's advantage is
    * its reward standardized against the GROUP's own mean and
    * population std, A_i = (r_i − mean_g) / std_g — the
    * value-model-free baseline every GRPO/RLOO-style RL run computes
    * over exactly this (problem, sample, reward) table.
    *
    * Exactness: rewards are t9-truncated then SCALED TO LONGS
    * (r9 = ⌊r·10⁹⌋); Σr9 and Σr9² are exact DECIMAL(38,0) integer
    * sums (order-independent, map-side partial), and mean/std/
    * advantage are a fixed sequence of single IEEE operations on
    * those exact integers — replayable bit-identically:
    *   mean = S1 / (n·10⁹)
    *   std  = √( ((n·S2 − S1²) / (n·n)) / 10¹⁸ )   (population)
    *   adv  = t9( ((r9·n − S1) / (n·10⁹)) / std )
    * A zero-variance group (all rewards equal — GRPO's degenerate
    * group, where implementations skip the batch) yields NULL
    * advantages with the flag column, not a division blow-up.
    *
    * Scale shape: ONE corpus aggregate to (problem, n, S1, S2), one
    * broadcast-sized join back onto the sample stream — the corpus
    * is scanned twice and never windowed. Output per input row:
    * (problem, sample, reward, n, mean, std, advantage,
    * degenerate). */
  /** The scaled-integer reward [[groupNormalizedAdvantage]] scores
    * with — exposed so the streaming counter twin keys its state
    * through the IDENTICAL codegen arithmetic. */
  private[graft] def r9Column(reward: Column): Column =
    floor(reward.cast("double") * lit(1e9)).cast("long")

  /** The mean/std/advantage arithmetic over exact integer moment
    * columns (__r9, n, __s1, __s2) — the ONE sequence of IEEE
    * operations shared by [[groupNormalizedAdvantage]] and
    * [[advantageFromCounts]]. */
  private def advantageCols(idCols: Seq[Column]): Seq[Column] = {
    val Dec38 = DecimalType(38, 0)
    val variance =
      ((col("n").cast(Dec38) * col("__s2") -
        col("__s1") * col("__s1")).cast("double") /
        (col("n").cast("double") * col("n"))) / lit(1e18)
    val std = sqrt(variance)
    idCols ++ Seq(
      (col("__r9").cast("double") / lit(1e9)).as("reward"),
      col("n"),
      (col("__s1").cast("double") /
        (col("n").cast("double") * lit(1e9))).as("mean"),
      std.as("std"),
      when(std > 0.0,
        t9(((col("__r9").cast(Dec38) * col("n") - col("__s1"))
          .cast("double") / (col("n").cast("double") * lit(1e9))) /
          std))
        .otherwise(lit(null).cast("double")).as("advantage"),
      (std === 0.0).as("degenerate"))
  }

  def groupNormalizedAdvantage(df: DataFrame, problemCol: Column,
      sampleCol: Column, rewardCol: Column): DataFrame = {
    val Dec38 = DecimalType(38, 0)
    val scored = df.select(problemCol.as("problem"),
        sampleCol.as("sample"), r9Column(rewardCol).as("__r9"))
      .filter(col("__r9").isNotNull)
    val g = scored.groupBy(col("problem"))
      .agg(count(lit(1)).as("n"),
        sum(col("__r9").cast(Dec38)).as("__s1"),
        sum((col("__r9").cast(Dec38) * col("__r9"))).as("__s2"))
    scored.join(g, Seq("problem"))
      .select(advantageCols(Seq(col("problem"), col("sample"))): _*)
  }

  /** [[groupNormalizedAdvantage]] at (problem, DISTINCT reward)
    * grain over a PRE-AGGREGATED (problem, r9, cnt) counter table —
    * the streaming monitor's state grain
    * ([[graft.streaming.StreamingOps.streamingRewardCounters]]; the
    * auditFromCounts device): moments rebuild as exact DECIMAL
    * count-weighted sums, then the identical IEEE sequence — the
    * advantage a live RL dashboard shows mid-run is the exact batch
    * value for every sample carrying that reward. */
  def advantageFromCounts(counts: DataFrame): DataFrame = {
    val Dec38 = DecimalType(38, 0)
    val c = counts.select(col("problem"),
      col("r9").cast("long").as("__r9"),
      col("cnt").cast("long").as("__cnt"))
    val g = c.groupBy(col("problem"))
      .agg(sum(col("__cnt")).as("n"),
        sum(col("__r9").cast(Dec38) * col("__cnt")).as("__s1"),
        sum(col("__r9").cast(Dec38) * col("__r9") * col("__cnt"))
          .as("__s2"))
    c.join(g, Seq("problem"))
      .select(advantageCols(Seq(col("problem"),
        col("__r9").as("r9"))): _*)
  }

  /** Unbiased BEST-OF-N yield curve (the WebGPT/summarization-RLHF
    * BoN estimator — Nakano et al. 2021 appendix: with N sampled
    * rewards per problem, the expected maximum of a UNIFORM
    * n-subsample has the closed form Σ_i w_i·r_(i) over the sorted
    * sample, w_i = (C(i,n) − C(i−1,n)) / C(N,n) — every n-subset's
    * max attributed to its rank, no resampling). The curve over
    * n ∈ `ns` is how an RLHF run sizes its sampling budget: where
    * it flattens, more samples stop buying reward.
    *
    * Exactness: ranks are assigned by (reward, sample id) — a total
    * order, and equal rewards make the weight attribution
    * order-free; the combinatorial ratio R_i = C(i,n)/C(N,n) is the
    * fixed-ascending product Π_{k<n} (i−k)/(N−k) of single IEEE
    * divisions (the q319 fold device — bit-identical in any
    * engine), w_i = R_i − R_{i−1} one subtraction, each term
    * t9(w_i·t9(r_i)) and the per-(problem, n) sum runs over
    * DECIMAL(38,9). Rows with n > N are null diagnostics.
    *
    * Scale shape: one rank window per problem (group-local), the
    * |ns|-way explode and the n-length interpreted fold run on the
    * sample table (cost |samples|·|ns|·max(n) multiplications), one
    * hash aggregate back to (problem, n). Nothing exceeds the
    * sample table's size. */
  def bestOfNCurve(df: DataFrame, problemCol: Column,
      sampleCol: Column, rewardCol: Column,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be >= 1")
    val w = Window.partitionBy(col("problem"))
      .orderBy(col("__r"), col("sample"))
    val ranked = df.select(problemCol.as("problem"),
        sampleCol.as("sample"),
        t9(rewardCol.cast("double")).as("__r"))
      .filter(col("__r").isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__N",
        count(lit(1)).over(Window.partitionBy(col("problem"))))
    def ratio(i: Column, n: Column): Column =
      when(i < n, lit(0.0)).otherwise(aggregate(
        sequence(lit(0L), n - 1L), lit(1.0),
        (acc, k) => acc * ((i - k).cast("double") /
          (col("__N") - k).cast("double"))))
    ranked
      .select(col("problem"), col("__r"), col("__i"), col("__N"),
        explode(array(ns.map(n => lit(n.toLong)): _*)).as("n"))
      // the n > N diagnostic rows must not evaluate the fold at all:
      // its (N−k) denominators hit zero there, and an Inf/NaN term
      // would poison the DECIMAL cast (DuckDB refuses it outright)
      .withColumn("__w",
        when(col("n") > col("__N"), lit(0.0))
          .otherwise(ratio(col("__i"), col("n")) -
            ratio(col("__i") - 1L, col("n"))))
      .groupBy(col("problem"), col("n"))
      .agg(max(col("__N")).as("n_samples"),
        sum(t9(col("__w") * col("__r"))
          .cast(DecimalType(38, 9))).cast("double")
          .as("__bon"))
      .select(col("problem"), col("n"), col("n_samples"),
        when(col("n") > col("n_samples"),
          lit(null).cast("double"))
          .otherwise(col("__bon")).as("best_of_n"))
  }

  /** [[bestOfNCurve]] over a PRE-AGGREGATED (problem, r9, weight)
    * reward-multiset table — the auditFromCounts member for the
    * yield curve, consumed by the streaming monitor's live sketch
    * snapshots ([[graft.streaming.StreamingOps.streamingYieldSketch]]).
    * `r9` is the batch operator's own scaled-integer reward key
    * (⌊r·10⁹⌋, [[r9Column]]); `weight` is how many samples carry
    * that reward. Each weight-w distinct value spans ranks
    * (lo, lo+w] of the ascending sort, and the span is replayed
    * PER RANK — same combinatorial fold, same per-rank
    * t9(w_i·r)-term, same DECIMAL(38,9) sum as the batch operator —
    * so on EXACT counts the output is bit-identical to
    * [[bestOfNCurve]] on the raw samples (ties spread across ranks
    * sum the same terms), and on a bounded-rank-error sketch the
    * value error is bounded by (r_max−r_min)·n·E/N for rank error E
    * (|F̂ⁿ−Fⁿ| ≤ n·|F̂−F|, integrated over the reward range).
    *
    * Scale shape: one count aggregate, one cumulative-weight window
    * per problem (distinct-value-sized), then the rank explode —
    * |samples|·|ns| rows, exactly the batch operator's own working
    * set, never more. */
  def bestOfNFromCounts(counts: DataFrame,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be >= 1")
    val c = counts.select(col("problem"),
        col("r9").cast("long").as("__r9"),
        col("weight").cast("long").as("__cnt"))
      .filter(col("__r9").isNotNull && col("__cnt") > 0)
      .groupBy(col("problem"), col("__r9"))
      .agg(sum(col("__cnt")).as("__cnt"))
    val w = Window.partitionBy(col("problem")).orderBy(col("__r9"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = c
      .withColumn("__hi", sum(col("__cnt")).over(w))
      .withColumn("__N", sum(col("__cnt"))
        .over(Window.partitionBy(col("problem"))))
      .withColumn("__r", col("__r9").cast("double") / lit(1e9))
    def ratio(i: Column, n: Column): Column =
      when(i < n, lit(0.0)).otherwise(aggregate(
        sequence(lit(0L), n - 1L), lit(1.0),
        (acc, k) => acc * ((i - k).cast("double") /
          (col("__N") - k).cast("double"))))
    spans
      .select(col("problem"), col("__r"), col("__N"),
        explode(sequence(col("__hi") - col("__cnt") + 1L,
          col("__hi"))).as("__i"))
      .select(col("problem"), col("__r"), col("__N"), col("__i"),
        explode(array(ns.map(n => lit(n.toLong)): _*)).as("n"))
      .withColumn("__w",
        when(col("n") > col("__N"), lit(0.0))
          .otherwise(ratio(col("__i"), col("n")) -
            ratio(col("__i") - 1L, col("n"))))
      .groupBy(col("problem"), col("n"))
      .agg(max(col("__N")).as("n_samples"),
        sum(t9(col("__w") * col("__r"))
          .cast(DecimalType(38, 9))).cast("double")
          .as("__bon"))
      .select(col("problem"), col("n"), col("n_samples"),
        when(col("n") > col("n_samples"),
          lit(null).cast("double"))
          .otherwise(col("__bon")).as("best_of_n"))
  }

  /** DEDUP-AWARE pass@k: eval sets carry near-duplicate problems
    * (template families, contaminated rephrasings), and the naive
    * mean over problems counts a duplicated problem once PER COPY —
    * a 30-copy template family drags the headline number toward its
    * own difficulty. Given a problem→cluster assignment (produced by
    * any of the engine's dedup devices: exact/normalized keys,
    * MinHash components via [[Dedup]], `q74`-style connected
    * components), this reports, per k:
    *
    *   macro_naive = mean over PROBLEMS of pass@k
    *   macro_dedup = mean over CLUSTERS of (mean over the cluster's
    *                 problems of pass@k)
    *
    * so each distinct problem family contributes once. The gap
    * between the two columns is the duplication bias itself — the
    * datasheet number a contaminated-eval audit wants.
    *
    * Exactness: per-problem pass@k values are the [[passAtK]]
    * estimator's exact products; each is t9-truncated, inner and
    * outer sums run over DECIMAL(38,9) (order-independent), each
    * mean is ONE IEEE division, and cluster means are t9-truncated
    * before the outer sum — bit-replayable in SQL. Problems where
    * pass@k is undefined (k > n) are EXCLUDED from both means and
    * from that k's problem/cluster counts (diagnostic-row
    * discipline, not a silent zero). A problem ABSENT from the
    * cluster map is its own singleton family (dedup devices label
    * only problems that appear in a duplicate pair), so macro_naive
    * is always the mean over the full eval set.
    *
    * Scale shape: ONE corpus aggregate to (problem, n, c), one
    * problem-table join to `clusters(problem, cluster)`, two
    * problem-table-sized hash aggregates — the corpus never rides
    * a shuffle wider than the counts pass. Output per k:
    * (k, n_problems, n_clusters, macro_naive, macro_dedup). */
  def passAtKDedupAware(candidates: DataFrame, problemCol: Column,
      correctCol: Column, clusters: DataFrame,
      ks: Seq[Int]): DataFrame = {
    def dsum9(c: Column): Column =
      sum(c.cast(DecimalType(38, 9))).cast("double")
    // LEFT join: dedup devices commonly label only problems that
    // appear in a duplicate pair, so a problem absent from the
    // cluster map is its OWN singleton family — an inner join would
    // silently drop it from both means and macro_naive would stop
    // being the mean over the eval set (r12.2 review). The cluster
    // map is deduped to ONE row per problem first (min cluster id —
    // deterministic): duplicate clusters(problem,*) rows would
    // otherwise multiply that problem into several families,
    // inflating n_problems and double-counting it in macro_naive
    // (r12 advice). Singletons are keyed by a SEPARATE boolean
    // column + the problem id, never by a string-prefix sentinel —
    // a caller cluster id equal to any sentinel string can then
    // never collide with a synthetic family (r12 advice).
    val clusterOf = clusters
      .select(col("problem"), col("cluster").cast("string").as("cluster"))
      .groupBy(col("problem"))
      .agg(min(col("cluster")).as("cluster"))
    val perProblem = passAtK(candidates, problemCol, correctCol, ks)
      .filter(col("pass_at_k").isNotNull)
      .join(clusterOf, Seq("problem"), "left")
      .select(col("k"),
        col("cluster").isNull.as("__singleton"),
        coalesce(col("cluster"), col("problem").cast("string"))
          .as("cluster"),
        t9(col("pass_at_k")).as("p"))
    val perCluster = perProblem
      .groupBy(col("k"), col("__singleton"), col("cluster"))
      .agg(dsum9(col("p")).as("__ps"), count(lit(1)).as("__np"))
      .select(col("k"),
        t9(col("__ps") / col("__np")).as("cm"),
        col("__ps"), col("__np"))
    perCluster
      .groupBy(col("k"))
      .agg(sum(col("__np")).as("n_problems"),
        count(lit(1)).as("n_clusters"),
        dsum9(col("__ps")).as("__allp"),
        dsum9(col("cm")).as("__allc"))
      .select(col("k"), col("n_problems"), col("n_clusters"),
        (col("__allp") / col("n_problems")).as("macro_naive"),
        (col("__allc") / col("n_clusters")).as("macro_dedup"))
  }

  /** Self-consistency / majority-vote scoring (Wang et al. 2022,
    * "Self-Consistency Improves Chain of Thought Reasoning"): per
    * problem, the MODAL answer across n sampled candidates (ties
    * broken by the lexicographically smallest answer — the
    * engine-wide deterministic tie-break), its vote count and
    * share, and whether the consensus answer is correct. `correct`
    * must be a property of the ANSWER (all candidates with equal
    * answer carry equal correctness); the operator takes bool_or
    * over the modal answer's candidates, so one inconsistent flag
    * widens to "some grader accepted it" rather than
    * engine-defined row pick.
    *
    * Scale shape: two hash aggregates — (problem, answer) vote
    * counts, then one min(struct) per problem (map-side combining;
    * a group never materializes its members, the preferencePairs
    * device). Null answers count as the sentinel empty string
    * (a vote for "no answer", not a dropped row — n must equal the
    * sample count). */
  def consensusVote(candidates: DataFrame, problemCol: Column,
      answerCol: Column, correctCol: Column): DataFrame =
    consensusFromVotes(candidates.select(problemCol.as("problem"),
        coalesce(answerCol.cast("string"), lit("")).as("answer"),
        coalesce(correctCol.cast("boolean"), lit(false)).as("__ok"))
      .groupBy(col("problem"), col("answer"))
      .agg(count(lit(1)).as("votes"),
        (max(when(col("__ok"), lit(1L)).otherwise(lit(0L))) === 1L)
          .as("ok")))

  /** The mode-selection arithmetic over a PRE-AGGREGATED
    * (problem, answer, votes, ok) vote table — shared by
    * [[consensusVote]] and the streaming monitor's live vote
    * snapshots, so the consensus a dashboard shows mid-run is the
    * exact batch decision. */
  def consensusFromVotes(votes: DataFrame): DataFrame =
    votes
      .groupBy(col("problem"))
      .agg(
        // min(struct(-votes, answer, ...)) = votes DESC, answer ASC
        min(struct((-col("votes")).as("nv"), col("answer"),
          col("votes"), col("ok"))).as("ch"),
        sum(col("votes")).as("n"),
        count(lit(1)).as("n_distinct_answers"))
      .select(col("problem"), col("n"), col("n_distinct_answers"),
        col("ch.answer").as("consensus_answer"),
        col("ch.votes").as("consensus_votes"),
        (col("ch.votes").cast("double") / col("n"))
          .as("vote_share"),
        col("ch.ok").as("consensus_correct"))
}
