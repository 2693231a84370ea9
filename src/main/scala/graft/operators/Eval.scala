package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
}
