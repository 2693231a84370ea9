package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Bradley–Terry preference-strength fitting (Bradley & Terry 1952)
  * via Hunter's MM updates (Hunter 2004) — the model behind
  * pairwise-preference leaderboards: given "a beat b" comparison
  * rows (RLHF preference pairs, A/B eval votes, arena battles),
  * recover a per-item strength w_i such that P(i beats j) =
  * w_i / (w_i + w_j). The MM update
  *
  *   w_i ← W_i / Σ_{j≠i} n_ij / (w_i + w_j),   then normalize,
  *
  * (W_i = wins of i, n_ij = games between i and j) monotonically
  * increases the likelihood and needs no step size.
  *
  * Exactness device (the [[Graph]] family contract): every
  * floating-point term is truncated to 12 decimals before any
  * aggregation, every aggregation runs over DECIMAL(28,15) — exact
  * and order-free under any partitioning — and each update is
  * re-truncated, so R rounds replay bit-identically in a DuckDB
  * oracle unrolling the same algebra.
  *
  * Scale shape: the comparison frame is data-sized but collapses to
  * one (item, item) count frame in a single hash aggregate; rounds
  * then join the K-item strength frame (broadcast — item count is
  * model/policy-bounded, not corpus-bounded) against the K²-bounded
  * pair-count frame. `localCheckpoint` per round cuts the growing
  * plan exactly as the PageRank loop does. */
object BradleyTerry {

  private def t12(x: Column): Column =
    floor(x * lit(1e12)).cast("double") / lit(1e12)

  /** Exact order-free sum: 12-decimal terms over DECIMAL(28,15)
    * (terms here are n_ij/(w_i+w_j) and can exceed 1 — 13 integer
    * digits of headroom). */
  private def xsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 15))).cast("double")

  /** Fit strengths from `(winnerCol, loserCol)` comparison rows.
    * Returns one row per item: `(item, n_wins, n_games, strength)`
    * with strengths normalized to sum 1 (12-decimal truncated).
    * Items that only ever lose keep strength 0 under MM — real, not
    * a degeneracy; items never compared at all do not appear. */
  def fit(df: DataFrame, winnerCol: String, loserCol: String,
      rounds: Int = 8): DataFrame = {
    require(rounds >= 1, "need at least one MM round")
    // self-comparisons carry no information under BT and would put
    // i = j rows in the games frame — dropped.
    val directed = df
      .select(col(winnerCol).as("w_item"), col(loserCol).as("l_item"))
      .where(col("w_item") =!= col("l_item"))
      .groupBy(col("w_item"), col("l_item"))
      .agg(count(lit(1)).as("n_wl"))
      .localCheckpoint()
    // symmetric games-played frame n_ij (i ≠ j, both directions kept
    // so the per-i denominator is a straight groupBy("i"))
    val games = directed
      .select(col("w_item").as("i"), col("l_item").as("j"),
        col("n_wl").as("n"))
      .unionByName(directed.select(col("l_item").as("i"),
        col("w_item").as("j"), col("n_wl").as("n")))
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n_ij"))
      .localCheckpoint()
    val wins = games.select(col("i").as("item")).distinct()
      .join(directed.groupBy(col("w_item").as("item"))
        .agg(sum(col("n_wl")).as("w")), Seq("item"), "left")
      .select(col("item"), coalesce(col("w"), lit(0L)).as("n_wins"))
      .localCheckpoint()
    var strength = wins.select(col("item"), lit(1.0).as("s"))
    for (_ <- 1 to rounds) {
      val denom = games
        .join(broadcast(strength.select(col("item").as("i"),
          col("s").as("s_i"))), Seq("i"))
        .join(broadcast(strength.select(col("item").as("j"),
          col("s").as("s_j"))), Seq("j"))
        .withColumn("term",
          t12(col("n_ij").cast("double") / (col("s_i") + col("s_j"))))
        .groupBy(col("i").as("item")).agg(xsum(col("term")).as("d"))
      val raw = wins.join(denom, Seq("item"))
        .select(col("item"),
          t12(col("n_wins").cast("double") / col("d")).as("s_raw"))
      val tot = raw.agg(xsum(col("s_raw")).as("tot"))
      strength = raw.crossJoin(broadcast(tot))
        .select(col("item"), t12(col("s_raw") / col("tot")).as("s"))
        .localCheckpoint()
    }
    val played = games.groupBy(col("i").as("item"))
      .agg(sum(col("n_ij")).as("n_games"))
    wins.join(played, Seq("item"))
      .join(strength, Seq("item"))
      .select(col("item"), col("n_wins"), col("n_games"),
        col("s").as("strength"))
  }
}
