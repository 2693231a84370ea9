package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage source selection — the data-acquisition
  * planner: "which K sources (crawls, dumps, vendors) add the most
  * NEW content, in what order?" Each round picks the source with
  * the largest count of word-shingles not yet covered by earlier
  * picks (the classic (1−1/e)-approximation to max-coverage, the
  * standard greedy data-buying heuristic), reporting per pick its
  * marginal gain and the cumulative distinct-shingle coverage.
  *
  * All counting is integer over a DISTINCT (shingle, source) pair
  * table — exact and order-free — and the winner tie-break is
  * (gain DESC, source ASC), so K rounds replay exactly in SQL.
  *
  * Scale shape: the pair table is ONE distinct aggregate of the
  * exploded shingle stream; each round is a source-count aggregate
  * (|sources|-row frame), a sort-limit-1 winner, and ONE anti-join
  * that SHRINKS the remaining pair table by the winner's shingles —
  * no covered-set ever materializes (its size is the running sum of
  * the gains, which are disjoint by construction), so per-round work
  * decreases monotonically. `picks` is planner-bounded (you are
  * choosing datasets, not documents). Once no source has positive
  * marginal gain, later rounds emit NO row — a zero-gain source is
  * not a pick.
  *
  * The checkpointed pair table carries `xxhash64(shingle)` LONGS,
  * not the shingle strings: every round re-materializes the whole
  * remaining table, and the output is pure COUNTS, so an 8-byte
  * fingerprint is count-equivalent to the string up to hash
  * collisions — P[any collision] ≤ |pairs|²/2⁶⁵ (< 10⁻⁷ even at
  * 10⁹ distinct shingles), and a collision UNDER-counts one shingle
  * deterministically, it does not destabilize the replay. The
  * oracle counts the strings directly; agreement is the absence of
  * collisions, which the bound prices. ~6× fewer checkpoint bytes
  * per round at sf0.1 (word-trigram strings average ~18 chars). */
object CoveragePlanner {

  def greedySourceCoverage(df: DataFrame, textCol: String,
      sourceCol: String, shingleN: Int = 3, picks: Int = 5)
      : DataFrame = {
    require(shingleN >= 1, "shingleN must be >= 1")
    require(picks >= 1, "picks must be >= 1")
    val tk = split(col(textCol), " ")
    val sh = when(size(tk) >= shingleN,
      transform(sequence(lit(1), size(tk) - (shingleN - 1)),
        i => concat_ws(" ",
          (0 until shingleN).map(o => element_at(tk, i + o)): _*)))
      .otherwise(array())
    // fan out the base scan before the shingle explode — the
    // expression-dense stage must run at cluster width even when the
    // input is one small file/row group (no-op at scale)
    val pairs = graft.GraftSession.fanOutForCompute(df)
      .select(col(sourceCol).as("source"), explode(sh).as("sh_str"))
      .select(col("source"), xxhash64(col("sh_str")).as("shingle"))
      .distinct().localCheckpoint()
    val total = pairs.select(col("shingle")).distinct()
      .agg(count(lit(1)).as("total"))
    var remaining = pairs
    var rows = Vector.empty[DataFrame]
    for (r <- 1 to picks) {
      val winner = remaining.groupBy(col("source"))
        .agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("source")).limit(1)
        .localCheckpoint()
      val winShingles = remaining
        .join(broadcast(winner.select(col("source"))),
          Seq("source"), "left_semi")
        .select(col("shingle"))
      remaining = remaining
        .join(broadcast(winner.select(col("source"))),
          Seq("source"), "left_anti")
        .join(winShingles, Seq("shingle"), "left_anti")
        .localCheckpoint()
      rows = rows :+ winner
        .select(lit(r.toLong).as("round"), col("source"), col("gain"))
    }
    // gains are disjoint new shingles, so cumulative coverage is
    // their running sum — a window over the ≤picks-row result frame
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("round"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    rows.reduce(_ unionByName _)
      .crossJoin(broadcast(total))
      .withColumn("cum_covered", sum(col("gain")).over(w))
      .withColumn("cum_frac", col("cum_covered").cast("double") /
        col("total").cast("double"))
      .select(col("round"), col("source"), col("gain"),
        col("cum_covered"), col("cum_frac"))
  }
}
