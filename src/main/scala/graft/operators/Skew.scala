package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7 hard part 6 / the 100 TB posture):
  * AQE's skew-join splitting covers sort-merge joins, but aggregation
  * hot keys and broadcast-averse skewed joins still need salting.
  */
object Skew {

  /** Salted two-phase aggregation: count-like/sum-like partial
    * aggregates first group on (key, salt) — spreading a hot key over
    * `salts` reducers — then merge on the key alone. `aggs` must be
    * re-aggregable (sum/count/min/max). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
        + xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"),
        sum(col("_n")).as("n"))

  /** Salted join for a skewed left side against a small-ish right
    * side that is too large to broadcast whole but fine to replicate
    * `salts`× : left rows get a random-ish salt, right rows are
    * exploded across every salt value, and the join key becomes
    * (key, salt) — a hot left key now lands on `salts` reducers. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedRight = right
      .withColumn("_salt",
        explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Top-N heavy hitters of a key column — the diagnostic that decides
    * whether salting is needed at all. */
  def heavyHitters(df: DataFrame, keyCol: String, n: Int): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(keyCol)).limit(n)

  /** Join/aggregation-key SKEW DIAGNOSTICS — the pre-flight a 100 TB
    * shuffle runs before committing to a partitioning: the top-K hot
    * keys with their corpus share and hot factor (count ÷ the
    * uniform-key expectation `n_rows/n_keys`; a hot factor of 40
    * means that key's reducer gets 40× the average partition — the
    * number the `salts` parameter of [[saltedJoin]] is sized from).
    * Globals ride every row (one broadcast one-row frame) so the
    * frame stays a single relation. Both divisions are single IEEE
    * ops on exact integer counts — oracle-exact.
    *
    * Scale: one map-side-combining count per key, a one-row global
    * fold over the KEY-sized count table, and a top-K take — the
    * corpus shuffles once, on the key being diagnosed. */
  def keyDiagnostics(df: DataFrame, keyCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK >= 1 ($topK)")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val globals = counts.agg(sum(col("cnt")).as("_nr"),
      count(lit(1)).as("_nk"))
    val top = counts.orderBy(desc("cnt"), col("key")).limit(topK)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("cnt"), col("key"))))
    top.crossJoin(broadcast(globals))
      .select(col("rnk").cast("long").as("rnk"), col("key"),
        col("cnt"),
        (col("cnt").cast("double") / col("_nr").cast("double"))
          .as("share"),
        (col("cnt").cast("double") * col("_nk") / col("_nr"))
          .as("hot_factor"),
        col("_nr").as("n_rows"), col("_nk").as("n_keys"))
  }
}
