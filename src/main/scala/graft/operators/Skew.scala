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
}
