package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine: every entry point
  * (Verify, Bench, tests) builds sessions here so configs stay
  * consistent.
  *
  *  - `nanosAsLong`: the `events` testdata carries TIMESTAMP(NANOS),
  *    which Spark's parquet reader only accepts as raw longs; the
  *    [[graft.queries.Tables]] loader converts back to (truncated)
  *    microsecond timestamps, matching DuckDB's ns→us truncation.
  *  - UTC session timezone for oracle parity.
  *  - shuffle partitions sized to local cores, not the 200 default.
  */
object GraftSession {
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
