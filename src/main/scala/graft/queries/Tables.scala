package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loaders + parity helpers shared by every query suite.
  *
  * Oracle-parity rules (Spark result must hash-match DuckDB running the
  * oracle SQL on the same parquet):
  *  - Never SUM/AVG raw doubles across rows: parallel partial aggregation
  *    makes the summation order nondeterministic. Cast each row's value to
  *    an exact DECIMAL first (deterministic per-row rounding), sum exactly,
  *    then cast the final result back to DOUBLE. DuckDB side mirrors the
  *    same casts, so results are bit-identical.
  *  - Per-row double arithmetic (a*b, 1-d) is IEEE-deterministic and safe.
  *  - Always ORDER BY a full deterministic key set.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet; Spark reads it as a
    * raw long (nanosAsLong) and we truncate to microseconds here —
    * the same ns→us truncation DuckDB applies on read. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** See [[graft.GraftSession.fanOutForCompute]] (central home so
    * operators can use it too). */
  def fanOutForCompute(df: DataFrame): DataFrame =
    graft.GraftSession.fanOutForCompute(df)

  /** Length-bucketed-batch oracle replay over a caller-supplied
    * `$src(doc_id, n_tokens)` CTE (the
    * [[graft.operators.Packing.lengthBucketedBatches]] arithmetic) —
    * ends at `gb(batch_id, n_items, max_len, sum_len)`; pair with
    * [[lengthBatchSelect]]. Shared by q264 and the composed q266 so
    * the rank/batch arithmetic lives in ONE place. */
  private[queries] def lengthBatchCtes(src: String,
      batchSize: Int): String =
    s"""lbr AS (
      |  SELECT doc_id, n_tokens,
      |    row_number() OVER (ORDER BY n_tokens DESC, doc_id)
      |      AS rnk
      |  FROM $src),
      |lbb AS (
      |  SELECT n_tokens, CAST(FLOOR(
      |    CAST(rnk - 1 AS DOUBLE) / $batchSize) AS BIGINT)
      |    AS batch_id
      |  FROM lbr),
      |gb AS (
      |  SELECT batch_id, COUNT(*) AS n_items,
      |    CAST(MAX(n_tokens) AS BIGINT) AS max_len,
      |    CAST(SUM(n_tokens) AS BIGINT) AS sum_len
      |  FROM lbb GROUP BY batch_id)""".stripMargin

  /** The final projection over [[lengthBatchCtes]]'s `gb`. */
  private[queries] val lengthBatchSelect: String =
    """SELECT batch_id, n_items, max_len, sum_len,
      |  n_items * max_len - sum_len AS padding,
      |  CASE WHEN n_items * max_len > 0 THEN
      |    CAST(n_items * max_len - sum_len AS DOUBLE) /
      |    CAST(n_items * max_len AS DOUBLE)
      |  END AS pad_frac
      |FROM gb ORDER BY batch_id""".stripMargin

  /** Shared exact-decimal OLS oracle tail over a caller-supplied
    * `$pts(x, y)` CTE of 9-decimal-truncated ln coordinates — the
    * [[graft.operators.PowerLaw]] closed form (q288 Zipf, q289
    * Heaps). Emits the stats CTE plus the final one-row SELECT. */
  private[queries] def olsLogLogTailSql(pts: String,
      nAlias: String): String =
    s"""stols AS (
      |  SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(floor(x * x * 1e9) / 1e9 AS DECIMAL(38,9)))
      |      AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(floor(x * y * 1e9) / 1e9 AS DECIMAL(38,9)))
      |      AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(floor(y * y * 1e9) / 1e9 AS DECIMAL(38,9)))
      |      AS DOUBLE) AS syy
      |  FROM $pts)
      |SELECT CAST(n AS BIGINT) AS $nAlias,
      |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
      |    AS intercept,
      |  ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |    ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      |FROM stols""".stripMargin

  /** Exact sum of a double column: per-row cast to DECIMAL(18,scale)
    * (deterministic), exact decimal sum, final cast to double.
    * DuckDB mirror: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic mean built from the exact sum. DuckDB mirror:
    * CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)
}
