package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling for data-quality auditing (builder brief: the
  * inspection step a training-data pipeline runs before trusting a
  * new corpus drop — null rates and cardinalities catch schema rot
  * and join-key duplication before they poison downstream stages).
  *
  * One aggregation pass computes every column's non-null, null, and
  * exact distinct counts, then unpivots to one row per column.
  * Exact distincts on every column cost one expanded aggregate
  * (Spark rewrites multi-distinct via expand — rows × columns), the
  * honest price of exactness; at 100 TB swap in
  * `approx_count_distinct` per column for a single-pass sketch (the
  * same shape, HLL accuracy trade documented in SketchSpec). */
object Profile {

  /** (column_name, non_null, nulls, n_distinct) per listed column,
    * ordered by column name. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        countDistinct(col(c)).as(s"_nd_$c"))
    }
    val total = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column_name"),
        col(s"_nn_$c").as("non_null"),
        (col("_n") - col(s"_nn_$c")).as("nulls"),
        col(s"_nd_$c").as("n_distinct"))
    }
    total.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.column_name"), col("p.non_null"),
        col("p.nulls"), col("p.n_distinct"))
      .orderBy(col("column_name"))
  }

  /** The 100 TB form of [[profile]]: exact null/non-null counts but
    * SKETCHED distinct counts — every listed column is unpivoted to a
    * (column_name, value) stream and cardinality-estimated by the
    * deterministic HyperLogLog in [[Sketches.hllDistinct]] (1024
    * integers of state per column, mergeable across shards) instead
    * of the exact multi-distinct expand whose shuffle carries every
    * distinct value of every column. Values hash via their string
    * form (null rows dropped before hashing), so any column type
    * profiles; the estimate column carries HLL's ~3.25 % σ.
    *
    * Output: (column_name, non_null, nulls, distinct_est), ordered by
    * column name. */
  def profileSketched(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"),
          col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.column_name"), col("p.v"))
    val counts = stacked.groupBy(col("column_name")).agg(
      count(col("v")).as("non_null"),
      (count(lit(1)) - count(col("v"))).as("nulls"))
    val est = Sketches.hllDistinct(stacked.filter(col("v").isNotNull),
      "column_name", "v")
    counts.join(est, "column_name")
      .select(col("column_name"), col("non_null"), col("nulls"),
        col("hll_est").as("distinct_est"))
      .orderBy(col("column_name"))
  }
}
