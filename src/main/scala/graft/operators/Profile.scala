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
}
