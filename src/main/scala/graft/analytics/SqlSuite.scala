package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Tables

/** The SQL surface (SURVEY §3.4 / Milestone 5): the reference ships a
  * DuckDB reporting suite (`docs/analytics.md`) executed as raw SQL;
  * this module proves the engine's `spark.sql` path by running
  * PORTABLE SQL — each query text below executes verbatim in BOTH
  * Spark SQL and the DuckDB oracle, so the oracle entry IS the query.
  *
  * Portability subset: date_trunc, CASE, CAST, window lag, GROUPING
  * SETS, decimal-cast exact aggregation (see Tables scaladoc), NULLS
  * FIRST ordering.
  */
object SqlSuite {

  /** Register every testdata table as a temp view (events with the
    * ns→µs-truncated timestamp, same as the oracle sees). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      Tables.t(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
  }

  /** Portable SQL texts — run verbatim on both engines. */
  val portable: Map[String, String] = Map(
    "q38_sql_weekly_trend" ->
      """WITH weekly AS (
        | SELECT date_trunc('week', ts) AS week, COUNT(*) AS n
        | FROM events GROUP BY 1)
        |SELECT week, n, n - lag(n, 1) OVER (ORDER BY week) AS delta
        |FROM weekly ORDER BY week""".stripMargin,
    "q39_sql_funnel" ->
      """SELECT COUNT(*) AS n_users,
        | CAST(SUM(CASE WHEN s_ts IS NOT NULL AND p_ts IS NOT NULL
        |   AND s_ts < p_ts THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM (
        | SELECT user_id,
        |  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
        |  MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
        | FROM events GROUP BY user_id)""".stripMargin,
    "q40_sql_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |   AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q44_sql_window_zoo" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        | RANK() OVER w AS rnk,
        | DENSE_RANK() OVER w AS drnk,
        | NTILE(4) OVER w AS quartile,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |   PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS rolling3
        |FROM orders WHERE o_orderkey < 1000
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderstatus, rnk, o_orderkey""".stripMargin,
    "q45_sql_snapshot" ->
      """SELECT
        | (SELECT COUNT(*) FROM orders) AS n_orders,
        | (SELECT COUNT(*) FROM lineitem) AS n_lineitems,
        | (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_buyers,
        | (SELECT CAST(MAX(o_totalprice) AS DOUBLE) FROM orders)
        |   AS max_order,
        | (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM lineitem) AS total_qty""".stripMargin,
    // TPC-H Q21/Q22 flavor: correlated EXISTS + NOT EXISTS — Catalyst
    // decorrelates both into semi/anti joins.
    "q59_sql_exists" ->
      """SELECT c.c_custkey, c.c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |        WHERE o.o_custkey = c.c_custkey
        |          AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c.c_custkey""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    portable.map { case (name, sql) =>
      name -> ((s: SparkSession, d: String) => {
        registerTables(s, d)
        s.sql(sql)
      })
    }

  /** The oracle is the identical text. */
  val oracle: Map[String, String] = portable
}
