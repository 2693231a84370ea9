package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._

/** Relational surface (SURVEY §2.5-§2.9): scan-agg, joins (broadcast /
  * semi / anti), windows, rollup, top-k, set ops — over the TPC-H-ish
  * testdata. Each query has a DuckDB oracle in [[oracle]].
  *
  * Scale notes (100 TB posture): only FIXED-size dimensions (region 5
  * rows, nation 25) are broadcast explicitly — customer/part/supplier
  * scale with SF, so their join strategy is AQE's call (broadcast
  * while under the threshold, shuffle join beyond; a forced hint
  * would OOM a 1000-executor job). Fact-fact joins shuffle on their
  * keys; every group-by runs partial aggregation map-side because
  * measures are plain Catalyst aggregates. No driver-side collects
  * anywhere.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: scan + filter + groupBy agg.
    * Reference analog: analytics throughput/efficiency family
    * (`docs/analytics.md:27-94`). */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** lineitem ⋈ part + top-N revenue per brand (A7/T4). part scales
    * with SF, so no forced broadcast — AQE broadcasts while it fits
    * the threshold and falls back to a shuffle join at scale. */
  def q02TopBrandRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("p_brand"))
      .limit(20)

  /** orders ⋈ customer grouped by market segment (customer scales
    * with SF — join strategy left to AQE, see q02). */
  def q03SegmentOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_revenue"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** 5-way join through the dimension chain (TPC-H Q5 analog):
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, revenue by nation.
    * Fixed-size dims (nation 25, region 5) broadcast explicitly;
    * customer scales with SF so its strategy is AQE's call. The big
    * shuffle is lineitem⋈orders on orderkey (AQE-coalesced). */
  def q04RevenueByNation(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("r_name"), col("n_name"))

  /** Left-anti join: customers with no order above 250k (reference
    * orphan-audit pattern J3/J5, `parquet_service.py:116-149`). */
  def q05CustomersNoOrders(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 250000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-semi join: customers having at least one high-value order. */
  def q06HighValueCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > 100000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Week-over-week revenue delta via lag window (W1,
    * `analytics.md:160-175`). */
  def q07WeeklyRevenueWow(s: SparkSession, d: String): DataFrame = {
    val weekly = orders(s, d)
      .groupBy(date_trunc("week", col("o_orderdate")).as("week"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy(col("week"))
    weekly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("wow_delta", col("revenue") - col("prev_revenue"))
      .orderBy(col("week"))
  }

  /** Top-3 orders per customer via ranked window (W3/T1 retrieval-rank
    * pattern, `llm_setup.py:273-274`). */
  def q08Top3OrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Rollup over status × priority (grouping-sets surface, SURVEY §2.6). */
  def q09OrdersRollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** Conditional aggregation (A4 error-rate analog) on lineitem flags. */
  def q10ReturnRate(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).as("n_returned"),
        (sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("double")
          / count(lit(1))).as("return_rate"))
      .orderBy(col("l_linestatus"))

  /** Exact distinct counting surface (A6/A8). */
  def q11DistinctCounts(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  /** CASE-bucketing + grouped counts (F15 routing-column analog). */
  def q12QuantityBuckets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .withColumn("bucket",
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("total_price"))
      .orderBy(col("bucket"))

  /** Set ops: union / intersect / except over customer-key sets
    * (SURVEY §2.9 new-engine surface). */
  def q13SetOps(s: SparkSession, d: String): DataFrame = {
    val buyers = orders(s, d).select(col("o_custkey").as("custkey")).distinct()
    val bigBuyers = orders(s, d).filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("custkey")).distinct()
    val autoSeg = customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("custkey"))
    buyers.intersect(autoSeg)
      .except(bigBuyers)
      .orderBy(col("custkey"))
  }

  /** Correlated-style aggregate filter: orders above their customer's
    * average order value (scalar-subquery family A5). */
  def q14AboveAvgOrders(s: SparkSession, d: String): DataFrame = {
    val custAvg = orders(s, d).groupBy(col("o_custkey").as("k"))
      .agg(davg(col("o_totalprice")).as("avg_price"))
    orders(s, d)
      .join(custAvg, col("o_custkey") === col("k"))
      .filter(col("o_totalprice") > col("avg_price"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Running cumulative sum per supplier ordered by ship date
    * (rowsBetween frame surface, SURVEY §2.7). */
  def q15RunningSupplierQty(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .filter(col("l_suppkey") <= 3)
      .withColumn("running_qty",
        sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"))
  }

  /** CUBE over status × priority (completes the grouping-analytics
    * family next to rollup q09 / grouping sets q40). */
  def q47OrdersCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"),
        asc_nulls_first("o_orderpriority"))

  /** Ordered list aggregation: per customer, the numerically-sorted
    * order keys joined to one string (array_agg surface with a
    * deterministic order contract). */
  def q48OrderLists(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        concat_ws(",", transform(array_sort(collect_list(col("o_orderkey"))),
          x => x.cast("string"))).as("order_keys"))
      .orderBy(col("o_custkey"))

  /** TPC-H Q17 analog: revenue from small-quantity lineitems, where
    * "small" is relative to each part's own average quantity — the
    * correlated-scalar-subquery shape (Catalyst decorrelates to the
    * same per-part aggregate join written here). */
  def q50SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val partAvg = lineitem(s, d).groupBy(col("l_partkey").as("pk"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    lineitem(s, d)
      .join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** TPC-H Q3 analog (shipping priority): segment filter + 3-way join
    * + grouped revenue, top-10 by revenue. */
  def q51ShippingPriority(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)

  /** TPC-H Q10 analog (returned items): revenue lost to returns per
    * customer, top 20. */
  def q52ReturnedRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  /** TPC-H Q19 analog: disjunctive bracket predicates over the
    * part join (Catalyst pushes the common conjuncts; the OR brackets
    * evaluate post-join). */
  def q53BracketRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15)
          && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25)
          && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity") >= 20))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"),
        count(lit(1)).as("n_items"))

  /** Exact interpolated percentiles of order value per status
    * (Spark `percentile` ≡ DuckDB `quantile_cont`: both interpolate
    * at p·(n−1) between the two bracketing order statistics). */
  def q62PricePercentiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(o_totalprice, 0.25D)").as("p25"),
        expr("percentile(o_totalprice, 0.5D)").as("p50"),
        expr("percentile(o_totalprice, 0.75D)").as("p75"),
        expr("percentile(o_totalprice, 0.95D)").as("p95"))
      .orderBy(col("o_orderstatus"))

  /** TPC-H Q21 analog (waiting suppliers): suppliers that were the
    * ONLY supplier with a returned line on a finished multi-supplier
    * order — the double-correlated EXISTS + NOT-EXISTS shape. (The
    * testdata has no commit/receipt dates, so "kept the order
    * waiting" becomes "was the sole returner"; the join/decorrelation
    * structure is identical.) Spark-first: both correlated
    * subqueries become semi/anti hash joins on `l_orderkey` with the
    * supplier inequality as a residual filter — no per-row subquery
    * execution anywhere. */
  def q69WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val l1 = li.filter(col("l_returnflag") === "R")
      .join(orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = li.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    l1
      .join(l2, col("l_orderkey") === col("k2") &&
        col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") &&
        col("l_suppkey") =!= col("s3"), "left_anti")
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
      .limit(20)
  }

  /** TPC-H Q2 analog (min-cost supplier): the testdata has no
    * partsupp table, so supply cost is derived — per (part, supplier)
    * the minimum observed unit price in lineitem — and each small
    * part is matched to the supplier(s) achieving its global minimum
    * cost (the correlated-scalar-MIN shape; Catalyst decorrelates the
    * oracle's subquery into exactly the per-part min-join written
    * here). MIN of identical per-row IEEE doubles is
    * order-insensitive, so no decimal cast is needed. */
  def q70MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val cost = lineitem(s, d).filter(col("l_quantity") > 0)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(col("l_extendedprice") / col("l_quantity"))
        .as("unit_cost"))
    val best = cost.groupBy(col("pk").as("bpk"))
      .agg(min(col("unit_cost")).as("best_cost"))
    part(s, d).filter(col("p_size") < 10)
      .join(cost, col("p_partkey") === col("pk"))
      .join(best, col("pk") === col("bpk") &&
        col("unit_cost") === col("best_cost"))
      .join(supplier(s, d), col("sk") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("s_acctbal"), col("unit_cost"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  /** TPC-H Q22 analog (rich inactive customers): global scalar
    * subquery (average positive balance) + NOT EXISTS anti-join +
    * per-nation aggregate. "Inactive" = no URGENT order (the plain
    * no-orders predicate is empty at sf0.001 — same decorrelated
    * shape, anti side pre-filtered). The scalar is one broadcast row;
    * the anti join hashes on `o_custkey` — both decorrelation-free
    * shapes at any scale. */
  def q71RichInactiveCustomers(s: SparkSession, d: String): DataFrame = {
    val avgBal = customer(s, d).filter(col("c_acctbal") > 0.0)
      .agg(davg(col("c_acctbal")).as("avg_bal"))
    customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H Q7 analog (trade volume between nation pairs): the
    * customer's nation vs the supplier's nation per lineitem, yearly
    * discounted revenue per directed pair — the two-dimension-chain
    * multi-join (nation joins twice under different roles). */
  def q76NationTrade(s: SparkSession, d: String): DataFrame = {
    val custNation = customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val suppNation = supplier(s, d)
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
        6).as("revenue"))
      .filter(col("revenue") > 500000.0)
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q16 analog (supplier counts per part attribute): distinct
    * suppliers observed per (brand, type-prefix, size) through the
    * lineitem bridge (no partsupp table), excluding one brand — the
    * count-distinct-after-join shape. */
  def q77PartSupplierCounts(s: SparkSession, d: String): DataFrame =
    part(s, d).filter(col("p_brand") =!= "Brand#1")
      .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"),
        substring(col("p_type"), 1, 6).as("p_type_prefix"),
        col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"),
        col("p_type_prefix"), col("p_size"))
      .limit(50)

  /** TPC-H Q8 analog (market share): one nation's share of yearly
    * revenue within its region's customer base — conditional
    * aggregation over a five-table join chain, exact-decimal
    * numerator and denominator divided at the end. */
  def q78MarketShare(s: SparkSession, d: String): DataFrame = {
    val custGeo = customer(s, d)
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val suppNation = supplier(s, d)
      .join(nation(s, d).select(col("n_nationkey").as("sn_key"),
          col("n_name").as("supp_nation")),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(custGeo, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .filter(col("r_name") === "AMERICA")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_3",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(0.0), 6) /
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
          6)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q18 analog (large-volume orders): orders whose total
    * quantity clears a floor, rejoined to customer detail — the
    * agg-then-semi-rejoin shape. The HAVING aggregate runs once over
    * lineitem (map-side partials, one shuffle on `l_orderkey`); the
    * qualifying key set then drives plain hash joins, so nothing here
    * is quadratic at 100×. */
  def q83LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .groupBy(col("l_orderkey").as("bk"))
      .agg(dsum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150.0)
    orders(s, d)
      .join(big, col("o_orderkey") === col("bk"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q15 analog (top supplier): revenue per supplier over a
    * ship-date window, keep the supplier(s) achieving the global
    * maximum — the agg → scalar-MAX → equality-join shape. The max is
    * a one-row broadcast; both sides of the equality come from the
    * same exact decimal sum, so double equality is safe. */
  def q84TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-07-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("total_rev"))
    val top = rev.agg(max(col("total_rev")).as("max_rev"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_rev") === col("max_rev"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q11 analog (important parts): per-part discounted value,
    * kept only where it exceeds 1.5× the average per-part value — the
    * global-scalar-in-HAVING shape. The scalar (total / part count) is
    * derived from the same single aggregation output, broadcast as one
    * row; the fraction is relative to the part population, so the
    * predicate stays selective as SF grows (a fixed fraction-of-total
    * goes empty at scale). */
  def q85ImportantParts(s: SparkSession, d: String): DataFrame = {
    val pv = lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("value"))
    // ONE lineitem scan: the global threshold re-aggregates pv itself
    // (Σ of exact per-part decimal totals ≡ the grand total, and the
    // part count is pv's row count), so the second subtree shares the
    // first's shuffle via ReusedExchange instead of re-reading the
    // fact table. Per-part values round-trip double→DECIMAL(18,6)
    // exactly below ~10 significant digits of dollars; the oracle
    // applies the identical re-aggregation so the casts agree.
    val thr = pv
      .agg((dsum(col("value"), 6) / count(lit(1))).as("avg_part_value"))
    pv.crossJoin(broadcast(thr))
      .filter(col("value") > lit(1.5) * col("avg_part_value"))
      .select(col("l_partkey"), col("value"))
      .orderBy(desc("value"), col("l_partkey"))
  }

  /** TPC-H Q13 analog (customer order-count distribution): LEFT join
    * so zero-order customers land in the c_count=0 bucket — the
    * outer-join-then-histogram shape (two aggregations, the second
    * over the first's keys). */
  def q90CustomerDistribution(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** TPC-H Q5 analog (local supplier volume): revenue from lineitems
    * whose customer and supplier share a nation — the cyclic join
    * (the supplier join carries an extra equality back to the
    * customer's nation key, closing the cycle). */
  def q91LocalSupplierVolume(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))

  /** TPC-H Q9 analog (product-type profit): profit = discounted
    * revenue − a retail-price-derived supply cost (the testdata has
    * no partsupp, so cost = 0.5 · p_retailprice · l_quantity), per
    * supplier nation per year for one part type — the five-table
    * chain with a two-sided measure. */
  def q92ProfitByNation(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(part(s, d).filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - lit(0.5) * col("p_retailprice") * col("l_quantity"), 6)
        .as("profit"))
      .orderBy(col("nation"), desc("o_year"))

  /** TPC-H Q4 analog (order priority checking): orders in a quarter
    * with at least one slow lineitem (shipped >60 days after the
    * order date — the testdata has no commit/receipt dates), counted
    * per priority. The EXISTS becomes one left-semi hash join on
    * `l_orderkey`; the date filter reaches the orders scan before the
    * join, so the semi probe side shrinks with the quarter, not SF. */
  def q96OrderPriority(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
      .join(lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))

  /** TPC-H Q10 analog (returned-item reporting): revenue lost to
    * returns per customer over a quarter, top 20 — the
    * filter → 3-way join → agg → top-N shape. Customer and nation are
    * broadcast-size dims; the only big shuffle is the final group on
    * `c_custkey`, and TakeOrderedAndProject keeps the top-N off the
    * driver until the very end. */
  def q97ReturnedCustomers(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  /** TPC-H Q12 analog (shipping priority classes): per line status
    * (the testdata has no ship mode), how many lines of a ship-year
    * belong to high- vs low-priority orders — the two-way
    * conditional-count pivot. Integer counts, so no float parity
    * work; one join, one two-row aggregate. */
  def q98PriorityClasses(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))

  /** TPC-H Q14 analog (promotion effect): percentage of a month's
    * revenue from PROMO-type parts. Both numerator and denominator
    * are exact decimal sums over the SAME aggregate (one pass, no
    * second scan); their double ratio is a single IEEE op, so the
    * oracle mirrors it bit-for-bit. */
  def q99PromoRevenue(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(part(s, d), col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6) /
        dsum(rev, 6)).as("promo_revenue"))
  }

  /** TPC-H Q6 analog (forecast revenue change): revenue that would
    * have been kept had a discount band been dropped — the pure
    * scan-filter-aggregate. All three predicates push into the
    * parquet scan (PushedFilters), the aggregate is map-side partial
    * → one-row final; the fastest possible shape at any SF. */
  def q100RevenueChange(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6)
        .as("revenue"))

  /** TPC-H Q20 analog (dominant part suppliers): suppliers who
    * shipped MORE than half of a small part's 1997 volume — the
    * testdata has no partsupp/availqty, so "excess stock" becomes
    * "dominant shipper" with identical structure: a per-(part,
    * supplier) aggregate compared against a per-part scalar, feeding
    * a semi-join into the supplier dimension. Both aggregates come
    * from one filtered lineitem scan shape; the comparison join is
    * a hash join on the part key; suppliers surface via LEFT SEMI. */
  def q111DominantSuppliers(s: SparkSession, d: String): DataFrame = {
    val li97 = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(part(s, d).filter(col("p_size") < 15),
        col("l_partkey") === col("p_partkey"))
    val perSupp = li97.groupBy(col("l_partkey").as("pk"),
        col("l_suppkey").as("sk"))
      .agg(dsum(col("l_quantity")).as("supp_qty"))
    val perPart = li97.groupBy(col("l_partkey").as("pk2"))
      .agg(dsum(col("l_quantity")).as("part_qty"))
    val dominant = perSupp
      .join(perPart, col("pk") === col("pk2"))
      .filter(col("supp_qty") > lit(0.5) * col("part_qty"))
      .select(col("sk")).distinct()
    supplier(s, d)
      .join(dominant, col("s_suppkey") === col("sk"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_dominant_suppliers" -> (q111DominantSuppliers _),
    "q96_order_priority" -> (q96OrderPriority _),
    "q97_returned_customers" -> (q97ReturnedCustomers _),
    "q98_priority_classes" -> (q98PriorityClasses _),
    "q99_promo_revenue" -> (q99PromoRevenue _),
    "q100_revenue_change" -> (q100RevenueChange _),
    "q90_customer_distribution" -> (q90CustomerDistribution _),
    "q91_local_supplier_volume" -> (q91LocalSupplierVolume _),
    "q92_profit_by_nation" -> (q92ProfitByNation _),
    "q83_large_orders" -> (q83LargeOrders _),
    "q84_top_supplier" -> (q84TopSupplier _),
    "q85_important_parts" -> (q85ImportantParts _),
    "q76_nation_trade" -> (q76NationTrade _),
    "q77_part_supplier_counts" -> (q77PartSupplierCounts _),
    "q78_market_share" -> (q78MarketShare _),
    "q69_waiting_suppliers" -> (q69WaitingSuppliers _),
    "q70_min_cost_supplier" -> (q70MinCostSupplier _),
    "q71_rich_inactive_customers" -> (q71RichInactiveCustomers _),
    "q47_orders_cube" -> (q47OrdersCube _),
    "q48_order_lists" -> (q48OrderLists _),
    "q50_small_qty_revenue" -> (q50SmallQtyRevenue _),
    "q51_shipping_priority" -> (q51ShippingPriority _),
    "q52_returned_revenue" -> (q52ReturnedRevenue _),
    "q53_bracket_revenue" -> (q53BracketRevenue _),
    "q62_price_percentiles" -> (q62PricePercentiles _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_top_brand_revenue" -> (q02TopBrandRevenue _),
    "q03_segment_orders" -> (q03SegmentOrders _),
    "q04_revenue_by_nation" -> (q04RevenueByNation _),
    "q05_customers_no_orders" -> (q05CustomersNoOrders _),
    "q06_high_value_customers" -> (q06HighValueCustomers _),
    "q07_weekly_revenue_wow" -> (q07WeeklyRevenueWow _),
    "q08_top3_orders_per_customer" -> (q08Top3OrdersPerCustomer _),
    "q09_orders_rollup" -> (q09OrdersRollup _),
    "q10_return_rate" -> (q10ReturnRate _),
    "q11_distinct_counts" -> (q11DistinctCounts _),
    "q12_quantity_buckets" -> (q12QuantityBuckets _),
    "q13_set_ops" -> (q13SetOps _),
    "q14_above_avg_orders" -> (q14AboveAvgOrders _),
    "q15_running_supplier_qty" -> (q15RunningSupplierQty _),
  )

  val oracle: Map[String, String] = Map(
    "q111_dominant_suppliers" ->
      """WITH li97 AS (
        |  SELECT l_partkey, l_suppkey, l_quantity
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |    AND p_size < 15),
        |per_supp AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS supp_qty
        |  FROM li97 GROUP BY 1, 2),
        |per_part AS (
        |  SELECT l_partkey AS pk2,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS part_qty
        |  FROM li97 GROUP BY 1)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT sk FROM per_supp JOIN per_part ON pk = pk2
        |  WHERE supp_qty > 0.5 * part_qty)
        |ORDER BY s_suppkey""".stripMargin,
    "q96_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q97_returned_customers" ->
      """SELECT c_custkey, c_name, n_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        |   AND o_orderdate >= TIMESTAMP '1997-01-01'
        |   AND o_orderdate < TIMESTAMP '1997-04-01'
        | JOIN lineitem ON o_orderkey = l_orderkey
        |   AND l_returnflag = 'R'
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q98_priority_classes" ->
      """SELECT l_linestatus,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q99_promo_revenue" ->
      """SELECT 100.0e0 *
        | CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END
        |   AS DECIMAL(18,6))) AS DOUBLE) /
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "q100_revenue_change" ->
      """SELECT CAST(SUM(CAST(l_extendedprice*l_discount
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05e0 AND l_discount <= 0.07e0
        |  AND l_quantity < 24""".stripMargin,
    "q90_customer_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q91_local_supplier_volume" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        |   AND s_nationkey = c_nationkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q92_profit_by_nation" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |   - 0.5*p_retailprice*l_quantity
        |   AS DECIMAL(18,6))) AS DOUBLE) AS profit
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q83_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey AS bk,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    > 150.0)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  o_totalprice, total_qty
        |FROM orders JOIN big ON o_orderkey = bk
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q84_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-07-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q85_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) AS value
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, value
        |FROM pv
        |WHERE value > 1.5 * (
        |  SELECT CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        |    / COUNT(*)
        |  FROM pv)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q76_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | year(l_shipdate) AS l_year,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE cn.n_name <> sn.n_name
        |GROUP BY 1, 2, 3
        |HAVING CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) > 500000.0
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q77_part_supplier_counts" ->
      """SELECT p_brand, substr(p_type, 1, 6) AS p_type_prefix, p_size,
        | COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type_prefix, p_size
        |LIMIT 50""".stripMargin,
    "q78_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        | CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
        |     THEN l_extendedprice*(1.0-l_discount) ELSE 0.0 END
        |   AS DECIMAL(18,6))) AS DOUBLE)
        | / CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)
        |   AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        | JOIN region ON cn.n_regionkey = r_regionkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE r_name = 'AMERICA'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q69_waiting_suppliers" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q70_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    MIN(l_extendedprice / l_quantity) AS unit_cost
        |  FROM lineitem WHERE l_quantity > 0 GROUP BY 1, 2)
        |SELECT p_partkey, p_name, s_name, s_acctbal, unit_cost
        |FROM part
        | JOIN cost ON p_partkey = pk
        | JOIN supplier ON sk = s_suppkey
        |WHERE p_size < 10
        |  AND unit_cost = (SELECT MIN(c2.unit_cost) FROM cost c2
        |                   WHERE c2.pk = p_partkey)
        |ORDER BY p_partkey, s_name""".stripMargin,
    "q71_rich_inactive_customers" ->
      """SELECT c_nationkey, COUNT(*) AS numcust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |   AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |     / COUNT(c_acctbal)
        |  FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q62_price_percentiles" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        | quantile_cont(o_totalprice, 0.25) AS p25,
        | quantile_cont(o_totalprice, 0.5) AS p50,
        | quantile_cont(o_totalprice, 0.75) AS p75,
        | quantile_cont(o_totalprice, 0.95) AS p95
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q51_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-06-01'
        |  AND l_shipdate > TIMESTAMP '1998-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q52_returned_revenue" ->
      """SELECT c_custkey, c_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q53_bracket_revenue" ->
      """SELECT
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND l_quantity >= 20)""".stripMargin,
    "q50_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |   AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem l1
        |WHERE l_quantity < 0.5 * (
        |  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(l_quantity)
        |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    "q47_orders_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q48_order_lists" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        | string_agg(CAST(o_orderkey AS VARCHAR), ','
        |   ORDER BY o_orderkey) AS order_keys
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/COUNT(l_quantity) AS avg_qty,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_top_brand_revenue" ->
      """SELECT p_brand,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY revenue DESC, p_brand LIMIT 20""".stripMargin,
    "q03_segment_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        | COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q05_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q06_high_value_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q07_weekly_revenue_wow" ->
      """WITH weekly AS (
        | SELECT date_trunc('week', o_orderdate) AS week,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        | FROM orders GROUP BY 1)
        |SELECT week, revenue,
        | lag(revenue, 1) OVER (ORDER BY week) AS prev_revenue,
        | revenue - lag(revenue, 1) OVER (ORDER BY week) AS wow_delta
        |FROM weekly ORDER BY week""".stripMargin,
    "q08_top3_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) WHERE rnk <= 3
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q09_orders_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q10_return_rate" ->
      """SELECT l_linestatus, COUNT(*) AS n_items,
        | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / COUNT(*) AS return_rate
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q11_distinct_counts" ->
      """SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
        | COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps,
        | COUNT(*) AS n_rows FROM lineitem""".stripMargin,
    "q12_quantity_buckets" ->
      """SELECT CASE WHEN l_quantity < 10 THEN 'low'
        |  WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q13_set_ops" ->
      """SELECT custkey FROM (
        | SELECT DISTINCT o_custkey AS custkey FROM orders
        | INTERSECT
        | SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        | EXCEPT
        | SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY custkey""".stripMargin,
    "q14_above_avg_orders" ->
      """WITH cust_avg AS (
        | SELECT o_custkey AS k,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / COUNT(o_totalprice) AS avg_price
        | FROM orders GROUP BY 1)
        |SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders JOIN cust_avg ON o_custkey = k
        |WHERE o_totalprice > avg_price ORDER BY o_orderkey""".stripMargin,
    "q15_running_supplier_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,
  )
}
