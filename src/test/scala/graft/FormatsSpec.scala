package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth: the engine's tables round-trip
  * losslessly through JSON-lines, CSV, and ORC (ingestion feeds
  * arrive in all three in practice), and Spark's parquet scans push
  * MIN/MAX/COUNT aggregation into the reader when enabled — the
  * footer-statistics shortcut that answers metadata queries without
  * touching row data at 100 TB. */
class FormatsSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "lang", "source", "n_chars", "text")

  private def roundTrip(fmt: String, dir: String): Unit = {
    docs.write.mode("overwrite").format(fmt)
      .option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
      .select("doc_id", "lang", "source", "n_chars", "text")
    val a = docs.orderBy("doc_id").collect().map(_.toSeq.map(_.toString))
    val b = back.orderBy("doc_id").collect().map(_.toSeq.map(_.toString))
    assert(a.length === b.length && a.indices.forall(i => a(i) == b(i)),
      s"$fmt round-trip diverged")
  }

  test("documents round-trip through JSON lines") {
    roundTrip("json", s"${sys.props("java.io.tmpdir")}/graft-fmt-json")
  }

  test("documents round-trip through CSV") {
    roundTrip("csv", s"${sys.props("java.io.tmpdir")}/graft-fmt-csv")
  }

  test("documents round-trip through ORC") {
    roundTrip("orc", s"${sys.props("java.io.tmpdir")}/graft-fmt-orc")
  }

  test("parquet scans push MIN/MAX/COUNT into the reader when enabled") {
    // aggregate pushdown is a DataSource-V2 feature: route parquet
    // through V2 for this read (V1 is Spark's default list)
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val v1Key = "spark.sql.sources.useV1SourceList"
    val prevAgg = spark.conf.get(aggKey, "false")
    val prevV1 = spark.conf.get(v1Key)
    try {
      spark.conf.set(aggKey, "true")
      spark.conf.set(v1Key, "")
      val agg = spark.read.parquet(s"$sf/lineitem.parquet")
        .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [MIN(l_orderkey), " +
        "MAX(l_orderkey), COUNT(*)]"), plan.take(1500))
      assert(agg.collect()(0).getLong(2) > 0)
    } finally {
      spark.conf.set(aggKey, prevAgg)
      spark.conf.set(v1Key, prevV1)
    }
  }
}
