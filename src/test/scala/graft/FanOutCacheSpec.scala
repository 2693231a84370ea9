package graft

import org.apache.spark.sql.functions._

/** fanOutForCompute's partition-count probe costs a physical
  * planning pass; the decision must be computed once per
  * (plan, parallelism) and served from cache on the repeated calls
  * a bench loop makes (r12 verdict item 6). */
class FanOutCacheSpec extends SparkTestBase {

  test("narrow frame fans out to full parallelism, wide frame " +
      "passes through, decisions cached per canonical plan") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = spark.range(0, 100, 1, 1).toDF("x")
    val before = GraftSession.fanOutCacheSize(spark)

    val out = GraftSession.fanOutForCompute(narrow)
    assert(out.rdd.getNumPartitions === target)
    val afterFirst = GraftSession.fanOutCacheSize(spark)
    assert(afterFirst === before + 1)

    // the SAME plan again: served from cache, no new entry
    GraftSession.fanOutForCompute(spark.range(0, 100, 1, 1).toDF("x"))
    assert(GraftSession.fanOutCacheSize(spark) === afterFirst)

    // a frame already at cluster width is untouched
    val wide = spark.range(0, 1000, 1, target).toDF("x")
    assert(GraftSession.fanOutForCompute(wide).rdd
      .getNumPartitions === target)
    assert(GraftSession.fanOutCacheSize(spark) === afterFirst + 1)

    // a different plan shape gets its own decision
    GraftSession.fanOutForCompute(narrow.filter(col("x") > 1))
    assert(GraftSession.fanOutCacheSize(spark) === afterFirst + 2)
  }
}
