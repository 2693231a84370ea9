package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate surface (SURVEY §2.6 "approx_count_distinct
  * for HLL"): error bounds against exact answers on testdata, plus
  * the partition-pruning property of the bucketed archive sink. */
class SketchSpec extends SparkTestBase {

  test("approx_count_distinct within rsd of exact (HLL)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
      .head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentile_approx brackets the exact median") {
    val ev = graft.queries.Tables.events(spark, sf)
    val r = ev.agg(
      median(col("value")).as("exact"),
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx"))
      .head()
    assert(math.abs(r.getDouble(1) - r.getDouble(0))
      <= 0.05 * math.max(1.0, math.abs(r.getDouble(0))))
  }

  test("archive sink: doc_bucket partition filter prunes the scan") {
    import spark.implicits._
    val chunks = Seq(
      ("c1", "DOC_AAAA0001", "one"), ("c2", "DOC_BBBB0002", "two"),
      ("c3", "DOC_CCCC0003", "three"))
      .toDF("chunk_id", "document_id", "chunk")
    val dir = java.nio.file.Files.createTempDirectory("arch").toString
    graft.operators.Ingest.writeArchive(chunks, dir, buckets = 8)
    val read = spark.read.parquet(dir)
      .filter(col("doc_bucket") === 3)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("doc_bucket"),
      s"expected partition pruning in:\n$plan")
    // and the data round-trips
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("count-min sketch: estimates are one-sided (≥ true count) " +
      "and within eps·N on the corpus word stream") {
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
    val n = words.count()
    val truth = words.groupBy("word").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cms = words.stat.countMinSketch(
      "word", eps = 0.001, confidence = 0.99, seed = 42)
    truth.foreach { case (w, c) =>
      val est = cms.estimateCount(w)
      assert(est >= c, s"CMS under-counted $w: $est < $c")
      assert(est <= c + (0.001 * n).toLong + 1,
        s"CMS error for $w beyond eps*N: $est vs $c (N=$n)")
    }
  }

  test("HLL sketches are MERGEABLE: union of per-day sketches " +
      "equals the whole-corpus sketch exactly (incremental " +
      "cardinality maintenance)") {
    // The 100 TB pattern: sketch each ingest batch once, persist the
    // binary sketch, union to answer "distinct over any window" —
    // never recount. HLL registers are per-bucket maxima, so the
    // union of disjoint partial sketches is IDENTICAL to one pass
    // over everything (same lgK) — exact equality, not approximate.
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val unioned = daily
      .agg(hll_sketch_estimate(
        hll_union_agg(col("sk"), lit(false))).as("est"))
      .head().getLong(0)
    val whole = ev
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .head().getLong(0)
    assert(unioned === whole,
      s"union-of-parts must equal single-pass: $unioned vs $whole")
    val exact = ev.select("user_id").distinct().count().toDouble
    assert(math.abs(unioned - exact) / exact < 0.05,
      s"estimate $unioned too far from exact $exact")
  }

  test("bloom filter: no false negatives, FPP near the configured " +
      "bound (the join-pruning sketch)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val bf = li.stat.bloomFilter("l_orderkey", 10000, 0.03)
    val keys = li.select("l_orderkey").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(keys.forall(bf.mightContain), "bloom false negative")
    val absent = (1 to 20000).map(i => 10000000L + i)
      .count(k => bf.mightContain(k))
    assert(absent.toDouble / 20000 < 0.06,
      s"observed FPP ${absent / 20000.0} far above configured 0.03")
  }
}
