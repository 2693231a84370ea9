package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[Corpus]] — curation operators pinned against the reference
  * window-function semantics they replace: globalRank vs a
  * single-partition row_number, curriculumInterleave vs the real
  * ntile + interleave windows, exactQuantiles vs Spark's exact
  * percentile, and the blocklist join's broadcast-anti plan shape. */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("globalRank equals the single-partition window row_number " +
      "under any input partitioning") {
    val df = (1 to 500).map(i => (((i * 7919) % 271).toLong, i.toLong))
      .toDF("score", "id")
    val expected = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("score"), col("id")))
          .cast("long"))
      .collect().map(_.toSeq).toSet
    val got = Corpus.globalRank(df.repartition(13),
        Seq(col("score"), col("id")))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
  }

  test("curriculumInterleave closed-form arithmetic matches the " +
      "window replay across ragged n / k combinations") {
    for (n <- Seq(3, 17, 101); k <- Seq(1, 4, 5)) {
      val df = (1 to n).map(i => (i.toLong, ((i * 31) % 47).toLong))
        .toDF("id", "score")
      val w = Window.orderBy(col("score"), col("id"))
      val expected = df
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("bucket", ntile(k).over(w).cast("long"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("rnk")))
          .cast("long"))
        .withColumn("training_pos", row_number().over(
          Window.orderBy(col("pos"), col("bucket"))).cast("long"))
        .select("id", "rnk", "bucket", "pos", "training_pos")
        .collect().map(_.toSeq).toSet
      val got = Corpus.curriculumInterleave(df, "score", "id", k)
        .select("id", "rnk", "bucket", "pos", "training_pos")
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"n=$n k=$k")
    }
  }

  test("curriculumInterleave order is a bijection onto 1..n that " +
      "cycles all buckets in every difficulty window") {
    val df = (1 to 23).map(i => (i.toLong, i.toLong))
      .toDF("id", "score")
    val rows = Corpus.curriculumInterleave(df, "score", "id", 5)
      .orderBy("training_pos").collect()
    assert(rows.map(_.getAs[Long]("training_pos")).toSeq ===
      (1L to 23L))
    assert(rows.take(5).map(_.getAs[Long]("bucket")).toSet ===
      Set(1L, 2L, 3L, 4L, 5L))
  }

  test("exactQuantiles (histogram form) equals Spark's exact " +
      "percentile") {
    val df = (1 to 400).map(i =>
      (s"g${i % 3}", ((i * 97) % 53 + 1).toLong)).toDF("g", "v")
    val got = Corpus.exactQuantiles(df, "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
          "p875" -> 0.875))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Seq(r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))))).toMap
    val expected = df.groupBy("g").agg(count(lit(1)).as("n"),
        expr("percentile(v, array(cast(0.25 as double), " +
          "cast(0.5 as double), cast(0.75 as double), " +
          "cast(0.875 as double)))").as("qs"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(got.keySet === expected.keySet)
    for ((g, (n, qs)) <- expected) {
      assert(got(g)._1 === n, s"n for $g")
      assert(got(g)._2 === qs, s"quantiles for $g")
    }
  }

  test("blocklistFilter drops exactly the blocked keys via a " +
      "broadcast left-anti join") {
    val df = (1 to 100).map(i => (i.toLong, s"src${i % 10}"))
      .toDF("id", "source")
    val blocked = Seq("src1", "src3").toDF("s")
    val out = Corpus.blocklistFilter(df, "source", blocked)
    assert(out.count() === 80)
    assert(out.filter(col("source").isin("src1", "src3")).count()
      === 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan)
  }
}
