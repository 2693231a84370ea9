package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Salting correctness: salted results equal unsalted results. */
class SkewSpec extends SparkTestBase {

  private lazy val skewed = {
    import spark.implicits._
    // hot key 1 with 10k rows, cold keys with a few
    ((1 to 10000).map(i => (1L, i.toDouble)) ++
      (1 to 20).map(i => (2L, i.toDouble)) ++
      Seq((3L, 42.0))).toDF("k", "v")
  }

  test("saltedSum equals plain groupBy sum") {
    val salted = Skew.saltedSum(skewed, "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted === plain)
  }

  test("saltedJoin equals plain join") {
    import spark.implicits._
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"))
      .toDF("k", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy("k", "label").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val plain = skewed.join(dim, "k")
      .groupBy("k", "label").count()
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(salted === plain)
  }

  test("heavyHitters surfaces the hot key first") {
    val top = Skew.heavyHitters(skewed, "k", 2).collect()
    assert(top(0).getLong(0) === 1L && top(0).getLong(1) === 10000L)
  }

  test("keyDiagnostics: hand-computed share and hot factor, " +
      "deterministic tie order, globals on every row") {
    import spark.implicits._
    // 8 rows over 4 keys: a=4, b=2, c=1, d=1 -> mean 2
    val df = Seq("a", "a", "a", "a", "b", "b", "c", "d")
      .toDF("k")
    val out = Skew.keyDiagnostics(df, "k", topK = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (1L, "a", 4L, 0.5, 2.0, 8L, 4L),
      (2L, "b", 2L, 0.25, 1.0, 8L, 4L),
      (3L, "c", 1L, 0.125, 0.5, 8L, 4L))) // c before d on the tie
  }
}
