package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Cusum.upperCusum]] — the window identity equals the textbook
  * recursion S_t = max(0, S_{t−1} + x_t − k) on arbitrary series,
  * alarms fire at the right buckets, resets after quiet periods,
  * groups isolate, and partitioning never changes the result. */
class CusumSpec extends SparkTestBase {
  import spark.implicits._

  private def recursive(xs: Seq[Long], k: Long): Seq[Long] =
    xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail

  test("window identity equals the recursion on pseudo-random " +
      "series") {
    for (seed <- 1 to 5) {
      val xs = (0 until 40).map(i => ((i * 17 + seed * 29) % 13).toLong)
      val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
        .toDF("t", "x")
      val got = Cusum.upperCusum(df, Seq.empty, "t", "x", k = 6L,
          h = 10L)
        .orderBy("t").collect().map(_.getAs[Long]("cusum")).toSeq
      assert(got === recursive(xs, 6L), s"seed=$seed")
    }
  }

  test("a spike alarms, a later quiet period resets to zero") {
    // spike lifts S to 21; k=2 decays 2/step, so 11 quiet steps
    // drain it back to exactly 0
    val xs = Seq(1L, 1L, 9L, 9L, 9L) ++ Seq.fill(11)(0L)
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
      .toDF("t", "x")
    val rows = Cusum.upperCusum(df, Seq.empty, "t", "x", k = 2L,
        h = 10L)
      .orderBy("t").collect()
    val cus = rows.map(_.getAs[Long]("cusum")).toSeq
    assert(cus === recursive(xs, 2L))
    assert(rows.map(_.getAs[Boolean]("alarm")).toSeq ===
      cus.map(_ > 10L))
    assert(cus.last === 0L) // fully reset
  }

  test("groups are independent; partition invariance") {
    val rows = for (g <- Seq("a", "b"); t <- 0L until 30L)
      yield (g, t, if (g == "a") (t % 5) else 10L - (t % 4))
    val df = rows.toDF("g", "t", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      Cusum.upperCusum(d, Seq("g"), "t", "x", k = 4L, h = 20L)
        .orderBy("g", "t").collect().map(_.toSeq).toSeq
    val base = run(df)
    assert(base === run(df.repartition(11)))
    val perG = base.groupBy(_.head).map { case (g, rs) =>
      g -> rs.map(_(3).asInstanceOf[Long]) }
    assert(perG("a") === recursive((0L until 30L).map(_ % 5), 4L))
    assert(perG("b") === recursive((0L until 30L).map(t => 10L - (t % 4)), 4L))
  }
}
