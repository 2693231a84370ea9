package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Calibration]] — the max–min isotonic identity checked against a
  * reference sequential PAVA, and split-conformal order statistics
  * checked by hand. */
class CalibrationSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference pool-adjacent-violators over (weight, value) pairs. */
  private def pava(pools0: Seq[(Long, Double)]): Seq[Double] = {
    case class Pool(w: Long, sum: Double, span: Int)
    val pools = collection.mutable.ArrayBuffer.empty[Pool]
    pools0.foreach { case (w, v) =>
      pools += Pool(w, v * w, 1)
      while (pools.length >= 2 && {
        val a = pools(pools.length - 2); val b = pools.last
        a.sum / a.w >= b.sum / b.w
      }) {
        val b = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += Pool(a.w + b.w, a.sum + b.sum, a.span + b.span)
      }
    }
    pools.toSeq.flatMap(p => Seq.fill(p.span)(p.sum / p.w))
  }

  private def fitOf(rows: Seq[(Double, Boolean)], bins: Int) =
    Calibration.isotonicFit(rows.toDF("s", "y"), col("s"), col("y"),
      bins).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))

  test("isotonic fit matches reference PAVA on a noisy ramp") {
    // deterministic pseudo-noise over a rising trend, with enough
    // mass per bin that several raw rates invert
    val rows = (0 until 500).map { i =>
      val s = (i % 100) / 100.0
      val flip = (i * 2654435761L) % 97
      (s, flip < 20 + (s * 60).toInt)
    }
    val out = fitOf(rows, 10)
    // pools computed by reference PAVA over the same bin table
    val binTab = rows.groupBy { case (s, _) =>
        math.min((s * 10).toInt, 9) }
      .toSeq.sortBy(_._1)
      .map { case (b, xs) =>
        (xs.size.toLong, xs.count(_._2).toDouble / xs.size) }
    val expected = pava(binTab)
    assert(out.length === expected.length)
    out.map(_._4).zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-12, s"$got vs $want")
    }
    // monotone non-decreasing
    assert(out.map(_._4).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1) + 1e-15))
  }

  test("already-monotone rates are returned unchanged; total mass " +
      "is preserved") {
    val rows = (0 until 300).map { i =>
      val s = (i % 3) match { case 0 => 0.1; case 1 => 0.5; case _ => 0.9 }
      val accept = (i % 3) match {
        case 0 => i % 10 == 0; case 1 => i % 2 == 0; case _ => i % 10 != 0
      }
      (s, accept)
    }
    val out = fitOf(rows, 4)
    out.foreach { case (_, n, pos, iso) =>
      assert(math.abs(iso - pos.toDouble / n) < 1e-12)
    }
    // weighted mean of iso equals global positive rate (PAVA
    // preserves pool means, hence the grand mean)
    val grand = out.map(r => r._4 * r._2).sum / out.map(_._2).sum
    val raw = out.map(_._3).sum.toDouble / out.map(_._2).sum
    assert(math.abs(grand - raw) < 1e-12)
  }

  test("conformal thresholds: hand-computed order statistic and " +
      "coverage") {
    val cal = (1 to 9).map(i => (i.toDouble, i.toLong))
      .toDF("nc", "id")
    val test = Seq(0.5, 3.0, 5.0, 5.5, 9.5).zipWithIndex
      .map { case (v, i) => (v, 100L + i) }.toDF("nc", "id")
    val out = Calibration.conformalThresholds(cal, test, col("nc"),
        col("id"), alphas = Seq(0.5)).collect().head
    // k = ceil(0.5 * 10) = 5 -> threshold = 5.0
    assert(out.getLong(1) === 9L)
    assert(out.getLong(2) === 5L)
    assert(out.getDouble(3) === 5.0)
    // covered: 0.5, 3.0, 5.0 (<= 5.0) of 5
    assert(out.getLong(4) === 5L && out.getLong(5) === 3L)
    assert(math.abs(out.getDouble(6) - 0.6) < 1e-12)
    assert(out.getDouble(7) === 0.5)
  }

  test("conformal: alpha below 1/(n_cal+1) keeps its row with " +
      "threshold +inf and trivial coverage") {
    val cal = (1 to 5).map(i => (i.toDouble, i.toLong))
      .toDF("nc", "id")
    val test = Seq((3.0, 100L), (99.0, 101L)).toDF("nc", "id")
    val out = Calibration.conformalThresholds(cal, test, col("nc"),
        col("id"), alphas = Seq(0.1, 0.5)).orderBy("alpha")
      .collect()
    assert(out.length === 2) // the 0.1 row must NOT vanish
    val tight = out(0) // alpha = 0.1: k = ceil(.9*6) = 6 > 5
    assert(tight.getLong(2) === 6L)
    assert(tight.getDouble(3).isPosInfinity)
    assert(tight.getLong(5) === 2L &&
      tight.getDouble(6) === 1.0) // everything covered
    val loose = out(1) // alpha = 0.5: k = 3 -> threshold 3.0
    assert(loose.getDouble(3) === 3.0)
  }

  test("conformal ties break on id and the threshold is a real " +
      "calibration value; partition invariance") {
    val cal = Seq.fill(20)(1.0).zipWithIndex
      .map { case (v, i) => (v, i.toLong) }.toDF("nc", "id")
    val test = Seq((0.9, 900L), (1.1, 901L)).toDF("nc", "id")
    val out = Calibration.conformalThresholds(cal, test, col("nc"),
        col("id"), alphas = Seq(0.1)).collect().head
    assert(out.getDouble(3) === 1.0 && out.getLong(5) === 1L)
    val rows = (0 until 300).map(i =>
      (((i * 37) % 101) / 101.0, i.toLong)).toDF("nc", "id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Calibration.conformalThresholds(df, df, col("nc"), col("id"),
        Seq(0.2)).collect().map(_.toSeq).toSeq
    assert(run(rows) === run(rows.repartition(13)))
  }
}
