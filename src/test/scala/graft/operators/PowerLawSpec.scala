package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[PowerLaw.zipfFit]] — exponent recovery on exact power-law
  * data, tie-break determinism, the top-R cut, and partition
  * invariance. */
class PowerLawSpec extends SparkTestBase {
  import spark.implicits._

  test("recovers the exponent of exact f = C / r^s data with " +
      "r2 ~ 1") {
    // counts c_r = round(1e6 / r^1.5): ln c = ln 1e6 − 1.5 ln r up
    // to rounding, so the fit must give slope ≈ −1.5, r² ≈ 1.
    val counts = (1 to 100)
      .map(r => (s"t$r", math.round(1e6 / math.pow(r, 1.5))))
      .toDF("term", "cnt")
    val row = PowerLaw.zipfFit(counts, "term", "cnt", topR = 100)
      .collect()(0)
    assert(row.getAs[Long]("n_ranks") === 100L)
    assert(math.abs(row.getAs[Double]("slope") - (-1.5)) < 1e-3)
    assert(row.getAs[Double]("r2") > 0.999999)
    assert(math.abs(row.getAs[Double]("intercept") -
      math.log(1e6)) < 1e-3)
  }

  test("flat (uniform) frequencies give slope 0") {
    val counts = (1 to 50).map(r => (s"t$r", 7L)).toDF("term", "cnt")
    val row = PowerLaw.zipfFit(counts, "term", "cnt", topR = 50)
      .collect()(0)
    // 9-decimal term truncation leaves a ~1e-9 residue, never more
    assert(math.abs(row.getAs[Double]("slope")) < 1e-8)
  }

  test("top-R cut: only the R most frequent types enter the fit, " +
      "ties broken by term") {
    // 5 types at count 10 (ties) + 5 at count 1; topR = 5 must use
    // exactly the count-10 block in term order.
    val counts = (('a' to 'e').map(c => (c.toString, 10L)) ++
      ('v' to 'z').map(c => (c.toString, 1L))).toDF("term", "cnt")
    val row = PowerLaw.zipfFit(counts, "term", "cnt", topR = 5)
      .collect()(0)
    assert(row.getAs[Long]("n_ranks") === 5L)
    // all-equal block: slope is a truncation residue, not a trend
    assert(math.abs(row.getAs[Double]("slope")) < 1e-8)
  }

  test("partition invariance") {
    val counts = (1 to 80)
      .map(r => (s"t$r", math.round(5e5 / math.pow(r, 1.1))))
      .toDF("term", "cnt")
    def run(df: org.apache.spark.sql.DataFrame) =
      PowerLaw.zipfFit(df, "term", "cnt", topR = 60)
        .collect()(0).toSeq
    assert(run(counts) === run(counts.repartition(13)))
  }
}
