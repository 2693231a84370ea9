package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** NB quality-classifier invariants: a learnable vocabulary boundary
  * separates held-out documents, unseen tokens fall back to the
  * smoothed prior ratio, scores are content-pure (repartition-stable),
  * and the confusion report's counts and metrics are exact. */
class QualityClassifierSpec extends SparkTestBase {

  /** Train: seed docs speak "alpha/beta", rest speak "gamma/delta".
    * Held-out: one doc per vocabulary + one mixed + one unseen. */
  private def train = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta alpha beta alpha", true),
      (2L, "beta alpha beta alpha", true),
      (3L, "alpha beta beta", true),
      (4L, "gamma delta gamma delta", false),
      (5L, "delta gamma delta", false),
      (6L, "gamma gamma delta delta", false))
      .toDF("doc_id", "text", "is_seed")
  }

  private def test_ = {
    import spark.implicits._
    Seq(
      (10L, "alpha beta alpha"),          // seed vocabulary
      (11L, "gamma delta delta"),         // rest vocabulary
      (12L, "alpha gamma"),               // mixed
      (13L, "omega zeta"))                // never seen in training
      .toDF("doc_id", "text")
  }

  test("held-out documents separate by learned vocabulary") {
    val got = QualityClassifier.trainScore(train, test_, "doc_id",
        "text", "is_seed", buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got(10L)._1 > 0.0 && got(10L)._2, s"seed-vocab doc: $got")
    assert(got(11L)._1 < 0.0 && !got(11L)._2, s"rest-vocab doc: $got")
    // the mixed doc sits strictly between the pure ones
    assert(got(10L)._1 > got(12L)._1 && got(12L)._1 > got(11L)._1)
  }

  test("unseen-vocabulary doc falls back to the smoothed prior ratio") {
    val got = QualityClassifier.trainScore(train, test_, "doc_id",
        "text", "is_seed", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // with balanced classes (3 vs 3 docs) the prior is 0; both tokens
    // hit never-seen buckets whose lr is the smoothing ratio
    // ln(1/(Tseed+K)) - ln(1/(Trest+K)) — tiny, not a confident call
    assert(math.abs(got(13L)) < 0.1,
      s"unseen doc should score near the prior, got ${got(13L)}")
    // and far weaker than the seen-vocabulary calls
    assert(math.abs(got(13L)) < math.abs(got(10L)) / 5)
  }

  test("scores are content-pure: stable under repartitioning") {
    val base = QualityClassifier.trainScore(train, test_, "doc_id",
        "text", "is_seed", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val shuffled = QualityClassifier.trainScore(train.repartition(7),
        test_.repartition(5), "doc_id", "text", "is_seed", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(base.toSeq === shuffled.toSeq)
  }

  test("confusion report counts and metrics are exact") {
    import spark.implicits._
    val scored = Seq(
      (1L, true, true), (2L, true, true), (3L, true, false),
      (4L, false, true), (5L, false, false), (6L, false, false))
      .toDF("doc_id", "keep", "truth")
    val r = QualityClassifier.confusion(scored, "keep", "truth")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 1L, 2L)))
    assert(r.getDouble(4) === 2.0 / 3.0) // precision
    assert(r.getDouble(5) === 2.0 / 3.0) // recall
    assert(r.getDouble(6) === 4.0 / 6.0) // accuracy
  }

  test("calibration bins: empirical rate and truncated-sigmoid mean " +
      "match hand computation; bins are score-ordered") {
    import spark.implicits._
    val scored = Seq(
      (1L, -2.0, false), (2L, -1.0, false),
      (3L, 1.0, true), (4L, 2.0, true)).toDF("doc_id", "s", "y")
    val bins = QualityClassifier.calibration(scored, "s", "y",
      "doc_id", bins = 2).collect()
    assert(bins.map(_.getAs[Int]("bin")).toSeq === Seq(1, 2))
    val lo = bins(0); val hi = bins(1)
    assert(lo.getAs[Long]("n_docs") === 2L)
    assert(lo.getAs[Double]("frac_pos") === 0.0)
    assert(hi.getAs[Double]("frac_pos") === 1.0)
    def sig9(x: Double) = math.floor(1e9 / (1 + math.exp(-x))) / 1e9
    assert(math.abs(lo.getAs[Double]("mean_pred") -
      (sig9(-2.0) + sig9(-1.0)) / 2) < 1e-12)
    assert(math.abs(hi.getAs[Double]("mean_pred") -
      (sig9(1.0) + sig9(2.0)) / 2) < 1e-12)
    assert(lo.getAs[Double]("max_logodds") <
      hi.getAs[Double]("min_logodds"))
  }
}
