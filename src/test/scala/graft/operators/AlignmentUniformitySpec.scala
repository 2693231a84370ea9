package graft.operators

import graft.SparkTestBase

/** Wang-Isola metric behavior: tight clusters align well, a
  * collapsed space scores terrible uniformity, a spread space
  * scores strongly negative uniformity; determinism under
  * repartition. */
class AlignmentUniformitySpec extends SparkTestBase {
  import spark.implicits._

  private def metrics(rows: Seq[(Long, Int, Array[Float])]) =
    Eval.alignmentUniformity(
      rows.toDF("vec_id", "label", "embedding"),
      "vec_id", "label", "embedding").head()

  test("tight same-label clusters -> small alignment; collapsed " +
      "embeddings -> uniformity near 0; spread -> strongly negative") {
    val r = new scala.util.Random(9)
    val anchors = Array.fill(4, 8)(r.nextGaussian().toFloat * 2)
    val clustered = (0L until 120L).map { i =>
      val lb = (i % 4).toInt
      (i, lb, anchors(lb).map(x => x + r.nextGaussian().toFloat * 0.05f))
    }
    val good = metrics(clustered)
    assert(good.getDouble(1) < 0.1, s"alignment ${good.getDouble(1)}")
    assert(good.getDouble(3) < -1.0,
      s"uniformity ${good.getDouble(3)}")
    // collapsed: every vector identical -> alignment 0 but
    // uniformity 0 (the degenerate space the metric exists to catch)
    val collapsed = (0L until 60L).map(i =>
      (i, (i % 3).toInt, Array.fill(8)(0.5f)))
    val bad = metrics(collapsed)
    assert(math.abs(bad.getDouble(1)) < 1e-9)
    assert(bad.getDouble(3) > -1e-6, s"collapsed ${bad.getDouble(3)}")
    assert(good.getDouble(3) < bad.getDouble(3) - 1.0)
  }

  test("deterministic under repartition; pair counts match the " +
      "label and bucket structure") {
    val r = new scala.util.Random(4)
    val rows = (0L until 90L).map(i =>
      (i, (i % 5).toInt, Array.fill(6)(r.nextGaussian().toFloat)))
    val a = metrics(rows)
    val b = Eval.alignmentUniformity(
      rows.toDF("vec_id", "label", "embedding").repartition(7),
      "vec_id", "label", "embedding").head()
    assert(a.toSeq === b.toSeq)
    // 5 labels x 18 members -> 5 * C(18,2) positive pairs
    assert(a.getLong(0) === 5L * 18 * 17 / 2)
    assert(a.getLong(2) > 0L)
  }
}
