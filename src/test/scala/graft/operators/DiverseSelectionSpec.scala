package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[DiverseSelection.kCenterSelect]] — farthest-first order on a
  * geometry with a known answer, radius monotonicity, seed choice,
  * and partition invariance. */
class DiverseSelectionSpec extends SparkTestBase {
  import spark.implicits._

  // four unit-ish 2-d directions: 0°, ~5°, 90°, 180° (as floats)
  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.996f, 0.087f)),   // ~5° from id 0
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)))

  test("farthest-first picks the opposite direction first, then " +
      "orthogonal, then the near-duplicate last") {
    val out = DiverseSelection.kCenterSelect(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", 4)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._2).toSeq === Seq(0L, 3L, 2L, 1L))
    assert(out(0)._3 === 0.0)
    assert(math.abs(out(1)._3 - 2.0) < 1e-9)  // cos distance to -x
    assert(math.abs(out(2)._3 - 1.0) < 1e-9)  // orthogonal
    assert(out(3)._3 < 0.01)                  // the ~5° near-dup
  }

  test("covering radius is non-increasing after the seed") {
    val pts = (0 until 60).map { i =>
      val a = i * 0.1
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }
    val d = DiverseSelection.kCenterSelect(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", 8)
      .orderBy("round").collect().map(_.getDouble(2)).drop(1)
    assert(d.zip(d.tail).forall { case (a, b) => b <= a + 1e-12 },
      d.mkString(", "))
  }

  test("seed is the lowest id; k=1 returns only the seed") {
    val out = DiverseSelection.kCenterSelect(
        vecs.reverse.toDF("vec_id", "embedding"), "vec_id",
        "embedding", 1).collect()
    assert(out.length === 1 && out(0).getLong(1) === 0L)
  }

  test("partition invariance") {
    val pts = (0 until 80).map(i => (i.toLong,
      Array(((i * 13) % 31).toFloat, ((i * 7) % 17).toFloat,
        ((i * 3) % 11).toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      DiverseSelection.kCenterSelect(d, "vec_id", "embedding", 5)
        .orderBy("round").collect().map(_.toSeq).toSeq
    assert(run(df) === run(df.repartition(13)))
  }
}
