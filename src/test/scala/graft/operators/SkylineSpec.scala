package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Skyline.paretoFront]] — brute-force cross-check (the NOT
  * EXISTS definition), duplicate/tie semantics, bucket-count
  * invariance, and partition invariance. */
class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Double)])
      : Set[(Long, Long, Double)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx <= x && qy <= y && (qx < x || qy < y) }
    }.toSet

  private def run(pts: Seq[(Long, Long, Double)], buckets: Int) =
    Skyline.paretoFront(pts.toDF("id", "x", "y"), "x", "y", buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet

  test("matches the brute-force definition on deterministic " +
      "pseudo-random clouds, at any bucket count") {
    for (seed <- 1 to 4) {
      val pts = (0 until 120).map { i =>
        val x = ((i * 37 + seed * 13) % 50).toLong
        val y = ((i * 91 + seed * 7) % 40) / 4.0
        (i.toLong, x, y)
      }
      val want = brute(pts)
      for (b <- Seq(1, 4, 16, 64))
        assert(run(pts, b) === want, s"seed=$seed buckets=$b")
    }
  }

  test("duplicate points on the front are all kept; a same-x " +
      "higher-y point is dominated") {
    val pts = Seq((1L, 5L, 1.0), (2L, 5L, 1.0), (3L, 5L, 2.0),
      (4L, 9L, 0.5))
    val got = run(pts, 4)
    assert(got === Set((1L, 5L, 1.0), (2L, 5L, 1.0), (4L, 9L, 0.5)))
  }

  test("a strictly improving staircase keeps every point; a " +
      "dominated interior point drops") {
    val stairs = Seq((1L, 1L, 5.0), (2L, 2L, 4.0), (3L, 3L, 3.0),
      (4L, 4L, 2.0), (5L, 5L, 1.0))
    assert(run(stairs, 2) === stairs.toSet)
    val withDom = stairs :+ ((6L, 3L, 4.5)) // dominated by (3,3.0)
    assert(run(withDom, 2) === stairs.toSet)
  }

  test("partition invariance") {
    val pts = (0 until 200).map(i =>
      (i.toLong, ((i * 17) % 60).toLong, ((i * 29) % 45) / 3.0))
    val df = pts.toDF("id", "x", "y")
    def f(d: org.apache.spark.sql.DataFrame) =
      Skyline.paretoFront(d, "x", "y").collect()
        .map(_.toSeq).toSet
    assert(f(df) === f(df.repartition(23)))
  }
}
