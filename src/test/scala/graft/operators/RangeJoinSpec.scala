package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Range-join semantics on a hand corpus: inclusive bounds, bucket
  * boundaries, no duplicate pairs, key isolation, and the equi-join
  * (never nested-loop) plan shape. */
class RangeJoinSpec extends SparkTestBase {

  private lazy val probe = {
    import spark.implicits._
    Seq(
      (1L, 7L, 1000L),
      (2L, 7L, 2000L),
      (3L, 8L, 1000L)
    ).toDF("pid", "key", "t")
  }

  private lazy val build = {
    import spark.implicits._
    // window will be [t-100, t+100]
    Seq(
      (7L, 900L, 1.0),   // on p1's lower bound (inclusive)
      (7L, 1100L, 2.0),  // on p1's upper bound (inclusive)
      (7L, 1101L, 3.0),  // just outside p1
      (7L, 1999L, 4.0),  // inside p2 only
      (8L, 1000L, 5.0),  // key isolation: matches p3, not p1
      (7L, 799L, 6.0)    // far outside any window
    ).toDF("key", "t", "v")
  }

  private def pairs() = RangeJoin.rangeJoin(probe, build, Seq("key"),
    "t", "t", lowerUs = -100L, upperUs = 100L, payloadCols = Seq("v"))
    .select("pid", "r_v").collect()
    .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq

  test("inclusive window bounds, key isolation, no false positives") {
    assert(pairs() === Seq((1L, 1.0), (1L, 2.0), (2L, 4.0), (3L, 5.0)))
  }

  test("no duplicate pairs across the two probe buckets") {
    // every (pid, r_v) pair appears exactly once even though each
    // probe row explodes into two bucket copies
    val all = pairs()
    assert(all.distinct === all)
  }

  test("bucket-boundary sweep matches a brute-force filter") {
    import spark.implicits._
    // randomized-but-seeded corpus across many bucket widths
    val rnd = new scala.util.Random(11)
    val p = (1 to 60).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(500).toLong))
      .toDF("pid", "key", "t")
    val b = (1 to 200).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, i.toDouble))
      .toDF("key", "t", "v")
    for ((lo, hi) <- Seq((-50L, 50L), (-37L, -1L), (1L, 113L))) {
      val got = RangeJoin.rangeJoin(p, b, Seq("key"), "t", "t",
        lo, hi, Seq("v"))
        .select("pid", "r_v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      val want = p.join(b, Seq("key"))
        .filter(b("t").between(p("t") + lo, p("t") + hi))
        .select("pid", "v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(got === want, s"window [$lo,$hi]")
    }
  }
}
