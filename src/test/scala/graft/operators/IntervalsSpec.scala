package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Intervals.mergedCoverage]] — overlap merge, touching-segment
  * merge, gaps, duplicates, containment, multi-media isolation, and
  * partition invariance. */
class IntervalsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(segs: Seq[(String, Long, Long)]) =
    Intervals.mergedCoverage(segs.toDF("m", "s", "e"), "m", "s", "e")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("overlap and touching merge; gaps split islands") {
    // [0,10) ∪ [5,15) ∪ [15,20) = [0,20); gap; [30,35)
    val out = run(Seq(("a", 0L, 10L), ("a", 5L, 15L),
      ("a", 15L, 20L), ("a", 30L, 35L)))
    assert(out("a") === ((4L, 2L, 25L, 35L)))
  }

  test("contained and duplicate segments add nothing to coverage") {
    val out = run(Seq(("a", 0L, 100L), ("a", 10L, 20L),
      ("a", 10L, 20L), ("a", 0L, 100L)))
    assert(out("a") === ((4L, 1L, 100L, 100L)))
  }

  test("media ids are isolated") {
    val out = run(Seq(("a", 0L, 10L), ("b", 5L, 15L)))
    assert(out("a") === ((1L, 1L, 10L, 10L)))
    assert(out("b") === ((1L, 1L, 10L, 10L)))
  }

  test("a chain of touching unit segments is one island") {
    val out = run((0L until 50L).map(i => ("a", i, i + 1)))
    assert(out("a") === ((50L, 1L, 50L, 50L)))
  }

  test("partition invariance") {
    val segs = (0 until 300).map(i =>
      (s"m${i % 7}", ((i * 13) % 100).toLong,
        ((i * 13) % 100 + 1 + i % 30).toLong))
    val df = segs.toDF("m", "s", "e")
    def f(d: org.apache.spark.sql.DataFrame) =
      Intervals.mergedCoverage(d, "m", "s", "e").orderBy("m")
        .collect().map(_.toSeq).toSeq
    assert(f(df) === f(df.repartition(17)))
  }
}
