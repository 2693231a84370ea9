package graft.operators

import graft.SparkTestBase

/** [[HeavyHitters]] — the Misra–Gries guarantee on streams that
  * actually evict (vocab ≫ capacity), and the exactness of the
  * composed candidate + re-count result.
  */
class HeavyHittersSpec extends SparkTestBase {

  import spark.implicits._

  private def run(items: Seq[String], k: Int, capacity: Int,
      partitions: Int = 4) =
    HeavyHitters.heavyHitters(
      spark.createDataset(items).repartition(partitions).toDF("term"),
      "term", k, capacity)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("adversarial eviction stream: the heavy item survives " +
      "thousands of decrements and re-counts exactly") {
    // vocab 2001 ≫ capacity 4: every singleton burst triggers the
    // decrement-all step, yet A (freq 400 > N/4 = 700? no — 400 >
    // 2800/4 is false; use freq big enough: N = 2000 + 800 = 2800,
    // A freq 800 > 2800/4 = 700) must survive somewhere
    val noise = (1 to 2000).map(i => s"x$i")
    val stream = new scala.util.Random(7)
      .shuffle(noise ++ Seq.fill(800)("A"))
    val top = run(stream, k = 1, capacity = 4)
    assert(top === Seq(("A", 800L)))
  }

  test("guarantee threshold: every item above N/capacity is exact " +
      "in the top-k") {
    // N = 300 + 150 + 1000 = 1450, capacity 8 → bound ≈ 181:
    // A (300) is guaranteed; B (150) is BELOW the bound yet usually
    // found — assert only the guaranteed item plus result exactness
    val noise = (1 to 1000).map(i => s"n$i")
    val stream = new scala.util.Random(11)
      .shuffle(Seq.fill(300)("A") ++ Seq.fill(150)("B") ++ noise)
    val top = run(stream, k = 1, capacity = 8)
    assert(top === Seq(("A", 300L)))
  }

  test("no-eviction regime: result identical to the full exact " +
      "top-k including tie-break") {
    val stream = Seq.fill(5)("b") ++ Seq.fill(5)("a") ++
      Seq.fill(3)("c") ++ Seq("d")
    // ties at 5 break by term asc: a before b
    assert(run(stream, k = 3, capacity = 100) ===
      Seq(("a", 5L), ("b", 5L), ("c", 3L)))
  }

  test("counts are exact re-counts, not MG residuals") {
    // MG's surviving counter for A is typically far below its true
    // frequency after decrements; the re-count pass must restore 800
    val stream = (1 to 2000).map(i => s"x$i") ++ Seq.fill(800)("A")
    val top = run(stream, k = 1, capacity = 4, partitions = 1)
    assert(top.head._2 === 800L)
  }
}
