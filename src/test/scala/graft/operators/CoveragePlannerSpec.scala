package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[CoveragePlanner.greedySourceCoverage]] — greedy pick order on
  * hand-built overlap structure, marginal (not total) gains, short
  * docs, tie-breaks, and partition invariance. */
class CoveragePlannerSpec extends SparkTestBase {
  import spark.implicits._

  // 1-gram shingles make coverage sets readable: source A covers
  // {a b c d}, B covers {c d e}, C covers {e f}.
  private val docs = Seq(
    ("a b c d", "A"),
    ("c d e", "B"),
    ("e f", "C")).toDF("text", "source")

  test("greedy order maximizes MARGINAL gain, not total size; " +
      "zero-gain rounds emit no row") {
    // A first (4 new). Then B would add {e}=1 but C adds {e f}=2 →
    // C. Round 3: B has NOTHING uncovered left → no row (a source
    // with zero marginal gain is not a pick).
    val out = CoveragePlanner.greedySourceCoverage(docs, "text",
        "source", shingleN = 1, picks = 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(out === Array(
      (1L, "A", 4L, 4L),
      (2L, "C", 2L, 6L)))
  }

  test("cumulative fraction reaches 1 when all sources picked") {
    val out = CoveragePlanner.greedySourceCoverage(docs, "text",
        "source", shingleN = 1, picks = 3)
      .orderBy("round").collect()
    assert(math.abs(out.last.getDouble(4) - 1.0) < 1e-12)
  }

  test("ties break on source name ascending") {
    val t = Seq(("x y", "S2"), ("a b", "S1")).toDF("text", "source")
    val out = CoveragePlanner.greedySourceCoverage(t, "text",
        "source", shingleN = 1, picks = 2)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    assert(out === Seq("S1", "S2"))
  }

  test("docs shorter than the shingle width contribute nothing") {
    val t = Seq(("a b c", "A"), ("x", "B")).toDF("text", "source")
    val out = CoveragePlanner.greedySourceCoverage(t, "text",
        "source", shingleN = 3, picks = 1)
      .collect()
    assert(out.length === 1 && out(0).getString(1) === "A")
  }

  test("partition invariance") {
    val big = (0 until 200)
      .map(i => (s"w${i % 17} w${(i * 3) % 23} w${(i * 7) % 11}",
        s"src${i % 6}")).toDF("text", "source")
    def run(df: org.apache.spark.sql.DataFrame) =
      CoveragePlanner.greedySourceCoverage(df, "text", "source",
        shingleN = 2, picks = 4).orderBy("round")
        .collect().map(_.toSeq).toSeq
    assert(run(big) === run(big.repartition(13)))
  }
}
