package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[RankCorrelation.spearmanPairs]] — closed-form monotone cases,
  * tie handling vs the textbook average-rank formula, and partition
  * invariance. */
class RankCorrelationSpec extends SparkTestBase {
  import spark.implicits._

  test("a strictly monotone pair has rho exactly 1; reversed " +
      "exactly -1; all pairs emitted") {
    val df = (1L to 20L).map(i => (i, i, i * 3, 21L - i))
      .toDF("id", "a", "b", "c")
    val out = RankCorrelation.spearmanPairs(df, "id",
        Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(3)).toMap
    assert(out(("a", "b")) === 1.0)
    assert(out(("a", "c")) === -1.0)
    assert(out(("b", "c")) === -1.0)
    assert(out.size === 3)
  }

  test("ties use average ranks (textbook worked value)") {
    // x = (1,2,2,4), y = (1,2,3,4): average x-ranks (1, 2.5, 2.5, 4).
    // Pearson on ranks: num = n·Σxy − ΣxΣy over doubled ranks.
    val df = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 2L, 3L),
      (4L, 4L, 4L)).toDF("id", "x", "y")
    val rho = RankCorrelation.spearmanPairs(df, "id", Seq("x", "y"))
      .collect()(0).getDouble(3)
    // average ranks rx=(1,2.5,2.5,4), ry=(1,2,3,4):
    // Σxy=29.5 → num = 4·29.5−10·10 = 18; Σx²=29.5 → var_x = 18;
    // Σy²=30 → var_y = 20 → ρ = 18/sqrt(360) ≈ 0.94868
    assert(math.abs(rho - 18.0 / math.sqrt(360.0)) < 1e-12)
  }

  test("independent-ish alternation lands near zero") {
    val df = (1L to 40L).map(i => (i, i, if (i % 2 == 0) 1L else 2L))
      .toDF("id", "x", "y")
    val rho = RankCorrelation.spearmanPairs(df, "id", Seq("x", "y"))
      .collect()(0).getDouble(3)
    assert(math.abs(rho) < 0.1)
  }

  test("partition invariance") {
    val df = (1L to 150L).map(i => (i, (i * 7) % 40, (i * 13) % 23))
      .toDF("id", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      RankCorrelation.spearmanPairs(d, "id", Seq("x", "y"))
        .collect()(0).getDouble(3)
    assert(run(df) === run(df.repartition(19)))
  }
}
