package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[BradleyTerry]] — MM fixed points with closed forms, ordering
  * recovery on model-generated data, degenerate items, and the
  * order-free exactness contract. */
class BradleyTerrySpec extends SparkTestBase {
  import spark.implicits._

  test("two items: strengths hit the closed-form win-rate split") {
    // A beats B 3 times, B beats A once. The normalized MM fixed
    // point is (0.75, 0.25) and is reached after ONE round exactly
    // (both engines' t12 arithmetic represents it exactly).
    val cmp = (Seq.fill(3)(("A", "B")) :+ (("B", "A")))
      .toDF("winner", "loser")
    val out = BradleyTerry.fit(cmp, "winner", "loser", rounds = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("A") === ((3L, 4L, 0.75)))
    assert(out("B") === ((1L, 4L, 0.25)))
  }

  test("ordering recovery: items generated stronger fit stronger") {
    // round-robin: item i beats item j < i in exactly (i - j) games
    // — strictly more wins for higher i, so fitted strengths must be
    // strictly increasing in i.
    val cmp = (for {
      i <- 0 to 4; j <- 0 until i; _ <- 1 to (i - j)
    } yield (i.toLong, j.toLong)).toDF("winner", "loser")
    val s = BradleyTerry.fit(cmp, "winner", "loser")
      .orderBy(col("item")).collect().map(_.getDouble(3))
    assert(s.zip(s.tail).forall { case (a, b) => a < b },
      s.mkString(", "))
  }

  test("an item that never wins gets strength 0; sums stay 1-ish") {
    val cmp = Seq(("A", "C"), ("B", "C"), ("A", "B"), ("B", "A"))
      .toDF("winner", "loser")
    val out = BradleyTerry.fit(cmp, "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("C") === 0.0)
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }

  test("self-comparisons are ignored") {
    val cmp = Seq(("A", "A"), ("A", "B")).toDF("winner", "loser")
    val out = BradleyTerry.fit(cmp, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("A") === ((1L, 1L)))
    assert(out("B") === ((0L, 1L)))
  }

  test("partition invariance: identical strengths at any layout") {
    val cmp = (for (i <- 0L until 200L) yield {
      val a = i % 5; val b = (a + 1 + i % 4) % 5
      if ((i * 31) % (a + b + 2) < a + 1) (a, b) else (b, a)
    }).toDF("winner", "loser")
    def run(df: org.apache.spark.sql.DataFrame) =
      BradleyTerry.fit(df, "winner", "loser").orderBy(col("item"))
        .collect().map(_.getDouble(3)).toSeq
    assert(run(cmp) === run(cmp.repartition(17)))
  }
}
