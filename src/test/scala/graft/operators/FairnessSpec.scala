package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Fairness.disparateImpact]] — the four-fifths decision pinned on
  * hand-built groups, including the EXACT 0.8 boundary (which the
  * integer cross-multiplication must land on the ≥ side even where
  * the double ratio would round to 0.7999…/0.8000…2). */
class FairnessSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(groups: (String, Int, Int)*): org.apache.spark.sql.DataFrame =
    groups.flatMap { case (g, acc, rej) =>
      Seq.fill(acc)((g, true)) ++ Seq.fill(rej)((g, false))
    }.toDF("g", "ok")

  test("rates, reference selection, and the four-fifths flag") {
    // ref = a (rate 1.0); b = 4/5 -> ratio .8 exactly (flag true,
    // boundary inclusive); c = 3/5 -> .6 (false); d = 0/2 (false)
    val out = Fairness.disparateImpact(
        mk(("a", 5, 0), ("b", 4, 1), ("c", 3, 2), ("d", 0, 2)),
        col("g"), "g", col("ok"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4),
          r.getBoolean(6))).toMap
    assert(out("a") === ((5L, 5L, "a", true)))
    assert(out("b") === ((5L, 4L, "a", true)))  // exactly 0.8
    assert(out("c") === ((5L, 3L, "a", false)))
    assert(out("d") === ((2L, 0L, "a", false)))
  }

  test("exact 0.8 with a denominator the doubles cannot represent") {
    // ref 10/13, group 8/13: true ratio 8/10 = 0.8 exactly, but the
    // DOUBLE ratio (8/13)/(10/13) lands off 0.8 by an ulp — the
    // integer form must still flag true.
    val out = Fairness.disparateImpact(
        mk(("r", 10, 3), ("x", 8, 5)), col("g"), "g", col("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(out("x"))
    // one customer fewer accepted flips it
    val out2 = Fairness.disparateImpact(
        mk(("r", 10, 3), ("x", 7, 6)), col("g"), "g", col("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(!out2("x"))
  }

  test("reference ties break on group name; null acceptance rejects") {
    val withNull = Seq(("a", Some(true)), ("a", Some(true)),
      ("b", Some(true)), ("b", None)).toDF("g", "ok")
    val out = Fairness.disparateImpact(withNull, col("g"), "g",
        col("ok")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getString(4))).toMap
    // b's null counts as rejected -> rate 1/2; ref is a (rate 1)
    assert(out("a") === ((2L, "a")))
    assert(out("b") === ((1L, "a")))
    val tied = Fairness.disparateImpact(
        mk(("m", 2, 0), ("k", 3, 0)), col("g"), "g", col("ok"))
      .collect().map(_.getString(4)).distinct
    assert(tied === Array("k")) // both rate 1.0 -> lexicographic min
  }

  test("partition invariance") {
    val rows = (0 until 400)
      .map(i => (s"g${i % 7}", (i * 31) % 5 != 0)).toDF("g", "ok")
    def run(df: org.apache.spark.sql.DataFrame) =
      Fairness.disparateImpact(df, col("g"), "g", col("ok"))
        .orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(rows) === run(rows.repartition(19)))
  }
}
