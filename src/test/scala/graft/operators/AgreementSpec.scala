package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Agreement]] — Fleiss' κ against the Fleiss-1971 worked example,
  * Cohen's κ against the classic 2×2 textbook table, boundary cases
  * (perfect agreement), and the exact-rational contract (κ =
  * num/den for integer num, den). */
class AgreementSpec extends SparkTestBase {
  import spark.implicits._

  /** The Fleiss (1971) / standard-reference 10-item × 14-rater ×
    * 5-category table (rows = items, n_ij counts per category). */
  private val FleissTable: Seq[Seq[Int]] = Seq(
    Seq(0, 0, 0, 0, 14), Seq(0, 2, 6, 4, 2), Seq(0, 0, 3, 5, 6),
    Seq(0, 3, 9, 2, 0), Seq(2, 2, 8, 1, 1), Seq(7, 7, 0, 0, 0),
    Seq(3, 2, 6, 3, 0), Seq(2, 5, 3, 2, 2), Seq(6, 5, 2, 1, 0),
    Seq(0, 2, 2, 3, 7))

  private def fleissRows = FleissTable.zipWithIndex.flatMap {
    case (row, item) =>
      var rater = -1
      row.zipWithIndex.flatMap { case (n, cat) =>
        (0 until n).map { _ => rater += 1
          (item.toLong, rater.toLong, s"cat$cat") }
      }
  }

  test("Fleiss' kappa reproduces the published 1971 worked example") {
    val out = Agreement.fleissKappa(
        fleissRows.toDF("item", "rater", "label"),
        "item", "rater", "label")
      .collect()(0)
    assert(out.getAs[Long]("n_items") === 10L)
    assert(out.getAs[Long]("r_min") === 14L)
    assert(out.getAs[Long]("r_max") === 14L)
    assert(out.getAs[Long]("n_labels") === 5L)
    val kappa = out.getAs[Double]("kappa")
    // the published value is 0.210; check the exact rational too
    assert(math.abs(kappa - 0.210) < 5e-4, s"kappa=$kappa")
    assert(kappa ===
      out.getAs[Long]("num").toDouble / out.getAs[Long]("den"))
    // independent double-arithmetic reference on the same table
    val n = 10.0; val r = 14.0
    val pbar = (FleissTable.flatten.map(x => x * x).sum - n * r) /
      (n * r * (r - 1))
    val pj = FleissTable.transpose.map(_.sum / (n * r))
    val pe = pj.map(p => p * p).sum
    assert(math.abs(kappa - (pbar - pe) / (1 - pe)) < 1e-12)
  }

  test("perfect agreement gives kappa = 1") {
    val rows = for (i <- 0L to 9L; r <- 0L to 2L)
      yield (i, r, if (i % 2 == 0) "x" else "y")
    val out = Agreement.fleissKappa(rows.toDF("item", "rater", "label"),
      "item", "rater", "label").collect()(0)
    assert(out.getAs[Double]("kappa") === 1.0)
  }

  test("Cohen's kappa reproduces the classic 2x2 table (kappa 0.4)") {
    // 50 items; A/B: yes-yes 20, yes-no 5, no-yes 10, no-no 15
    val rows =
      (0 until 20).flatMap(i => Seq((i.toLong, 0L, "yes"), (i.toLong, 1L, "yes"))) ++
      (20 until 25).flatMap(i => Seq((i.toLong, 0L, "yes"), (i.toLong, 1L, "no"))) ++
      (25 until 35).flatMap(i => Seq((i.toLong, 0L, "no"), (i.toLong, 1L, "yes"))) ++
      (35 until 50).flatMap(i => Seq((i.toLong, 0L, "no"), (i.toLong, 1L, "no")))
    val out = Agreement.cohenKappaPairs(rows.toDF("item", "rater", "label"),
      "item", "rater", "label").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_items") === 50L)
    assert(r.getAs[Long]("n_agree") === 35L)
    assert(r.getAs[Long]("num") === 500L)   // 50*35 − (25*30 + 25*20)
    assert(r.getAs[Long]("den") === 1250L)
    assert(r.getAs[Double]("kappa") === 0.4)
  }

  test("cohenKappaPairs: marginals restrict to the pair's common " +
      "items when raters rate different subsets (r10 advice)") {
    // raters 0/1 share items 0–9 (perfect agreement there); rater 0
    // also labeled 90 extra items all "no". Cohen's table for the
    // pair is 10 yes-yes cells → kappa must be computed from the 10
    // common items (S = 100, num = 10*10−100 = 0 ... all-"yes"
    // degenerate) — so use a mixed common set instead:
    //   common: 5 yes-yes + 5 no-no (perfect agreement, balanced)
    //   rater 0 alone: 90 extra "no" labels that must NOT leak into
    //   the marginals (global marginals would give S = 95*5+5*5 and
    //   a kappa != 1).
    val common =
      (0 until 5).flatMap(i => Seq((i.toLong, 0L, "yes"),
        (i.toLong, 1L, "yes"))) ++
      (5 until 10).flatMap(i => Seq((i.toLong, 0L, "no"),
        (i.toLong, 1L, "no")))
    val extra = (100 until 190).map(i => (i.toLong, 0L, "no"))
    val out = Agreement.cohenKappaPairs(
      (common ++ extra).toDF("item", "rater", "label"),
      "item", "rater", "label").collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_items") === 10L)
    assert(r.getAs[Long]("n_agree") === 10L)
    // common-item marginals: m_a = m_b = (5 yes, 5 no) → S = 50,
    // num = 100−50, den = 100−50 → kappa exactly 1
    assert(r.getAs[Long]("num") === 50L)
    assert(r.getAs[Long]("den") === 50L)
    assert(r.getAs[Double]("kappa") === 1.0)
  }

  test("cohenKappaPairs emits one row per unordered pair") {
    val rows = for (i <- 0L to 19L; r <- 0L to 2L)
      yield (i, r, if ((i + r) % 3 == 0) "a" else "b")
    val out = Agreement.cohenKappaPairs(rows.toDF("item", "rater", "label"),
      "item", "rater", "label").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("partition invariance: kappa identical under repartition") {
    val df = fleissRows.toDF("item", "rater", "label")
    val a = Agreement.fleissKappa(df, "item", "rater", "label")
      .collect()(0).getAs[Double]("kappa")
    val b = Agreement.fleissKappa(df.repartition(13), "item", "rater",
      "label").collect()(0).getAs[Double]("kappa")
    assert(a === b)
  }
}
