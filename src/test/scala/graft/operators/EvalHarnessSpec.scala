package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Eval.passAtK]] / [[Eval.consensusVote]] /
  * [[Reweighting.excessLossSelect]] — the SFT eval-harness family
  * pinned against hand-computed references (exact combinatorics,
  * deterministic tie-breaks, tie-inclusive selection). */
class EvalHarnessSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference pass@k by the same factored product. */
  private def refPass(n: Int, c: Int, k: Int): Double =
    1.0 - (0 until k).foldLeft(1.0) { (acc, i) =>
      // factor FIRST, then multiply — the operator and oracle both
      // fold acc * (f_i); (acc*x)/y associates differently by an ulp
      acc * ((n - c - i).toDouble / (n - i))
    }

  test("pass@k: boundary cases — c=0 is exactly 0, n-c<k is " +
      "exactly 1, k>n is null, k=n needs one survivor") {
    val cand = (
      (0 until 10).map(i => (1L, i.toLong, false)) ++      // c=0
      (0 until 10).map(i => (2L, i.toLong, i < 8)) ++      // n-c=2<4
      (0 until 3).map(i => (3L, i.toLong, i == 0))         // n=3,c=1
    ).toDF("p", "s", "ok")
    val got = Eval.passAtK(cand, col("p"), col("ok"), Seq(4))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(1L) === Some(0.0))
    assert(got(2L) === Some(1.0))
    assert(got(3L) === None) // k=4 > n=3
    // k = n: pass@n = 1 iff c >= 1
    val gotN = Eval.passAtK(cand.filter(col("p") === 3L),
        col("p"), col("ok"), Seq(3))
      .collect().head.getDouble(4)
    assert(gotN === 1.0)
  }

  test("pass@k matches the Chen et al. estimator on a mixed table " +
      "and the combinatorial identity 1 - C(n-c,k)/C(n,k)") {
    val cand = (0 until 10).flatMap(p =>
      (0 until 10).map(s => (p.toLong, s.toLong, s < p)))
      .toDF("p", "s", "ok") // problem p has c = p correct of n = 10
    val got = Eval.passAtK(cand, col("p"), col("ok"), Seq(1, 5))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    (0 until 10).foreach { p =>
      assert(got((p.toLong, 1L)) === refPass(10, p, 1))
      assert(got((p.toLong, 5L)) === refPass(10, p, 5))
      // identity vs exact binomial coefficients
      def choose(n: Int, k: Int): Double =
        (0 until k).foldLeft(1.0)((a, i) => a * (n - i) / (i + 1))
      assert(math.abs(got((p.toLong, 5L)) -
        (1.0 - choose(10 - p, 5) / choose(10, 5))) < 1e-12)
    }
    // pass@1 is the per-sample accuracy (as IEEE 1 - (n-c)/n —
    // 1 - 0.7 is 0.30000000000000004, not the literal 0.3)
    assert(got((3L, 1L)) === 1.0 - 7.0 / 10.0)
  }

  test("consensus: modal answer with deterministic tie-break, " +
      "null answers count as '' votes") {
    val cand = Seq(
      (1L, "x", true), (1L, "x", true), (1L, "y", false),   // x wins
      (2L, "b", false), (2L, "a", true),                    // tie->a
      (3L, null, false), (3L, null, false), (3L, "z", true) // ''
    ).toDF("p", "a", "ok")
    val got = Eval.consensusVote(cand, col("p"), col("a"), col("ok"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getDouble(5), r.getBoolean(6)))).toMap
    assert(got(1L) === ((3L, 2L, "x", 2L, 2.0 / 3, true)))
    assert(got(2L) === ((2L, 2L, "a", 1L, 0.5, true)))
    assert(got(3L) === ((3L, 2L, "", 2L, 2.0 / 3, false)))
  }

  test("excessLossSelect: exact top-rho boundary, ties at the " +
      "threshold are ALL kept, null losses dropped") {
    // excesses: 4, 3, 3, 2, 1, 0 (ids 1..6); rho=0.5 of n=6 -> k=3;
    // threshold = 3 (cum at 3 is exactly 3), ids 1,2,3 selected
    val df = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 5.0, 1.0), (2L, 4.0, 1.0), (3L, 3.0, 0.0),
      (4L, 2.0, 0.0), (5L, 1.0, 0.0), (6L, 0.0, 0.0),
      (7L, null, 1.0)
    ).toDF("id", "l", "r")
    val got = Reweighting.excessLossSelect(df, "id", "l", "r", 0.5)
      .collect()
    assert(got.length === 6, "null-loss row must be dropped")
    val sel = got.map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(sel === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> false, 5L -> false, 6L -> false))
    assert(got.head.getAs[Long]("n_total") === 6L)
    assert(got.head.getAs[Long]("k_target") === 3L)
    assert(got.head.getAs[Double]("threshold") === 3.0)
    // tie overflow: make the threshold value 3 appear 3 times ->
    // k=3 but 4 rows clear the bar (1 above + 3 ties all kept)
    val tied = Seq((1L, 5.0, 1.0), (2L, 3.0, 0.0), (3L, 3.0, 0.0),
      (4L, 3.0, 0.0), (5L, 1.0, 0.0), (6L, 0.0, 0.0))
      .toDF("id", "l", "r")
    val got2 = Reweighting.excessLossSelect(tied, "id", "l", "r", 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got2 === Map(1L -> true, 2L -> true, 3L -> true,
      4L -> true, 5L -> false, 6L -> false))
  }

  test("excessLossSelect: rho=1 selects everything; a single row " +
      "selects itself") {
    val df = Seq((1L, 2.0, 1.0), (2L, 0.5, 1.0)).toDF("id", "l", "r")
    val all = Reweighting.excessLossSelect(df, "id", "l", "r", 1.0)
      .collect().map(_.getBoolean(4))
    assert(all.forall(identity))
    val one = Reweighting.excessLossSelect(
        Seq((9L, 1.0, 0.5)).toDF("id", "l", "r"),
        "id", "l", "r", 0.1)
      .collect()
    assert(one.length === 1 && one.head.getBoolean(4))
  }

  test("passAtKDedupAware: hand-computed two-cluster means, and a " +
      "duplicated family moves macro_naive but not macro_dedup") {
    def t9d(x: Double): Double = math.floor(x * 1e9) / 1e9
    // the operator's sums run over DECIMAL(38,9), not IEEE adds —
    // the reference must too (a double fold differs by an ulp)
    def dsum(xs: Double*): Double = xs.map(x =>
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    // cluster A = {p1 (n=4,c=2), p2 (n=4,c=0)}, cluster B = {p3
    // (n=4,c=1)}; k=2
    val cand = (
      (0 until 4).map(i => (1L, i.toLong, i < 2)) ++
      (0 until 4).map(i => (2L, i.toLong, false)) ++
      (0 until 4).map(i => (3L, i.toLong, i < 1))
    ).toDF("p", "s", "ok")
    val clusters = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("problem", "cluster")
    val got = Eval.passAtKDedupAware(cand, col("p"), col("ok"),
      clusters, Seq(2)).collect().head
    val (p1, p2, p3) = (refPass(4, 2, 2), refPass(4, 0, 2),
      refPass(4, 1, 2))
    assert(got.getAs[Long]("n_problems") === 3L)
    assert(got.getAs[Long]("n_clusters") === 2L)
    assert(got.getAs[Double]("macro_naive") ===
      dsum(t9d(p1), t9d(p2), t9d(p3)) / 3)
    val mA = t9d(dsum(t9d(p1), t9d(p2)) / 2)
    val mB = t9d(dsum(t9d(p3)) / 1)
    assert(got.getAs[Double]("macro_dedup") === dsum(mA, mB) / 2)
    // duplicate cluster A's problems 5x under new problem ids:
    // naive shifts toward A's mean, dedup-aware is unchanged
    val dup = cand.unionByName(
      cand.filter(col("p") =!= 3L).withColumn("p", col("p") + 10L)
        .unionByName(cand.filter(col("p") =!= 3L)
          .withColumn("p", col("p") + 20L)))
    val dupClusters = Seq((1L, "A"), (2L, "A"), (11L, "A"),
      (12L, "A"), (21L, "A"), (22L, "A"), (3L, "B"))
      .toDF("problem", "cluster")
    val got2 = Eval.passAtKDedupAware(dup, col("p"), col("ok"),
      dupClusters, Seq(2)).collect().head
    assert(got2.getAs[Long]("n_problems") === 7L)
    assert(got2.getAs[Long]("n_clusters") === 2L)
    assert(got2.getAs[Double]("macro_dedup") === (mA + mB) / 2)
    assert(got2.getAs[Double]("macro_naive") !==
      got.getAs[Double]("macro_naive"))
  }

  test("groupNormalizedAdvantage: hand-computed two-point group, " +
      "zero-variance group is a null-advantage diagnostic") {
    val df = Seq((1L, 0L, 0.0), (1L, 1L, 1.0),
      (2L, 0L, 0.25), (2L, 1L, 0.25), (2L, 2L, 0.25))
      .toDF("p", "s", "r")
    val got = Eval.groupNormalizedAdvantage(df, col("p"), col("s"),
      col("r")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // group 1: mean .5, population std .5, adv = ±1
    assert(got((1L, 0L)).getAs[Double]("mean") === 0.5)
    assert(got((1L, 0L)).getAs[Double]("std") === 0.5)
    assert(got((1L, 0L)).getAs[Double]("advantage") === -1.0)
    assert(got((1L, 1L)).getAs[Double]("advantage") === 1.0)
    assert(!got((1L, 0L)).getAs[Boolean]("degenerate"))
    // group 2: all equal -> degenerate, advantage null
    assert(got((2L, 0L)).getAs[Boolean]("degenerate"))
    assert(got((2L, 0L)).isNullAt(6))
    assert(got((2L, 1L)).getAs[Double]("std") === 0.0)
  }

  test("bestOfNCurve: n=1 is the group mean, n=N is the max, the " +
      "curve is nondecreasing, n>N is a null diagnostic") {
    def t9d(x: Double): Double = math.floor(x * 1e9) / 1e9
    val rs = Seq(0.2, 0.9, 0.4, 0.7)
    val df = rs.zipWithIndex.map { case (r, i) => (1L, i.toLong, r) }
      .toDF("p", "s", "r")
    val got = Eval.bestOfNCurve(df, col("p"), col("s"), col("r"),
      Seq(1, 2, 4, 9)).collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // n=1: every rank weighted 1/N — the plain mean of t9 terms
    val mean = rs.map(r => t9d(0.25 * t9d(r))).sum
    assert(math.abs(got(1L).get - mean) < 1e-9)
    // n=N: all weight on the top rank
    assert(math.abs(got(4L).get - 0.9) < 1e-8)
    assert(got(1L).get <= got(2L).get && got(2L).get <= got(4L).get)
    assert(got(9L) === None)
    // weights telescope: best-of-2 over {0.2,0.4,0.7,0.9} =
    // (C(2,2)-C(1,2))r2 ... = (1/6)(0·r1 + 1·r4... hand value:
    // ranks 1..4 = .2,.4,.7,.9; w_i = (C(i,2)-C(i-1,2))/C(4,2) =
    // (0,1,2,3)/6
    val bo2 = (1.0 / 6) * 0.4 + (2.0 / 6) * 0.7 + (3.0 / 6) * 0.9
    assert(math.abs(got(2L).get - bo2) < 1e-8)
  }

  test("passAtKDedupAware: problems with undefined pass@k (k > n) " +
      "drop from that k's means and counts") {
    val cand = (
      (0 until 4).map(i => (1L, i.toLong, i < 2)) ++
      (0 until 2).map(i => (2L, i.toLong, i < 1))   // n=2 < k=4
    ).toDF("p", "s", "ok")
    val clusters = Seq((1L, "A"), (2L, "B")).toDF("problem", "cluster")
    val got = Eval.passAtKDedupAware(cand, col("p"), col("ok"),
        clusters, Seq(4)).collect().head
    assert(got.getAs[Long]("n_problems") === 1L)
    assert(got.getAs[Long]("n_clusters") === 1L)
    assert(got.getAs[Double]("macro_naive") === 1.0)
    assert(got.getAs[Double]("macro_dedup") === 1.0)
  }

  test("passAtKDedupAware: a problem absent from the cluster map " +
      "is its own singleton family, never a dropped row") {
    // p1/p2 share family A; p3 is UNLABELED (the dedup-device shape:
    // only duplicate-pair members get component rows)
    val cand = (
      (0 until 4).map(i => (1L, i.toLong, i < 2)) ++
      (0 until 4).map(i => (2L, i.toLong, false)) ++
      (0 until 4).map(i => (3L, i.toLong, i < 1))
    ).toDF("p", "s", "ok")
    val partial = Seq((1L, "A"), (2L, "A")).toDF("problem", "cluster")
    val full = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("problem", "cluster")
    val gotP = Eval.passAtKDedupAware(cand, col("p"), col("ok"),
      partial, Seq(2)).collect().head
    val gotF = Eval.passAtKDedupAware(cand, col("p"), col("ok"),
      full, Seq(2)).collect().head
    // identical numbers: the missing p3 label means "singleton B"
    assert(gotP.getAs[Long]("n_problems") === 3L)
    assert(gotP.getAs[Long]("n_clusters") === 2L)
    assert(gotP.getAs[Double]("macro_naive") ===
      gotF.getAs[Double]("macro_naive"))
    assert(gotP.getAs[Double]("macro_dedup") ===
      gotF.getAs[Double]("macro_dedup"))
  }

  test("passAtKDedupAware: duplicate cluster rows for one problem " +
      "never multiply it; a caller cluster id equal to the problem " +
      "id never merges with a singleton") {
    val cand = (
      (0 until 4).map(i => (1L, i.toLong, i < 2)) ++
      (0 until 4).map(i => (2L, i.toLong, false))
    ).toDF("p", "s", "ok")
    // p1 labeled TWICE (conflicting families) — must count once,
    // deterministically in min("A","B") = "A"
    val dup = Seq((1L, "A"), (1L, "B"))
      .toDF("problem", "cluster")
    val got = Eval.passAtKDedupAware(cand, col("p"), col("ok"),
      dup, Seq(2)).collect().head
    assert(got.getAs[Long]("n_problems") === 2L)
    // p1 in family A, p2 an unlabeled singleton → 2 families
    assert(got.getAs[Long]("n_clusters") === 2L)
    // adversarial: p2 is unlabeled (singleton keyed by its problem
    // id "2") while p1 carries the CALLER id "2" — the struct key
    // (is_singleton, id) must keep them distinct families
    val collide = Seq((1L, "2")).toDF("problem", "cluster")
    val got2 = Eval.passAtKDedupAware(cand, col("p"), col("ok"),
      collide, Seq(2)).collect().head
    assert(got2.getAs[Long]("n_clusters") === 2L)
  }
}
