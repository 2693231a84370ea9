package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[HypothesisTests]] — KS pinned on hand-computed statistics,
  * the exact binomial p against a BigDecimal reference, and the BH
  * step-up property on crafted p-values. */
class HypothesisTestsSpec extends SparkTestBase {
  import spark.implicits._

  test("KS: hand-computed D, disjoint samples give D = 1, ties " +
      "shared across samples are handled at the step") {
    // A = {1, 3, 5}, B = {2, 3, 4, 6}: ECDF gaps at distinct values
    // v=1: |1/3-0|   v=2: |1/3-1/4|  v=3: |2/3-2/4|
    // v=4: |2/3-3/4| v=5: |1-3/4|    v=6: 0   -> D = 1/3 at v=1
    val df = (Seq(1, 3, 5).map((_, true)) ++
      Seq(2, 3, 4, 6).map((_, false))).toDF("v", "a")
    val r = HypothesisTests.ksTwoSample(df, col("v"), col("a"))
      .collect().head
    assert(r.getLong(0) === 3L && r.getLong(1) === 4L)
    assert(math.abs(r.getDouble(2) - 1.0 / 3) < 1e-12)
    // disjoint samples: D = 1; note the ASYMPTOTIC threshold
    // exceeds 1 for tiny samples (n=3 vs 2 -> crit 1.24, honest
    // "cannot reject"), so the reject branch needs real sizes
    val tiny = (Seq(1, 2, 3).map((_, true)) ++
      Seq(10, 11).map((_, false))).toDF("v", "a")
    val dTiny = HypothesisTests.ksTwoSample(tiny, col("v"),
      col("a")).collect().head
    assert(dTiny.getDouble(2) === 1.0)
    assert(dTiny.getDouble(3) > 1.0 && !dTiny.getBoolean(4))
    val disjoint = ((0 until 30).map(i => (i, true)) ++
      (0 until 20).map(i => (100 + i, false))).toDF("v", "a")
    val d2 = HypothesisTests.ksTwoSample(disjoint, col("v"),
      col("a")).collect().head
    assert(d2.getDouble(2) === 1.0 && d2.getBoolean(4))
  }

  test("KS: an empty sample yields a null-D diagnostic row, not an " +
      "ANSI divide-by-zero") {
    // predicate matches nothing -> n_a = 0: the row must survive
    // with null d_stat/crit and reject = false so a drift dashboard
    // shows "cannot test (empty side)" instead of a crashed job
    val allB = Seq((1, false), (2, false), (3, false)).toDF("v", "a")
    val r = HypothesisTests.ksTwoSample(allB, col("v"), col("a"))
      .collect().head
    assert(r.getLong(0) === 0L && r.getLong(1) === 3L)
    assert(r.isNullAt(2) && r.isNullAt(3) && !r.getBoolean(4))
    // fully empty input (or all-null values): zero rows, no crash
    val none = Seq.empty[(Int, Boolean)].toDF("v", "a")
    assert(HypothesisTests.ksTwoSample(none, col("v"), col("a"))
      .collect().isEmpty)
  }

  test("KS: identical large samples accept; a clean shift rejects") {
    val same = (0 until 400).map(i => (i % 100, i % 2 == 0))
      .toDF("v", "a")
    assert(!HypothesisTests.ksTwoSample(same, col("v"), col("a"))
      .collect().head.getBoolean(4))
    val shifted = ((0 until 200).map(i => (i % 100, true)) ++
      (0 until 200).map(i => (i % 100 + 60, false))).toDF("v", "a")
    assert(HypothesisTests.ksTwoSample(shifted, col("v"), col("a"))
      .collect().head.getBoolean(4))
  }

  test("chi-squared independence: hand-computed 2x2, exact zero " +
      "on a perfectly independent table, null category level") {
    // O = [[10,20],[20,10]]: classic X^2 = 4*(25/15) = 6.6667 (t12
    // per-term: 4 * 1.666666666666 = 6.666666666664); df=1, crit
    // 3.841 -> reject
    val dep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val rd = HypothesisTests.chiSquaredIndependence(dep, col("r"),
      col("c"), crit = 3.841).collect().head
    assert(rd.getLong(0) === 60L && rd.getLong(3) === 1L)
    assert(math.abs(rd.getDouble(4) - 6.666666666664) < 1e-12)
    assert(rd.getBoolean(6))
    // perfectly independent margins -> every d = O*N - R*C = 0
    val ind = (for (r <- Seq("a", "b"); c <- Seq("x", "y", "z");
      _ <- 0 until 5) yield (r, c)).toDF("r", "c")
    val ri = HypothesisTests.chiSquaredIndependence(ind, col("r"),
      col("c"), crit = 5.991).collect().head
    assert(ri.getDouble(4) === 0.0 && !ri.getBoolean(6))
    assert(ri.getLong(1) === 2L && ri.getLong(2) === 3L &&
      ri.getLong(3) === 2L)
    // a null category value is its own level, not a dropped row
    val withNull = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", null))
      ++ Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", null)))
      .toDF("r", "c")
    val rn = HypothesisTests.chiSquaredIndependence(withNull,
      col("r"), col("c"), crit = 3.841).collect().head
    assert(rn.getLong(0) === 20L && rn.getLong(2) === 2L)
    assert(rn.getDouble(4) === 0.0)
  }

  test("chiSquaredIndependenceBy: per-variant rows equal the " +
      "single-variant operator run per slice, and w = sqrt(x2/n)") {
    val dep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c").withColumn("v", lit("dep"))
    val ind = (for (r <- Seq("a", "b"); c <- Seq("x", "y");
      _ <- 0 until 5) yield (r, c)).toDF("r", "c")
      .withColumn("v", lit("ind"))
    val both = dep.unionByName(ind)
    val got = HypothesisTests.chiSquaredIndependenceBy(both,
        col("v"), col("r"), col("c"), crit = 3.841)
      .collect().map(r => r.getString(0) -> r).toMap
    for ((v, slice) <- Seq("dep" -> dep, "ind" -> ind)) {
      val single = HypothesisTests.chiSquaredIndependence(slice,
        col("r"), col("c"), crit = 3.841).collect().head
      val g = got(v)
      assert(g.getLong(1) === single.getLong(0))       // n
      assert(g.getLong(2) === single.getLong(1))       // n_rows
      assert(g.getLong(3) === single.getLong(2))       // n_cols
      assert(g.getLong(4) === single.getLong(3))       // dof
      assert(g.getDouble(5) === single.getDouble(4))   // x2
      assert(g.getBoolean(8) === single.getBoolean(6)) // reject
      val w = math.floor(math.sqrt(
        single.getDouble(4) / single.getLong(0)) * 1e12) / 1e12
      assert(g.getDouble(6) === w)
    }
    assert(got("dep").getBoolean(8) && !got("ind").getBoolean(8))
    // a null variant is its own segment, not a dropped population
    // (the equi-joins would silently drop null keys unguarded)
    val withNullV = dep.withColumn("v",
      when(lit(true), lit(null).cast("string")))
    val gn = HypothesisTests.chiSquaredIndependenceBy(withNullV,
      col("v"), col("r"), col("c"), crit = 3.841).collect()
    assert(gn.length === 1 && gn.head.getString(0) === "(null)")
    assert(gn.head.getLong(1) === 60L)
  }

  /** Exact binomial two-sided p (doubled smaller tail) reference
    * via BigDecimal pmf accumulation. */
  private def refP(n: Int, k: Int, p: Double): Double = {
    val pmf = (0 to n).map { j =>
      val logC = (1 to j).map(i =>
        math.log((n - j + i).toDouble / i)).sum
      math.exp(logC + j * math.log(p) + (n - j) * math.log(1 - p))
    }
    val lo = pmf.take(k + 1).sum
    val hi = pmf.drop(k).sum
    math.min(1.0, 2.0 * math.min(lo, hi))
  }

  test("binomial p-values match the direct reference within the " +
      "trunc12 grade and the pooled-rate null is centered") {
    // 4 groups of 50; group g3 has a strong excess of the property
    val rows = (0 until 200).map { i =>
      val g = s"g${i % 4}"
      val prop =
        if (i % 4 == 3) i % 10 < 8 // 80%
        else i % 10 < 3            // 30%
      (g, prop)
    }.toDF("g", "prop")
    val out = HypothesisTests.binomialBhAudit(rows, col("g"), "g",
        col("prop"), alpha = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(4),
          r.getBoolean(6))).toMap
    // pooled rate from the audited data itself (i%10 cycles under
    // i%4 give g0/g2 rate .4, g1 rate .2, g3 rate .8 -> p0 = .45)
    val p0 = out.values.map(_._2).sum.toDouble /
      out.values.map(_._1).sum
    assert(p0 === 0.45)
    out.foreach { case (g, (n, k, p, _)) =>
      assert(n === 50L)
      assert(math.abs(p - refP(n.toInt, k.toInt, p0)) < 1e-6,
        s"$g: $p vs ${refP(n.toInt, k.toInt, p0)}")
    }
    // two-sided: the excess group (g3, .8) AND the deficit group
    // (g1, .2) both depart from .45; the .4 groups survive
    assert(out("g3")._4 && out("g1")._4)
    assert(!out("g0")._4 && !out("g2")._4)
  }

  test("BH step-up rejects THROUGH an intermediate failing rank") {
    // m=4, alpha=0.2 -> thresholds .05 .10 .15 .20
    // ps .04 (pass), .12 (fail), .13 (pass), .9 (fail) -> cutoff 3:
    // rank 2 is rejected despite failing its own threshold
    val tails = Seq(("a", 0.04), ("b", 0.12), ("c", 0.13),
      ("d", 0.9)).toDF("g", "p_value")
    val out = HypothesisTests.bhReject(tails, "g", alpha = 0.2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out("a") === ((1L, true)))
    assert(out("b") === ((2L, true))) // step-up property
    assert(out("c") === ((3L, true)))
    assert(out("d") === ((4L, false)))
    // all-null case: nothing passes -> nothing rejected
    val none = Seq(("a", 0.5), ("b", 0.9)).toDF("g", "p_value")
    assert(HypothesisTests.bhReject(none, "g", 0.05)
      .collect().forall(!_.getBoolean(3)))
  }

  test("degenerate pooled rate (all rows share the property) gives " +
      "p = 1 everywhere and no rejections, never null") {
    val rows = (0 until 60).map(i => (s"g${i % 3}", true))
      .toDF("g", "prop")
    val out = HypothesisTests.binomialBhAudit(rows, col("g"), "g",
      col("prop"), alpha = 0.05).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(!r.isNullAt(4) && r.getDouble(4) === 1.0)
      assert(!r.getBoolean(6))
    }
  }

  test("partition invariance") {
    val rows = (0 until 300).map(i =>
      (s"g${i % 6}", (i * 13) % 7 < 2)).toDF("g", "prop")
    def run(df: org.apache.spark.sql.DataFrame) =
      HypothesisTests.binomialBhAudit(df, col("g"), "g",
        col("prop"), 0.1).orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(rows) === run(rows.repartition(13)))
    val ks = (0 until 300).map(i => (i % 40, i % 3 == 0))
      .toDF("v", "a")
    def runKs(df: org.apache.spark.sql.DataFrame) =
      HypothesisTests.ksTwoSample(df, col("v"), col("a"))
        .collect().map(_.toSeq).toSeq
    assert(runKs(ks) === runKs(ks.repartition(17)))
  }
}
