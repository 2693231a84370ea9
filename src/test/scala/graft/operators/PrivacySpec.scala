package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Privacy]] — disclosure-audit semantics pinned on hand-built
  * groups: the k boundary (k-1 suppressed, k kept), l-diversity
  * counting vs distinct sensitive values, ladder anchoring at the
  * finest satisfying rung, and partition-invariance of every
  * decision (pure aggregates — no order dependence). */
class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // (id, region, segment, balance) — region/segment are the QIs.
  // Group (r1,a): 3 rows; (r1,b): 2 rows; (r2,a): 1 row.
  private def rows = Seq(
    (1L, "r1", "a", 120.0), (2L, "r1", "a", 130.0), (3L, "r1", "a", 140.0),
    (4L, "r1", "b", 150.0), (5L, "r1", "b", 260.0),
    (6L, "r2", "a", 270.0)
  ).toDF("id", "region", "segment", "bal")

  test("kAnonymityAudit: group sizes, k boundary, l-diversity") {
    val audit = Privacy.kAnonymityAudit(rows,
        Seq(col("region")), Seq("region"),
        sensitiveCol = col("segment"), k = 3, l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toSet
    // r1: 5 rows, 2 segments -> k-anon (>=3), l-diverse (>=2)
    // r2: 1 row, 1 segment -> neither
    assert(audit === Set(
      ("r1", 5L, 2L, true, true),
      ("r2", 1L, 1L, false, false)))
  }

  test("suppress keeps exactly the rows of groups with >= k members") {
    val kept = Privacy.suppress(rows.repartition(7),
        Seq(col("region"), col("segment")), k = 2)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 5L)) // (r2,a) size 1 dropped
    // boundary: k = 3 keeps only the size-3 group
    val kept3 = Privacy.suppress(rows,
        Seq(col("region"), col("segment")), k = 3)
      .select("id").as[Long].collect().toSet
    assert(kept3 === Set(1L, 2L, 3L))
  }

  test("suppress preserves the input schema") {
    val out = Privacy.suppress(rows, Seq(col("region")), k = 1)
    assert(out.columns.toSeq === Seq("id", "region", "segment", "bal"))
    assert(out.count() === 6)
  }

  test("generalizationLadder anchors at the finest satisfying rung") {
    // widths 100 then 1000; k=2.
    // bal bins at w100: 120/130/140 -> 1,1,1 ; 150 -> 1 ; 260,270 -> 2,2
    // group key = (region, bin):
    //  (r1,1): ids 1,2,3,4 -> size 4 >= 2 -> anchored w100
    //  (r1,2): id 5 -> size 1 ; (r2,2): id 6 -> size 1
    // at w1000 all bals bin to 0: (r1,0) size 5 -> id 5 anchored w1000
    //  (r2,0) size 1 -> id 6 suppressed
    val out = Privacy.generalizationLadder(rows,
        Seq(col("region")), Seq("region"), col("bal"),
        widths = Seq(100.0, 1000.0), k = 2)
      .select("id", "anchor_level", "anchor_group_size")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(out === Set(
      (1L, "w100", 4L), (2L, "w100", 4L), (3L, "w100", 4L),
      (4L, "w100", 4L),
      (5L, "w1000", 5L),
      (6L, "suppressed", -1L)))
  }

  test("ladder decisions are partition-invariant") {
    val a = Privacy.generalizationLadder(rows.repartition(13),
        Seq(col("region")), Seq("region"), col("bal"),
        widths = Seq(100.0, 1000.0), k = 2)
      .select("id", "anchor_level").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Privacy.generalizationLadder(rows.coalesce(1),
        Seq(col("region")), Seq("region"), col("bal"),
        widths = Seq(100.0, 1000.0), k = 2)
      .select("id", "anchor_level").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
  }

  test("bin is floor(x/width) including negatives") {
    val d = Seq(-150.0, -100.0, -1.0, 0.0, 99.0, 100.0)
      .toDF("x").select(Privacy.bin(col("x"), 100.0).as("b"))
      .as[Long].collect().toSeq
    assert(d === Seq(-2L, -1L, -1L, 0L, 0L, 1L))
  }

  test("tClosenessAudit: hand-computed ordered EMD, exact " +
      "rationals, zero for a group matching the global mix") {
    // A: [0,0,0,1], B: [0,1,1,1] → global (4,4), N=8, m=2.
    // Q_A=(3/4,1/4) vs P=(1/2,1/2): ordered EMD = 1/4. B symmetric.
    val rows = Seq(("A", 0L), ("A", 0L), ("A", 0L), ("A", 1L),
      ("B", 0L), ("B", 1L), ("B", 1L), ("B", 1L)).toDF("g", "s")
    val out = Privacy.tClosenessAudit(rows, Seq(col("g")), Seq("g"),
        col("s"), t = 0.3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4),
        r.getBoolean(5)))).toMap
    assert(out("A") === ((4L, 8L, 32L, 0.25, true)))
    assert(out("B") === ((4L, 8L, 32L, 0.25, true)))
    // a group with the global mix has EMD exactly 0
    val rows2 = Seq(("A", 0L), ("A", 1L), ("B", 0L), ("B", 1L))
      .toDF("g", "s")
    val z = Privacy.tClosenessAudit(rows2, Seq(col("g")), Seq("g"),
      col("s"), t = 0.05).collect()
    assert(z.forall(r => r.getLong(2) === 0L && r.getDouble(4) === 0.0))
  }

  test("tClosenessAudit: missing (group, value) cells enter the " +
      "cumulant; ordering drives the distance") {
    // A holds only the LOWEST value, B only the HIGHEST, C only the
    // middle — under ordered EMD the extremes are farther from the
    // global mix than the middle is.
    val rows = Seq(("A", 0L), ("B", 2L), ("C", 1L)).toDF("g", "s")
    val out = Privacy.tClosenessAudit(rows, Seq(col("g")), Seq("g"),
        col("s"), t = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    // P=(1/3,1/3,1/3). A: cum diffs (2/3, 1/3) → EMD = 1/2.
    // C: (−1/3, 1/3)... wait cum: Q=(0,1,0): (−1/3, +1/3) → 1/3.
    assert(math.abs(out("A") - 0.5) < 1e-12)
    assert(math.abs(out("B") - 0.5) < 1e-12)
    assert(math.abs(out("C") - 1.0 / 3) < 1e-12)
    assert(out("A") > out("C") && out("B") > out("C"))
  }

  test("tClosenessAudit is partition-invariant") {
    val rows = (0L until 120L)
      .map(i => (s"g${i % 4}", (i * 7) % 5)).toDF("g", "s")
    def run(df: org.apache.spark.sql.DataFrame) =
      Privacy.tClosenessAudit(df, Seq(col("g")), Seq("g"), col("s"),
        t = 0.1).orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(rows) === run(rows.repartition(17)))
  }

  test("diversityAudit: entropy and recursive (c,l) on hand-built " +
      "groups, incl. the uniform-l boundary and a rank-l tie") {
    // U: uniform over exactly 3 values (4+4+4) — entropy ≈ ln 3, the
    //    boundary class; recursive r1=4 < 2·(tail=4).
    // H: 5+1 — low entropy, only 2 distinct: tail (rank≥3) = 0 so
    //    the recursive check degenerates to r1 < 0 = false.
    // T: 3+3+3+1 — a three-way tie straddles rank 3; tail must be
    //    the tie-order-invariant 3+1 = 4.
    val rows = (
      Seq.fill(4)(("U", "a")) ++ Seq.fill(4)(("U", "b")) ++
        Seq.fill(4)(("U", "c")) ++
        Seq.fill(5)(("H", "a")) ++ Seq(("H", "d")) ++
        Seq.fill(3)(("T", "a")) ++ Seq.fill(3)(("T", "b")) ++
        Seq.fill(3)(("T", "c")) ++ Seq(("T", "d"))
      ).toDF("g", "s")
    val out = Privacy.diversityAudit(rows, Seq(col("g")), Seq("g"),
        col("s"), l = 3, c = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val u = out("U")
    assert(u.getLong(1) === 12L && u.getLong(2) === 3L)
    assert(math.abs(u.getDouble(3) - math.log(3)) < 1e-8)
    assert(u.getLong(5) === 4L && u.getLong(6) === 4L)
    assert(u.getBoolean(7)) // 4 < 2·4
    val h = out("H")
    assert(h.getLong(2) === 2L && h.getLong(6) === 0L)
    assert(!h.getBoolean(4) && !h.getBoolean(7))
    // H entropy: ln 6 − (5·ln 5)/6 ≈ 0.45056
    assert(math.abs(h.getDouble(3) -
      (math.log(6) - 5 * math.log(5) / 6)) < 1e-8)
    val t = out("T")
    assert(t.getLong(5) === 3L && t.getLong(6) === 4L)
    assert(t.getBoolean(7)) // 3 < 2·4
  }

  test("diversityAudit is partition-invariant") {
    val rows = (0L until 200L)
      .map(i => (s"g${i % 5}", s"s${(i * 13) % 7}")).toDF("g", "s")
    def run(df: org.apache.spark.sql.DataFrame) =
      Privacy.diversityAudit(df, Seq(col("g")), Seq("g"), col("s"),
        l = 3, c = 2).orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(rows) === run(rows.repartition(23)))
  }

  test("laplaceRelease: deterministic replayable noise, both signs, " +
      "epsilon scaling, and the >= 0 release clamp") {
    val rows = (0L until 300L).map(i => ("g" + (i % 6)))
      .toDF("g")
    val r1 = Privacy.laplaceRelease(rows, Seq(col("g")), Seq("g"),
      epsilon = 1.0, seed = "t:")
    val r2 = Privacy.laplaceRelease(rows, Seq(col("g")), Seq("g"),
      epsilon = 1.0, seed = "t:")
    assert(r1.collect().toSeq === r2.collect().toSeq) // same seed ⇒ same release
    val byG = r1.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(byG.values.exists(_ > 0) && byG.values.exists(_ < 0))
    // ε scaling: Laplace(1/ε) — halving ε exactly doubles each draw
    val half = Privacy.laplaceRelease(rows, Seq(col("g")), Seq("g"),
        epsilon = 0.5, seed = "t:")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    byG.foreach { case (g, n) =>
      assert(math.abs(half(g) - 2 * n) < 1e-12)
    }
    // clamp: the (seed "t:", group "lone", ε=0.2) draw is the fixed
    // value −5.78120477, so count 1 + noise floors below 0 and the
    // release clamps
    val single = Seq("lone").toDF("g")
    val out = Privacy.laplaceRelease(single, Seq(col("g")),
        Seq("g"), epsilon = 0.2, seed = "t:").collect().head
    assert(math.abs(out.getDouble(2) - (-5.78120477)) < 1e-9)
    assert(out.getLong(4) === 0L)
    // true counts are preserved alongside the noise
    assert(r1.collect().map(r => r.getLong(1)).sum === 300L)
  }

  test("laplaceRelease sensitivity scales the noise exactly and is " +
      "reported") {
    val rows = (0L until 60L).map(i => "g" + (i % 3)).toDF("g")
    def noises(sens: Double) =
      Privacy.laplaceRelease(rows, Seq(col("g")), Seq("g"),
          epsilon = 1.0, seed = "s:", sensitivity = sens)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(2), r.getDouble(6))).toMap
    val s1 = noises(1.0); val s5 = noises(5.0)
    s1.foreach { case (g, (n1, rep1)) =>
      assert(rep1 === 1.0)
      assert(math.abs(s5(g)._1 - 5.0 * n1) < 1e-12)
      assert(s5(g)._2 === 5.0)
    }
  }

  test("boundContribution caps per-user rows with a deterministic " +
      "keep preference") {
    val rows = (0L until 40L).map(i => (i % 4, i)).toDF("u", "k")
    val capped = Privacy.boundContribution(rows, col("u"), col("k"),
      cap = 3)
    val byU = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // each user keeps exactly its 3 SMALLEST keys (order preference)
    (0L until 4L).foreach { u =>
      assert(byU(u) === Seq(u, u + 4, u + 8))
    }
    // cap >= group size keeps everything
    assert(Privacy.boundContribution(rows, col("u"), col("k"), 100)
      .count() === 40L)
  }
}
