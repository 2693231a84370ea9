package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** As-of join semantics on a hand corpus: latest-≤ matching, equal
  * timestamps, deterministic tie resolution, missing-build nulls,
  * key isolation, and the one-exchange plan shape. */
class AsOfJoinSpec extends SparkTestBase {

  private lazy val probe = {
    import spark.implicits._
    Seq(
      (100L, 1L, 50L),   // after b=2 (t=40)
      (101L, 1L, 10L),   // before any build row for key 1
      (102L, 1L, 30L),   // exactly at build t=30 → matches it
      (103L, 2L, 99L),   // key 2: only its own build rows visible
      (104L, 3L, 10L)    // key 3: no build rows at all
    ).toDF("event_id", "user_id", "t")
  }

  private lazy val build = {
    import spark.implicits._
    Seq(
      (1L, 1L, 20L, 0.2),
      (2L, 1L, 40L, 0.4),
      (3L, 1L, 30L, 0.3),
      (4L, 2L, 98L, 9.8),
      (5L, 1L, 40L, 4.4)  // tie with id=2 at t=40 → greater id wins
    ).toDF("event_id", "user_id", "t", "value")
  }

  private def run() = AsOfJoin.asOf(probe, build, Seq("user_id"),
    timeCol = "t", tieCol = "event_id", payloadCols = Seq("t", "value"))
    .orderBy("event_id")
    .collect()
    .map(r => (r.getLong(0),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4))))

  test("latest build row at-or-before each probe, per key") {
    val rows = run()
    // probe 100 (t=50): builds at 20,30,40,40 → t=40, tie → id 5
    assert(rows(0) === ((100L, Some(40L), Some(4.4))))
    // probe 101 (t=10): nothing at or before
    assert(rows(1) === ((101L, None, None)))
    // probe 102 (t=30): equal timestamp matches
    assert(rows(2) === ((102L, Some(30L), Some(0.3))))
    // probe 103 (key 2): sees only key-2 builds
    assert(rows(3) === ((103L, Some(98L), Some(9.8))))
    // probe 104 (key 3): no builds for the key
    assert(rows(4) === ((104L, None, None)))
  }

  test("probe columns survive untouched and row count is exactly " +
      "the probe count") {
    val out = AsOfJoin.asOf(probe, build, Seq("user_id"), "t",
      "event_id", Seq("value"))
    assert(out.count() === probe.count())
    assert(out.columns.toSeq ===
      Seq("event_id", "user_id", "t", "asof_value"))
  }

  test("plan: one exchange on the key, no join operator at all") {
    val out = AsOfJoin.asOf(probe, build, Seq("user_id"), "t",
      "event_id", Seq("value"))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "as-of must not plan a join")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      "exactly one key exchange expected")
  }

  // ---- custom physical operator (AsOfJoinExec) ----

  private def runMerge() = AsOfJoin.asOfMerge(probe, build,
    Seq("user_id"), timeCol = "t", tieCol = "event_id",
    payloadCols = Seq("t", "value"))
    .orderBy("event_id")
    .collect()
    .map(r => (r.getLong(0),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4))))

  test("asOfMerge: same verdicts as the union+window form on the " +
      "hand corpus") {
    assert(runMerge().toSeq === run().toSeq)
  }

  test("asOfMerge: plans the custom AsOfJoinExec operator inside a " +
      "WholeStageCodegen span (r5)") {
    val out = AsOfJoin.asOfMerge(probe, build, Seq("user_id"), "t",
      "event_id", Seq("value"))
    // collect() executes THIS queryExecution, so its adaptive plan
    // finalizes in place (count() would build a separate one)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$p")
    // `*(N) !AsOfJoin` = the exec is a codegen producer, not the
    // interpreted fallback; a silent fallback (e.g. a doProduce
    // compile error) would drop the `*` prefix and reopen the
    // interpreted-loop cost this round closed
    assert(p.split("\n").exists(l =>
      l.contains("AsOfJoin") && l.trim.matches("""[+:\-\s]*\*\(\d+\).*""")),
      s"AsOfJoinExec fell out of whole-stage codegen:\n$p")
    assert(out.count() === probe.count())
    assert(out.columns.toSeq ===
      Seq("event_id", "user_id", "t", "asof_value"))
  }

  test("asOfMerge: null keys and null times never match, either side") {
    import spark.implicits._
    val p = Seq(
      (1L, Option(1L), Option(50L)),
      (2L, Option(1L), Option.empty[Long]), // null probe time
      (3L, Option.empty[Long], Option(50L)) // null probe key
    ).toDF("event_id", "user_id", "t")
    val b = Seq(
      (10L, Option(1L), Option(40L), 0.4),
      (11L, Option(1L), Option.empty[Long], 9.9), // null build time
      (12L, Option.empty[Long], Option(10L), 8.8) // null build key
    ).toDF("event_id", "user_id", "t", "value")
    val got = AsOfJoin.asOfMerge(p, b, Seq("user_id"), "t",
      "event_id", Seq("value")).orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === Seq(
      (1L, Some(0.4)), (2L, None), (3L, None)))
  }

  test("asOfMerge: self-as-of (both sides from one source) binds " +
      "unambiguously") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, 10L, 1.0), (2L, 7L, 20L, 2.0), (3L, 7L, 30L, 3.0)
    ).toDF("event_id", "user_id", "t", "value")
    // each row as-of itself: equal timestamps match (≤), so the
    // payload is its own value
    val got = AsOfJoin.asOfMerge(ev, ev, Seq("user_id"), "t",
      "event_id", Seq("value")).orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(got.toSeq === Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("asOfMerge registers its strategy once, not per call") {
    AsOfJoin.asOfMerge(probe, build, Seq("user_id"), "t",
      "event_id", Seq("value")).count()
    AsOfJoin.asOfMerge(probe, build, Seq("user_id"), "t",
      "event_id", Seq("value")).count()
    val n = spark.experimental.extraStrategies
      .count(_ == graft.plans.GraftAsOfStrategy)
    assert(n === 1, s"strategy registered $n times")
  }

  test("asOfMerge ≡ asOf on the events testdata slice") {
    val ev = graft.queries.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val a = AsOfJoin.asOf(purchases, views, Seq("user_id"), "ts",
      "event_id", Seq("ts", "value")).orderBy("event_id").collect()
    val m = AsOfJoin.asOfMerge(purchases, views, Seq("user_id"), "ts",
      "event_id", Seq("ts", "value")).orderBy("event_id").collect()
    assert(a.length === m.length && a.length > 0)
    a.zip(m).foreach { case (x, y) => assert(x === y) }
  }
}
