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
}
