package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The keyless-interval-join rewrite: value equivalence against the
  * nested-loop plan, the plan shape change, scope guards, and the
  * fixed point. */
class BucketedRangeJoinSpec extends SparkTestBase {

  private def frames = {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val a = (1 to 80).map(i => (i.toLong, rnd.nextInt(2000).toLong))
      .toDF("aid", "t")
    val b = (1 to 300).map(i => (i.toLong + 1000, rnd.nextInt(2000).toLong))
      .toDF("bid", "t")
    (a, b)
  }

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BucketedRangeJoin
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("rewritten keyless interval join matches the nested-loop " +
      "result exactly") {
    val (a, b) = frames
    def query = a.join(b,
      b("t") >= a("t") - 100L && b("t") <= a("t") + 100L)
      .select(a("aid"), b("bid"))
    val naive = query.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(naive.nonEmpty)
    val (rewritten, plan) = withRule {
      val q = query
      (q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
        q.queryExecution.executedPlan.toString)
    }
    assert(rewritten === naive)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator
      .filter(_.contains("Join")).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Generate explode"),
      "probe side should explode bucket ids")
  }

  test("strict bounds tighten by one microsecond") {
    val (a, b) = frames
    def query = a.join(b,
      b("t") > a("t") - 50L && b("t") < a("t") + 50L)
      .select(a("aid"), b("bid"))
    val naive = query.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val rewritten = withRule {
      query.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(rewritten === naive)
  }

  test("scope guards: equi-keyed joins and non-interval conditions " +
      "are untouched") {
    val (a, b) = frames
    withRule {
      // cross-side equality present → rule must not fire
      val equi = a.join(b, a("t") === b("t") &&
        b("bid") >= a("aid") - 5L && b("bid") <= a("aid") + 5L)
      assert(!equi.queryExecution.optimizedPlan.toString
        .contains("_graft_bkt"))
      // single bound only → no rewrite
      val oneSided = a.join(b, b("t") >= a("t") - 100L)
      assert(!oneSided.queryExecution.optimizedPlan.toString
        .contains("_graft_bkt"))
    }
  }

  test("fixed point: the rewritten join carries an equality conjunct " +
      "the rule cannot match again") {
    val (a, b) = frames
    withRule {
      val q = a.join(b,
        b("t") >= a("t") - 100L && b("t") <= a("t") + 100L)
      val once = q.queryExecution.optimizedPlan
      assert(once.toString.contains("_graft_bkt"))
      assert(BucketedRangeJoin(once) === once)
    }
  }
}
