package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[RecordLinkage]] — EM separates a perfectly-informative field,
  * learned parameters bracket the planted rates, score() posteriors
  * separate matches from non-matches, and partitioning never
  * changes the fit. */
class RecordLinkageSpec extends SparkTestBase {
  import spark.implicits._

  // 120 match pairs (f1 always agrees, f2 agrees 90%) + 480
  // non-match pairs (f1 never agrees, f2 agrees 2%) — prevalence 0.2
  private def planted: Seq[(Boolean, Boolean)] =
    (0 until 120).map(i => (true, i % 10 != 0)) ++
      (0 until 480).map(i => (false, i % 50 == 0))

  test("EM drives m and u toward the planted rates") {
    val out = RecordLinkage.emFit(planted.toDF("f1", "f2"),
        Seq("f1", "f2"), rounds = 8)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (m1, u1, lam) = out("f1")
    val (m2, u2, _) = out("f2")
    // EM's optimum under conditional independence is softer than the
    // planted rates — assert clear separation, not exact recovery
    assert(m1 > 0.8 && u1 < 0.05 && m1 > 10 * u1, s"f1 m=$m1 u=$u1")
    assert(m2 > 0.5 && m2 > 2 * u2, s"f2 m=$m2 u=$u2")
    assert(lam > 0.1 && lam < 0.3, s"lambda=$lam")
  }

  test("score: posterior orders agreement patterns correctly") {
    val pairs = planted.toDF("f1", "f2")
    val params = RecordLinkage.emFit(pairs, Seq("f1", "f2"),
      rounds = 8)
    val post = RecordLinkage.score(pairs.distinct(), Seq("f1", "f2"),
        params)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        r.getDouble(2)).toMap
    // EM's likelihood optimum labels the both-agree cell the match
    // class; single-agreement pairs sit strictly between the clouds
    assert(post((true, true)) > 0.95)
    assert(post((false, false)) < 0.01)
    assert(post((true, false)) > post((false, false)) &&
      post((true, false)) < post((true, true)))
    assert(post((false, true)) > post((false, false)) &&
      post((false, true)) < post((true, true)))
  }

  test("partition invariance of the fit") {
    val df = planted.toDF("f1", "f2")
    def run(d: org.apache.spark.sql.DataFrame) =
      RecordLinkage.emFit(d, Seq("f1", "f2"), rounds = 3)
        .orderBy("field").collect().map(_.toSeq).toSeq
    assert(run(df) === run(df.repartition(19)))
  }
}
