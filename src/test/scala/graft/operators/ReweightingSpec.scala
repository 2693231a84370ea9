package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Reweighting.domainReweight]] — the multiplicative-weights
  * update pinned against a hand-replayed reference (same trunc9 /
  * decimal-sum arithmetic). */
class ReweightingSpec extends SparkTestBase {
  import spark.implicits._

  private def t9(x: Double): Double = math.floor(x * 1e9) / 1e9

  test("uniform losses stay at the uniform mixture") {
    val losses = Seq(("a", 2.5), ("b", 2.5), ("c", 2.5), ("d", 2.5))
      .toDF("dom", "l")
    val out = Reweighting.domainReweight(losses, "dom", "l",
        eta = 0.5, rounds = 3).collect()
    out.foreach { r =>
      assert(r.getDouble(3) === 0.0)          // excess
      assert(math.abs(r.getDouble(4) - 0.25) < 1e-9)
    }
  }

  test("one round on two domains matches the hand-replayed update") {
    val losses = Seq(("lo", 1.0), ("hi", 3.0)).toDF("dom", "l")
    val out = Reweighting.domainReweight(losses, "dom", "l",
        eta = 1.0, rounds = 1)
      .collect().map(r => r.getString(1) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    // w0 = t9(1/2) = 0.5 each; bl = t9(.5·1) + t9(.5·3) = 2.0
    // lo: excess 0, wu = .5·t9(e^0) = .5
    // hi: excess 1, wu = .5·t9(e^1)
    val wuHi = 0.5 * t9(math.exp(1.0))
    val z = t9(0.5) + t9(wuHi)
    assert(out("lo")._1 === 0.0 && out("hi")._1 === 1.0)
    assert(math.abs(out("lo")._2 - 0.5 / z) < 1e-15)
    assert(math.abs(out("hi")._2 - wuHi / z) < 1e-15)
  }

  test("weights order by loss, concentrate over rounds, and sum " +
      "to ~1 every round") {
    val losses = Seq(("a", 1.0), ("b", 2.0), ("c", 4.0), ("d", 8.0))
      .toDF("dom", "l")
    val rows = Reweighting.domainReweight(losses, "dom", "l",
        eta = 0.3, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
        r.getDouble(4)))
    (1 to 4).foreach { t =>
      val round = rows.filter(_._1 == t).sortBy(_._3)
      assert(math.abs(round.map(_._4).sum - 1.0) < 1e-6)
      // non-decreasing weight in loss
      assert(round.map(_._4).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1) + 1e-15))
    }
    // the top-loss domain's weight strictly grows round over round
    val dWeights = (1 to 4).map(t =>
      rows.find(r => r._1 == t && r._2 == "d").get._4)
    assert(dWeights.sliding(2).forall(p => p(0) < p(1)))
  }
}
