package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Rerank boundary: deterministic stub scoring, micro-batch
  * invariance, per-query top-k with the (score DESC, id) order. */
class RerankSpec extends SparkTestBase {

  private def cands = {
    import spark.implicits._
    (for (q <- Seq("alpha query", "beta query"); p <- 0 until 7)
      yield (q, q.take(1), p.toLong, s"passage number $p about $q"))
      .toDF("qid", "_q1", "pid", "ptext")
      .select(col("qid"), col("pid"), col("ptext"))
  }

  test("stub score equals the direct murmur computation and rides " +
      "into a deterministic top-k") {
    val svc = new Rerank.HashRerankService
    val out = Rerank.rerankTopK(cands, "qid", "qid", "pid", "ptext",
      svc, k = 3).collect()
    assert(out.length === 6, "3 per query")
    out.foreach { r =>
      val q = r.getAs[String]("qid"); val p = r.getAs[String]("ptext")
      val h = graft.functions.Murmur3
        .hash32((q + "\u0001" + p).getBytes("UTF-8"), 0).toLong
      val expect = (((h % 1000000) + 1000000) % 1000000).toDouble / 1e6
      assert(r.getAs[Double]("rerank_score") === expect)
    }
    // ranks descend in score within each query
    out.groupBy(_.getAs[String]("qid")).values.foreach { rows =>
      val byRnk = rows.sortBy(_.getAs[Int]("rnk"))
        .map(_.getAs[Double]("rerank_score"))
      assert(byRnk.sameElements(byRnk.sorted.reverse))
    }
  }

  test("micro-batch size never changes the result") {
    val svc = new Rerank.HashRerankService
    def run(bs: Int) = Rerank.rerankTopK(cands, "qid", "qid", "pid",
        "ptext", svc, k = 5, batchSize = bs)
      .select("qid", "pid", "rerank_score", "rnk")
      .collect().map(_.toSeq).toSet
    assert(run(1) === run(3))
    assert(run(3) === run(100))
  }

  test("distillation pairs: top-1 positive, next ranks as hard " +
      "negatives, margins exact") {
    import spark.implicits._
    val scored = Seq(
      ("q1", "a", 0.9, 1), ("q1", "b", 0.7, 2), ("q1", "c", 0.4, 3),
      ("q1", "d", 0.1, 4),
      ("q2", "x", 0.8, 1), ("q2", "y", 0.5, 2))
      .toDF("qid", "pid", "rerank_score", "rnk")
    val pairs = Rerank.distillationPairs(scored, "qid", "pid",
      nNegatives = 2).collect()
    // q1 contributes 2 negatives (d at rank 4 exceeds nNegatives+1),
    // q2 has only one candidate below the positive
    assert(pairs.length === 3)
    val q1 = pairs.filter(_.getAs[String]("qid") == "q1")
      .sortBy(_.getAs[Int]("neg_rank"))
    assert(q1.forall(_.getAs[String]("pos_id") == "a"))
    assert(q1.map(_.getAs[String]("neg_id")).toSeq === Seq("b", "c"))
    assert(q1.map(_.getAs[Double]("margin")).toSeq ===
      Seq(0.9 - 0.7, 0.9 - 0.4))
    val q2 = pairs.filter(_.getAs[String]("qid") == "q2")
    assert(q2.head.getAs[String]("neg_id") == "y" &&
      q2.head.getAs[Double]("margin") == 0.8 - 0.5)
  }

  test("service calls retry: a twice-failing service still scores") {
    var fails = 2
    val flaky = new Rerank.RerankService {
      def score(batch: Seq[(String, String)]): Seq[Double] = {
        if (fails > 0) { fails -= 1; sys.error("transient") }
        batch.map(_ => 0.5)
      }
    }
    val out = Rerank.rerankTopK(cands.coalesce(1), "qid", "qid",
      "pid", "ptext", flaky, k = 2, sleep = _ => ())
    assert(out.count() === 4)
  }
}
