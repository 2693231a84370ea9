package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** JL random projection: sign-matrix determinism, exact projection
  * semantics via basis vectors, and the candidate-generation recall
  * contract of the shortlist+rerank search. */
class ProjectionSpec extends SparkTestBase {

  test("sign matrix is deterministic, ±1, and roughly balanced") {
    val m = Projection.signs(64, 16)
    val m2 = Projection.signs(64, 16)
    assert(m.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m.flatten.forall(s => s == 1.0 || s == -1.0))
    val plus = m.flatten.count(_ == 1.0)
    assert(plus > 384 && plus < 640, // 1024 signs, expect ~512
      s"sign balance off: $plus of 1024 are +1")
  }

  test("projecting basis vector e_i reads out column i of the matrix") {
    import spark.implicits._
    val dim = 8
    val out = 4
    val m = Projection.signs(dim, out)
    val basis = (0 until dim).map(i =>
      (i.toLong, Array.tabulate(dim)(x => if (x == i) 1.0f else 0.0f)))
    val got = Projection.project(
        basis.toDF("vec_id", "embedding"), "embedding", dim, out)
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Double](2))
    (0 until dim).foreach { i =>
      assert(got(i) === (0 until out).map(j => m(j)(i)),
        s"projection of e_$i must be matrix column $i")
    }
  }

  test("projected shortlist + exact rerank recovers the exact top-k " +
      "on clustered vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val dim = 64
    // 5 well-separated cluster centers, 20 members each
    val centers = Array.fill(5, dim)(rnd.nextGaussian())
    val vecs = (0 until 100).map { id =>
      val c = centers(id / 20)
      (id.toLong, Array.tabulate(dim)(x =>
        (c(x) + 0.05 * rnd.nextGaussian()).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.filter(_._1 % 20 == 0).toDF("vec_id", "embedding")
    def hits(short: Int) =
      Projection.projectedTopK(corpus, queries, "vec_id", "embedding",
        "vec_id", dim, 16, k = 5, shortlist = short)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(100) // full shortlist == exact scan
    val jl = hits(20)     // 16-dim candidates, 20-deep shortlist
    val recall = (exact & jl).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"JL 64->16 shortlist must keep the exact top-k: recall=$recall")
    // and every hit stays in the query's own cluster
    assert(jl.forall { case (q, c) => q / 20 == c / 20 })
  }
}
