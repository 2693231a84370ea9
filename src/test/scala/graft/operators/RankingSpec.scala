package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Ranking-model invariants, hand-computed (independent scalar
  * arithmetic — the DuckDB oracle is the at-scale check). */
class RankingSpec extends SparkTestBase {
  import spark.implicits._

  private def ln9(x: Double): Double = math.floor(math.log(x) * 1e9) / 1e9

  test("dirichletTopK: hand-computed smoothing incl. zero-tf terms") {
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val out = Ranking.dirichletTopK(docs, "doc_id", "text",
      Seq(0 -> Seq("x")), k = 10).collect()
    // corpus: |C|=5, cf(x)=2; d1: tf=2 len=3; d2: tf=0 len=2
    val s1 = ln9((2.0 + (2000.0 * 2) / 5) / (3 + 2000.0))
    val s2 = ln9((0.0 + (2000.0 * 2) / 5) / (2 + 2000.0))
    assert(out.map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSeq ===
      Seq((0, 1, 1L, s1), (0, 2, 2L, s2)))
  }

  test("maxSimTopK: hand case — per-token maxima, summed") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 1f)), // the query
      (10L, Array(1f, 0f, 1f, 0f)), // tok max 1 + 0
      (11L, Array(0f, 1f, 0f, 1f)), // 0 + 1
      (12L, Array(1f, 1f, 1f, 1f))) // 1 + 1
      .toDF("vec_id", "embedding")
    val out = Ranking.maxSimTopK(vecs.filter(col("vec_id") === 0),
      "vec_id", vecs.filter(col("vec_id") >= 10), "vec_id",
      "embedding", tokens = 2, subDim = 2, k = 3).collect()
      .map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((12L, 2.0), (10L, 1.0), (11L, 1.0)))
  }

  test("signHammingTopK: hamming distances and exact-cosine rerank") {
    def vec(f: Int => Float): Array[Float] =
      Array.tabulate(64)(f)
    val base = vec(i => if (i % 2 == 0) 1f else -1f)
    val flip3 = base.clone(); (0 until 3).foreach(i => flip3(i) = -base(i))
    val vecs = Seq(
      (0L, base), (10L, base.clone), (11L, flip3),
      (12L, vec(_ => 1f)))
      .toDF("vec_id", "embedding")
    val out = Ranking.signHammingTopK(
      vecs.filter(col("vec_id") === 0), "vec_id",
      vecs.filter(col("vec_id") >= 10), "vec_id", "embedding",
      shortlist = 3, k = 3).collect()
      .map(r => (r.getLong(2), r.getInt(3)))
    // identical copy: hamming 0; 3 sign flips: hamming 3
    // (flipped dims 0 and 2 were set bits, dim 1 was not → all 3 differ);
    // all-ones: the 32 odd dims differ
    assert(out.map(_._1).toSet === Set(10L, 11L, 12L))
    val ham = out.toMap
    assert(ham(10L) === 0 && ham(11L) === 3 && ham(12L) === 32)
    // exact-cosine rerank puts the identical copy first
    assert(out.head._1 === 10L)
  }

  test("signHammingTopK: non-default dims pack partial words and " +
      "mismatched vectors fail loudly") {
    def vec(n: Int)(f: Int => Float): Array[Float] = Array.tabulate(n)(f)
    val q40 = Seq((0L, vec(40)(i => if (i < 20) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val d40 = Seq(
      (10L, vec(40)(i => if (i < 20) 1f else -1f)),
      (11L, vec(40)(_ => 1f)))
      .toDF("vec_id", "embedding")
    val out = Ranking.signHammingTopK(q40, "vec_id", d40, "vec_id",
      "embedding", shortlist = 2, k = 2, dims = 40).collect()
      .map(r => (r.getLong(2), r.getInt(3))).toMap
    // copy: 0; all-ones differs on the 20 negative dims (incl. the
    // 8 bits living in the partial second word)
    assert(out === Map(10L -> 0, 11L -> 20))
    val bad = Seq((20L, vec(17)(_ => 1f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Ranking.signHammingTopK(q40, "vec_id", bad, "vec_id",
        "embedding", dims = 40).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("expected 40 dims, got 17")))
  }

  test("dirichletTopK is invariant to input partitioning") {
    val docs = (1 to 50).map(i =>
      (i.toLong, s"w${i % 5} w${i % 3} w${i % 7} tail"))
      .toDF("doc_id", "text")
    val q = Seq(0 -> Seq("w1", "w2"), 1 -> Seq("w0", "tail"))
    val a = Ranking.dirichletTopK(docs.repartition(1), "doc_id",
      "text", q).collect().toSeq
    val b = Ranking.dirichletTopK(docs.repartition(11), "doc_id",
      "text", q).collect().toSeq
    assert(a === b)
  }
}
