package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Retrieval-rank invariants (SURVEY §5: "top-k ordering (T1)") +
  * IVF recall against the brute-force oracle. */
class SimilaritySpec extends SparkTestBase {

  test("bruteForceTopK returns score-ordered neighbors (T1)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("id", "vec")
    val queries = Seq((100L, Array(1.0f, 0.0f))).toDF("id", "vec")
    val got = SimilaritySearch.bruteForceTopK(
      queries, "id", corpus, "id", "vec", k = 3)
      .orderBy("rnk").collect()
    assert(got.map(_.getAs[Long]("cid")).toSeq === Seq(1L, 2L, 3L))
    val scores = got.map(_.getAs[Double]("score"))
    assert(math.abs(scores(0) - 1.0) <= 1e-12)
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("cosine kernel matches hand computation") {
    import spark.implicits._
    val r = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")),
        VectorFunctions.l2Norm(col("a")))
      .head()
    assert(math.abs(r.getDouble(0) - 24.0 / 25.0) <= 1e-12)
    assert(math.abs(r.getDouble(1) - 5.0) <= 1e-12)
  }

  test("l2Normalize yields unit vectors") {
    import spark.implicits._
    val n = Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v")
      .select(VectorFunctions.l2Norm(
        VectorFunctions.l2Normalize(col("v")))).head().getDouble(0)
    assert(math.abs(n - 1.0) <= 1e-12)
  }

  test("IVF top-k achieves high recall vs brute force on testdata") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val exact = SimilaritySearch.bruteForceTopK(
      queries, "vec_id", emb, "vec_id", "embedding", k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val cents = SimilaritySearch.labelCentroids(emb, "label", "embedding")
    val approx = SimilaritySearch.ivfTopK(
      queries, "vec_id", emb, "vec_id", "embedding", cents,
      k = 10, nProbe = 4)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall > 0.5, s"IVF recall $recall too low")
  }

}
