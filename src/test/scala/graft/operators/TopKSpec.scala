package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Heap top-k == window top-k, bit for bit (T1 at the 100 TB shape). */
class TopKSpec extends SparkTestBase {

  test("heap and window brute-force top-k agree on testdata") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val window = SimilaritySearch.bruteForceTopK(
      queries, "vec_id", emb, "vec_id", "embedding", k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val heap = SimilaritySearch.bruteForceTopKHeap(
      queries, "vec_id", emb, "vec_id", "embedding", k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(heap === window)
  }

  test("heap top-k handles k larger than group size") {
    import spark.implicits._
    val scored = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 12L, 0.1))
      .toDF("qid", "id", "score")
    val got = TopK.perQuery(scored, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSet === Set((1L, 11L, 1), (1L, 10L, 2), (2L, 12L, 1)))
  }

  test("ties break on id ascending (deterministic)") {
    import spark.implicits._
    val scored = Seq((1L, 20L, 0.7), (1L, 10L, 0.7), (1L, 30L, 0.7))
      .toDF("qid", "id", "score")
    val got = TopK.perQuery(scored, 2)
      .orderBy("rnk").collect().map(_.getLong(1))
    assert(got.toSeq === Seq(10L, 20L))
  }
}
