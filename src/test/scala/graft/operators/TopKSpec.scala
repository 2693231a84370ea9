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

  // the r14 optimization contract: the dedup-heap over a DUPLICATED
  // candidate stream must equal distinct→window→row_number exactly
  // (score a deterministic function of (qid, id) — equal-score dups)
  test("dedup heap equals distinct+window on a duplicated stream") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = (for {
      q <- 0L until 40L; c <- 0L until 60L
      copies <- 0 until (1 + ((q + c) % 3).toInt)
    } yield (q, c, ((q * 31 + c * 17) % 101).toDouble / 101.0))
    val scored = base.toDF("qid", "id", "score")
    val viaHeap = TopK.perQueryDedup(scored, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    val viaWindow = scored.distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    assert(viaHeap === viaWindow)
  }

  test("dedup heap: a duplicate can never occupy two of the k slots") {
    import spark.implicits._
    val scored = Seq((1L, 10L, 0.9), (1L, 10L, 0.9), (1L, 10L, 0.9),
      (1L, 20L, 0.5), (1L, 30L, 0.4))
      .toDF("qid", "id", "score")
    val got = TopK.perQueryDedup(scored, 2)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((10L, 1), (20L, 2)))
  }
}
