package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization, SimilaritySearch}
import graft.queries.Tables

/** ANN quality harness: recall@k of every approximate retrieval path
  * against the exact float scan, on the real embeddings table. Speed
  * without recall numbers is how ANN bugs hide (ScaleBench round-4
  * log: the 8-bit banding config was FAST and quietly non-linear) —
  * this prints the accuracy side of the trade.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.RecallBench
  * One JSON line per path: {"path":..., "recall":..., "k":..., "n":...}
  */
object RecallBench {

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val k = 10
    val nq = 50
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label")).persist()
    val queries = emb.filter(col("vec_id") < nq)

    val exact = topkSet(SimilaritySearch.bruteForceTopKHeap(
      queries, "vec_id", emb, "vec_id", "embedding", k))

    def report(path: String, got: Set[(Long, Long)]): Unit = {
      val recall = (exact & got).size.toDouble / exact.size
      println(s"""{"path":"$path","recall":$recall,"k":$k,"n":$nq}""")
    }

    report("int8_quantized", topkSet(SimilaritySearch.quantizedTopK(
      queries, "vec_id", emb, "vec_id", "embedding", k)))

    val kmCents = SimilaritySearch.kmeansCentroids(
      emb, "vec_id", "embedding", k = 16, maxIter = 5)
    for (nProbe <- Seq(1, 2, 4, 8)) {
      report(s"ivf_kmeans16_nprobe$nProbe",
        topkSet(SimilaritySearch.ivfTopK(queries, "vec_id",
          emb, "vec_id", "embedding", kmCents, k, nProbe)))
    }

    val m = 8
    val cb = ProductQuantization.codebooks(emb, "label", "embedding", m)
    val kCodes = cb.agg(max(col("code"))).head.getInt(0) + 1
    val enc = ProductQuantization.encode(emb, "vec_id", "embedding", cb, m)
    report("pq_adc_m8", topkSet(ProductQuantization.adcTopK(
      queries, "vec_id", enc, cb, "embedding", m, kCodes, k)))

    for (rr <- Seq(5, 10, 20)) {
      report(s"pq_adc_m8_rerank$rr",
        topkSet(ProductQuantization.adcTopKRerank(queries, "vec_id",
          emb, "vec_id", "embedding", enc, cb, m, kCodes, k,
          rerank = rr)))
    }

    // IVFADC: coarse k-means cells + PQ on residuals (16 codewords
    // per subspace, trained by per-subspace k-means)
    val rcb = ProductQuantization.codebooksKmeans(
      emb, "vec_id", "embedding", m, kCodes = 16, maxIter = 3)
    val idx = ProductQuantization.ivfadcIndex(
      emb, "vec_id", "embedding", kmCents, rcb, m)
    for (nProbe <- Seq(4, 8); rr <- Seq(0, 5)) {
      report(s"ivfadc_m8x16_nprobe${nProbe}_rerank$rr",
        topkSet(ProductQuantization.ivfadcTopK(queries, "vec_id",
          emb, "vec_id", "embedding", kmCents, rcb, idx,
          m, kCodes = 16, k = k, nProbe = nProbe, rerank = rr)))
    }

    spark.stop()
  }
}
