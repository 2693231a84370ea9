package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY §2.11 V3/T1 — the
  * reference's cosine top-k retrieval, `services/database.py:202-236`,
  * k=4 default `shared/defaults.py:88`).
  *
  * Scale design: the baseline is a block-partitioned brute-force scan —
  * queries broadcast (small side), corpus stays partitioned, per-query
  * top-k via ranked window on (query, score). The IVF variant prunes
  * the corpus to the `nProbe` nearest coarse cells first, turning the
  * scan into a bucket-join — the 100 TB path.
  */
object SimilaritySearch {

  /** Brute-force cosine top-k: every query against every corpus row.
    * Queries are broadcast; the dot product never shuffles the corpus.
    * Ties break on corpus id for determinism. */
  def bruteForceTopK(queries: DataFrame, queryIdCol: String,
      corpus: DataFrame, corpusIdCol: String, vecCol: String,
      k: Int): DataFrame = {
    // Norms are computed once per row BEFORE the cross join (n + m
    // sqrt-dots instead of n·m·3) — the per-pair work is one fused
    // codegen dot product. Same arithmetic as cosine(), so scores are
    // bit-identical.
    val q = queries.select(col(queryIdCol).as("qid"),
      col(vecCol).as("qvec"), l2Norm(col(vecCol)).as("qnorm"))
    val c = corpus.select(col(corpusIdCol).as("cid"),
      col(vecCol).as("cvec"), l2Norm(col(vecCol)).as("cnorm"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("score",
        dotF64(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("score"), col("cid"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
  }

  /** [[bruteForceTopK]] with the bounded-heap aggregation shape
    * ([[TopK]]): map-side per-partition top-k, shuffle of k rows per
    * (partition, query) instead of the full scored cross product —
    * the formulation that survives a 100 TB corpus. Long ids only;
    * results are identical to the window formulation. */
  def bruteForceTopKHeap(queries: DataFrame, queryIdCol: String,
      corpus: DataFrame, corpusIdCol: String, vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("qid"),
      col(vecCol).as("qvec"), l2Norm(col(vecCol)).as("qnorm"))
    val c = corpus.select(col(corpusIdCol).as("id"),
      col(vecCol).as("cvec"), l2Norm(col(vecCol)).as("cnorm"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("score",
        dotF64(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .select(col("qid"), col("id"), col("score"))
    TopK.perQuery(scored, k)
  }

  /** All corpus pairs with cosine similarity above `threshold`
    * (embedding near-dup surface). Self cross-join bounded by id_a <
    * id_b; at scale, swap in [[ivfTopK]]-style cell pruning first. */
  def cosinePairsAbove(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      l2Norm(col(vecCol)).as("norm_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      l2Norm(col(vecCol)).as("norm_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("score",
        dotF64(col("vec_a"), col("vec_b")) / (col("norm_a") * col("norm_b")))
      .filter(col("score") > threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** IVF-style ANN: coarse-quantize the corpus to `centroids` (a small
    * DataFrame of (cell_id, centroid)), then search only the `nProbe`
    * cells nearest each query. Centroids broadcast twice (assignment +
    * probe); the fine scan joins corpus cells to query probes on
    * cell_id — a hash join on a low-cardinality key instead of a full
    * cross product. Recall < 1.0 by construction; the brute-force scan
    * above is the exactness oracle. */
  def ivfTopK(queries: DataFrame, queryIdCol: String, corpus: DataFrame,
      corpusIdCol: String, vecCol: String, centroids: DataFrame,
      k: Int, nProbe: Int = 2): DataFrame = {
    val cellW = Window.partitionBy(col("_rid")).orderBy(
      desc("_cscore"), col("cell_id"))
    def assign(df: DataFrame, idC: String, probes: Int): DataFrame =
      df.withColumn("_rid", col(idC))
        .crossJoin(broadcast(centroids))
        .withColumn("_cscore", cosine(col(vecCol), col("centroid")))
        .withColumn("_crnk", row_number().over(cellW))
        .filter(col("_crnk") <= probes)
        .drop("_cscore", "_crnk", "centroid", "_rid")
    val corpusCells = assign(corpus, corpusIdCol, 1)
      .select(col(corpusIdCol).as("cid"), col(vecCol).as("cvec"),
        col("cell_id"))
    val queryCells = assign(queries, queryIdCol, nProbe)
      .select(col(queryIdCol).as("qid"), col(vecCol).as("qvec"),
        col("cell_id"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("score"), col("cid"))
    corpusCells.join(broadcast(queryCells), Seq("cell_id"))
      .withColumn("score", cosine(col("qvec"), col("cvec")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("cid"), col("score"), col("rnk"))
  }

  /** K-means-free coarse centroids: mean vector per existing label
    * column — deterministic (decimal-exact accumulation), good enough
    * for IVF cells on clustered data. Returns (cell_id, centroid). */
  def labelCentroids(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    df.select(col(labelCol).as("cell_id"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("cell_id"), col("pos"))
      .agg((sum(col("col").cast("decimal(28,14)")).cast("double")
        / count(lit(1))).as("m"))
      .groupBy(col("cell_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .as("pm"))
      .withColumn("centroid", transform(col("pm"), x => x.getField("m"))
        .cast("array<float>"))
      .select(col("cell_id"), col("centroid"))
}
