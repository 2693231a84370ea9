package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.dotF64

/** Johnson–Lindenstrauss random projection — the ±1 "database
  * friendly" variant (Achlioptas 2001): project d-dim embeddings to
  * k ≪ d dims with a sign matrix; pairwise distances are preserved
  * within (1±ε) w.h.p., so the projected space is a cheap candidate
  * generator for similarity search (shortlist in k dims, exact
  * rerank in d — the same shortlist+rerank shape as the PQ/int8
  * paths).
  *
  * No RNG state anywhere: sign(i, j) is a pure function of the
  * coordinates via md5, so every task, every engine — and the DuckDB
  * oracle — derives the IDENTICAL matrix. The matrix enters the plan
  * as literal arrays feeding the codegen [[graft.functions
  * .VectorExpressions.DotF64]] kernel (a sequential double fold,
  * bit-identical to DuckDB's `list_dot_product`): k dot products per
  * row, no shuffle, no join, no broadcast — projecting 100 TB of
  * vectors is embarrassingly parallel and the q119 oracle is
  * replayable to the last bit.
  */
object Projection {

  /** +1 where md5("i_j") opens with hex digit 0-7, else −1 —
    * balanced, engine-portable, and trivially replayable in SQL. */
  def sign(i: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_${j}".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) < 8) 1.0 else -1.0
  }

  /** outDim × inDim sign matrix (row j = projection direction j). */
  def signs(inDim: Int, outDim: Int): Array[Array[Double]] =
    Array.tabulate(outDim, inDim)((j, i) => sign(i, j))

  /** Append `projCol`: the outDim-vector of dot products against the
    * sign rows. Pure per-row expression — see class scaladoc. */
  def project(df: DataFrame, vecCol: String, inDim: Int, outDim: Int,
      projCol: String = "proj"): DataFrame = {
    val m = signs(inDim, outDim)
    val e = col(vecCol).cast("array<double>")
    df.withColumn(projCol,
      array((0 until outDim).map(j =>
        dotF64(e, typedlit(m(j).toSeq))): _*))
  }

  /** Projected-space shortlist + exact rerank: top-`k` by cosine in
    * the ORIGINAL space, with candidates from the `shortlist` nearest
    * by projected L2 distance — the JL candidate-generation shape
    * (same shortlist+rerank contract as
    * [[ProductQuantization.adcTopKRerank]], whose
    * [[ProductQuantization.exactRerank]] tail this reuses). Queries
    * ride a broadcast; the shortlist heap bounds the shuffle to
    * `shortlist` rows per query per partition. */
  def projectedTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String,
      inDim: Int, outDim: Int, k: Int, shortlist: Int): DataFrame = {
    val pc = project(corpus, vecCol, inDim, outDim, "p_c")
      .select(col(idCol).as("cid"), col("p_c"))
    val pq = project(queries, vecCol, inDim, outDim, "p_q")
      .select(col(qIdCol).as("qid"), col("p_q"))
    val dist2 = aggregate(
      zip_with(col("p_c"), col("p_q"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    val short = TopK.perQuery(
      pc.join(broadcast(pq), lit(true))
        .withColumn("score", -dist2)
        .select(col("qid"), col("cid").as("id"), col("score")),
      shortlist)
      .select(col("qid"), col("cid"))
    ProductQuantization.exactRerank(short, queries, qIdCol,
      corpus, idCol, vecCol, k)
  }
}
