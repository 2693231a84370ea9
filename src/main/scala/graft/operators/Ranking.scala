package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorFunctions.dotF64

/** Retrieval scoring models beyond BM25/cosine (builder-brief
  * extension surface): the Dirichlet-smoothed query-likelihood LM
  * (Zhai & Lafferty 2001 — the other classic lexical ranker next to
  * BM25), ColBERT-style MaxSim late interaction (Khattab & Zaharia
  * 2020 — token-level dense scoring), and 1-bit sign-quantized
  * Hamming shortlisting with exact rerank (the binary-quantization
  * compressed-retrieval step production vector stores ship alongside
  * int8/PQ).
  *
  * Portability discipline throughout (the [[graft.queries.Tables]]
  * rules): ln truncated to 9 decimals, cross-row double sums through
  * exact DECIMAL casts, every ranking window ordered by a total
  * (score, id) key.
  */
object Ranking {

  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  private def t9(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  /** Dirichlet query likelihood: for query q and document d,
    *
    *   score(q,d) = Σ_{t∈q} ln( (tf(t,d) + μ·cf(t)/|C|) / (|d| + μ) )
    *
    * with collection frequency cf, collection size |C|, document
    * length |d| (CJK-aware tokens) and μ=2000 (the Zhai & Lafferty
    * sweet spot). Zero-tf terms still score (the smoothing is the
    * point), so the (query, doc) grid is explicit: queries are a
    * literal in-plan table BROADCAST against the per-doc length
    * frame — the data-sized work is one token-stream scan into tf
    * counts plus one shuffle to the per-(query,doc) sum. Top-k per
    * query by (score DESC, doc).
    *
    * Out-of-vocabulary query terms (cf = 0 — the term occurs in NO
    * document) are DROPPED from the scoring sum, by design: under
    * Dirichlet smoothing such a term has p(t|d) = 0 for every
    * document, i.e. a −∞ additive constant that carries no ranking
    * signal (standard LM-retrieval practice is to ignore it). A
    * query whose terms are ALL out-of-vocabulary consequently has no
    * output rows — callers that need a row per query should
    * left-join the query table against the result.
    *
    * Output: (qid, rnk, idCol, ql_score).
    */
  def dirichletTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[(Int, Seq[String])], mu: Double = 2000.0,
      k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = queryTerms
      .flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("qid", "term")
    val toks = docs.select(col(idCol).as("doc"),
      explode(graft.functions.TextFunctions.cjkAwareTokens(
        col(textCol))).as("w"))
    val tf = toks.groupBy(col("doc"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dlen = tf.groupBy(col("doc")).agg(sum(col("tf")).as("dlen"))
    // collection stats restricted to the query vocabulary before the
    // aggregate — cf for non-query terms is never needed, so the
    // frame entering the grid is |q-terms| rows, not |vocab|.
    val qcf = tf.join(broadcast(qterms), col("w") === col("term"))
      .groupBy(col("qid"), col("term"))
      .agg(sum(col("tf")).as("cf"))
    val ctot = dlen.agg(sum(col("dlen")).as("csz"))
    val muL = lit(mu)
    val tfn = tf.select(col("doc").as("tdoc"), col("w").as("tw"),
      col("tf"))
    val grid = dlen.crossJoin(broadcast(qcf.crossJoin(broadcast(ctot))))
      .join(tfn,
        col("doc") === col("tdoc") && col("term") === col("tw"),
        "left")
      .select(col("qid"), col("doc"), col("term"),
        coalesce(col("tf"), lit(0L)).as("tfv"),
        col("cf"), col("csz"), col("dlen"))
    val scored = grid.withColumn("s", ln9(
      (col("tfv") + (muL * col("cf")) / col("csz")) /
        (col("dlen") + muL)))
    val perDoc = scored.groupBy(col("qid"), col("doc"))
      .agg(sum(col("s").cast(DecimalType(18, 9))).cast("double")
        .as("ql_score"))
    perDoc
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("ql_score").desc, col("doc"))))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("doc").as(idCol),
        col("ql_score"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** ColBERT-style MaxSim late interaction over sliced sub-vectors:
    * each `dim`-float embedding is treated as `tokens` contiguous
    * sub-vectors ("token embeddings"); score(q,d) = Σ over q-tokens
    * of max over d-tokens of ⟨qtok, dtok⟩. Every per-pair dot runs
    * in the codegen [[graft.functions.VectorExpressions.DotF64]]
    * kernel; maxima are exact, each truncated to 9 decimals before
    * the per-pair DECIMAL sum, so the score is engine- and
    * partitioning-deterministic. The query token table rides a
    * broadcast (the audited tiny-side nested-loop device); the only
    * data-sized exchange is the per-(query,doc) aggregate. Top-k per
    * query by (score DESC, doc).
    *
    * Output: (qid, rnk, cid, maxsim_score).
    */
  def maxSimTopK(queries: DataFrame, qId: String, docs: DataFrame,
      dId: String, vecCol: String, tokens: Int, subDim: Int,
      k: Int = 10): DataFrame = {
    def toks(df: DataFrame, id: String, outId: String, ti: String,
        tv: String): DataFrame =
      df.select(col(id).as(outId), posexplode(
          transform(sequence(lit(0), lit(tokens - 1)),
            i => slice(col(vecCol), i * subDim + 1, lit(subDim)))))
        .select(col(outId), col("pos").as(ti), col("col").as(tv))
    val qt = toks(queries, qId, "qid", "qi", "qv")
    val dt = toks(docs, dId, "cid", "di", "dv")
    val pairMax = dt.crossJoin(broadcast(qt))
      .select(col("qid"), col("cid"), col("qi"),
        dotF64(col("qv"), col("dv")).as("dp"))
      .groupBy(col("qid"), col("cid"), col("qi"))
      .agg(max(col("dp")).as("mx"))
    val scored = pairMax
      .groupBy(col("qid"), col("cid"))
      .agg(sum(t9(col("mx")).cast(DecimalType(18, 9))).cast("double")
        .as("maxsim_score"))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("maxsim_score").desc, col("cid"))))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cid"), col("maxsim_score"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** 1-bit sign quantization: each embedding becomes ⌈dims/32⌉
    * packed 32-bit sign words (bit j of word w = dim 32w+j+1 > 0 —
    * half-words rather than 64-bit words so the packing is pure
    * non-negative integer sums in any engine). Shortlist by Hamming
    * distance (bit_count of XOR — 32 dims of float compare collapse
    * to one codegen'd integer op per word per pair), then EXACT
    * cosine rerank of the shortlist via [[dotF64]] — the
    * binary-quantization cascade production stores run before
    * full-precision scoring. 32× smaller candidate state than the
    * float vectors; the packed table is what scans at 100 TB. The
    * shortlist window here shuffles all candidates per query —
    * correct for the gate's bounded corpus; at cluster scale swap it
    * for the bounded-heap [[TopK]] aggregator (the q31 device) keyed
    * by (qid, hamming) so per-query state never exceeds `shortlist`.
    *
    * Every vector must have exactly `dims` elements: a mismatched
    * row fails the job loudly (raise_error) instead of silently
    * packing out-of-range dims as 0 bits and corrupting the
    * shortlist.
    *
    * Output: (qid, rnk, cid, hamming, score) — top-k per query by
    * exact cosine over the `shortlist`-deep Hamming shortlist.
    */
  def signHammingTopK(queries: DataFrame, qId: String,
      docs: DataFrame, dId: String, vecCol: String,
      shortlist: Int = 32, k: Int = 10, dims: Int = 64): DataFrame = {
    require(dims >= 1, s"dims must be positive ($dims)")
    val nWords = (dims + 31) / 32
    def packWord(off: Int): Column =
      (off until math.min(off + 32, dims)).map(j =>
        when(element_at(col(vecCol), j + 1) > lit(0f),
          lit(1L << (j - off))).otherwise(lit(0L))).reduce(_ + _)
    def packed(df: DataFrame, id: String, outId: String, pre: String)
        : DataFrame = {
      val words = (0 until nWords).map { w =>
        when(size(col(vecCol)) === lit(dims), packWord(w * 32))
          .otherwise(raise_error(concat(
            lit(s"signHammingTopK: expected $dims dims, got "),
            size(col(vecCol)).cast("string"))))
          .as(pre + "w" + w)
      }
      df.select(col(id).as(outId) +: col(vecCol).as(pre + "vec") +:
        words: _*)
    }
    val q = packed(queries, qId, "qid", "q")
    val d = packed(docs, dId, "cid", "d")
    val ham = d.crossJoin(broadcast(q))
      .withColumn("hamming",
        (0 until nWords).map(w =>
          bit_count(col(s"qw$w").bitwiseXOR(col(s"dw$w"))))
          .reduce(_ + _))
    val short = ham
      .withColumn("hrnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("hamming"), col("cid"))))
      .filter(col("hrnk") <= shortlist)
    val reranked = short
      .withColumn("score",
        dotF64(col("qvec"), col("dvec")) /
          (sqrt(dotF64(col("qvec"), col("qvec"))) *
            sqrt(dotF64(col("dvec"), col("dvec")))))
      .withColumn("rnk", row_number().over(Window.partitionBy("qid")
        .orderBy(col("score").desc, col("cid"))))
      .filter(col("rnk") <= k)
    reranked
      .select(col("qid"), col("rnk"), col("cid"), col("hamming"),
        col("score"))
      .orderBy(col("qid"), col("rnk"))
  }
}
