package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions

/** Hybrid dense+sparse retrieval (SURVEY §2.11 V4/V5 — the reference's
  * experimental Qdrant BM25 + Distribution-Based Score Fusion path,
  * `services/database_qdrant_sparse_testing.py:33-208`).
  *
  * Scale design: BM25 is an inverted-index join shuffling on the term
  * (never a cross product); corpus statistics (N, avgdl) ride along as
  * a broadcast scalar; DBSF fusion joins the two bounded prefetch sets
  * (dense limit 50 / sparse limit 100 per query, as in the reference)
  * so the fusion cost is per-query-constant regardless of corpus size.
  */
object Hybrid {

  /** Per-(doc, term) term frequencies over whitespace tokens. */
  def termFrequencies(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** V4: BM25 (k1=1.2, b=0.75) scores of every query against the
    * corpus via an inverted-index join on the term. Queries are
    * (qid, text); result (qid, doc, score) for docs sharing ≥1 term.
    *
    * Determinism: the idf is truncated at 9 decimals
    * (`floor(ln·1e9)/1e9`) so a last-ulp difference between libm
    * implementations cannot leak into the score, and the per-doc
    * term-weight sum folds in term order (sorted collect) instead of
    * a shuffle-order `sum` — bit-reproducible and equal to the DuckDB
    * oracle's `list_reduce(list(w ORDER BY term))`. */
  def bm25(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Terms(corpus, idCol, textCol,
      queries.select(col(qidCol).as("qid"),
        explode(array_distinct(TextFunctions.tokens(col(qtextCol))))
          .as("term")), k1, b)

  /** [[bm25]] over an EXPLICIT distinct (qid, term) frame instead of
    * a query-text column — the entry point for callers that
    * construct or rewrite the query term set themselves (pseudo-
    * relevance feedback, query rewriting). Same corpus-side shapes
    * and scoring tail, bit-identical scores. */
  def bm25Terms(corpus: DataFrame, idCol: String, textCol: String,
      qterms: DataFrame, k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    bm25FromTf(corpus.select(col(idCol).as("doc")),
      termFrequencies(corpus, idCol, textCol), qterms, k1, b)

  /** [[bm25Terms]] over a PRECOMPUTED (doc, term, tf) frame plus the
    * corpus doc-id frame — the entry point for callers that reuse
    * ONE tokenized corpus across several BM25 passes
    * ([[prfExpandedBm25]] runs two; re-deriving tf per pass would
    * re-scan and re-tokenize the full text each time, the r11
    * advisory). `ids` must carry one `doc` row per corpus document
    * INCLUDING null-text ones, `tf` exactly [[termFrequencies]] of
    * the same corpus — both are the caller's to checkpoint. */
  private[operators] def bm25FromTf(ids: DataFrame, tf: DataFrame,
      qterms: DataFrame, k1: Double, b: Double): DataFrame = {
    // Tokenize the corpus text ONCE: doc length, corpus stats, and
    // document frequency all derive from the tf frame, whose groupBy
    // exchange AQE materializes once and reuses across the three
    // consumers — where independent tokenCount() branches would each
    // re-scan and re-tokenize the full text (2 extra passes over the
    // corpus at 100 TB). dl = Σ tf is integer-identical to
    // size(split(text)) (split never yields an empty array), and the
    // groupBy(doc) partial-aggregates (doc, tf) pairs map-side, so
    // the extra shuffle carries no term strings. Null-text docs have
    // no tf rows; the left join from corpus ids keeps them as null
    // dl — exactly tokenCount's null — so n_docs and avgdl keep
    // whole-corpus semantics.
    val (docLen, stats, dfreq) = corpusTables(ids, tf)
    bm25FromStats(tf, docLen, stats, dfreq, qterms, k1, b)
  }

  /** The corpus-stats aggregate over a (possibly checkpointed)
    * docLen frame — split out so [[prfExpandedBm25]] can derive
    * stats from the CHECKPOINTED docLen instead of re-running the
    * ids⋈tf aggregation a second time (r12.2 review), while staying
    * the one builder both paths share. */
  private def statsOf(docLen: DataFrame): DataFrame =
    docLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))

  /** The three corpus-side tables every BM25 pass reads — ONE
    * definition, so the single-pass path and [[prfExpandedBm25]]'s
    * shared-checkpoint path cannot drift (the scores' bit-identity
    * contract hangs on these aggregations staying identical;
    * r12 review). */
  private def corpusTables(ids: DataFrame,
      tf: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val docLen = ids
      .join(tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl")),
        Seq("doc"), "left")
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    (docLen, statsOf(docLen), dfreq)
  }

  /** The scoring join over fully PRECOMPUTED corpus-side tables —
    * the innermost entry point, for callers running SEVERAL term
    * sets against one corpus ([[prfExpandedBm25]]'s two passes):
    * docLen/stats/dfreq are identical across passes, so deriving
    * them per pass would re-aggregate the full tf frame each time. */
  private[operators] def bm25FromStats(tf: DataFrame,
      docLen: DataFrame, stats: DataFrame, dfreq: DataFrame,
      qterms: DataFrame, k1: Double, b: Double): DataFrame =
    scoreBm25(qterms
      .join(tf, Seq("term"))
      .join(dfreq, Seq("term"))
      .join(docLen, Seq("doc"))
      .crossJoin(broadcast(stats)), k1, b)

  /** RM3-style pseudo-relevance feedback (Lavrenko & Croft relevance
    * models, the Anserini/Lucene RM3 default shape simplified to a
    * deterministic tf·idf expansion): run BM25 once, take the top
    * `fbDocs` feedback documents per query, score every term they
    * contain by Σ_d tf(t,d) · ⌊idf(t)·1e9⌋ (a PURE INTEGER weight —
    * order-independent, so the partial aggregation is exact and the
    * oracle replays it without float-fold pinning), drop terms
    * already in the query, keep the top `fbTerms` per query, and
    * re-run BM25 with the expanded term set. Recall widens to
    * documents sharing no literal query term — the vocabulary-
    * mismatch fix on the sparse path (the dense path's analog is the
    * embedding itself).
    *
    * Scale shape: both passes are the inverted-index join of [[bm25]]
    * (never a cross product); the feedback set is `fbDocs` rows per
    * query, so the expansion aggregation touches only feedback-doc
    * postings; the term exclusion is a left-anti join on the (small,
    * broadcast-able) query term frame. */
  def prfExpandedBm25(corpus: DataFrame, idCol: String,
      textCol: String, queries: DataFrame, qidCol: String,
      qtextCol: String, fbDocs: Int, fbTerms: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val qt = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(TextFunctions.tokens(col(qtextCol))))
        .as("term"))
    // tokenize the corpus ONCE for all of: the two BM25 passes, the
    // expansion weights, and the df table (r11 advisory — the former
    // shape re-derived tf per consumer, re-scanning and re-tokenizing
    // the full text twice more; the marginRank localCheckpoint
    // discipline, Agreement.scala)
    val tf = termFrequencies(corpus, idCol, textCol).localCheckpoint()
    val ids = corpus.select(col(idCol).as("doc")).localCheckpoint()
    // ... and aggregate the corpus-side tables ONCE for both BM25
    // passes + the expansion weights: docLen/stats/dfreq come from
    // the SAME builder the single-pass path uses (corpusTables —
    // bit-identity by construction), checkpointed here because this
    // path has multiple consumers per table (doc-count- and
    // vocabulary-sized frames, far smaller than tf)
    val (docLen0, _, dfreq0) = corpusTables(ids, tf)
    val docLen = docLen0.localCheckpoint()
    // stats derives from the CHECKPOINTED docLen (same statsOf
    // builder — bit-identity by construction); aggregating the lazy
    // docLen0 would re-run the ids⋈tf pass a second time
    val stats = statsOf(docLen).localCheckpoint()
    val dfreq = dfreq0.localCheckpoint()
    val fb = prefetch(
        bm25FromStats(tf, docLen, stats, dfreq, qt, k1, b), fbDocs)
      .select(col("qid"), col("doc"))
    val nDocs = stats.select(col("n_docs"))
    val expansion = fb.join(tf, Seq("doc"))
      .groupBy(col("qid"), col("term"))
      .agg(sum(col("tf")).as("fbtf"))
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("wgt",
        col("fbtf") * floor(log(lit(1.0)
          + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          * 1e9).cast("long"))
      .join(qt, Seq("qid", "term"), "left_anti")
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(desc("wgt"), col("term"))))
      .filter(col("_r") <= fbTerms)
      .select(col("qid"), col("term"))
    // disjoint by the anti-join, both sides distinct ⇒ the union is
    // already a distinct (qid, term) set
    bm25FromStats(tf, docLen, stats, dfreq,
      qt.unionByName(expansion), k1, b)
  }

  /** The BM25 scoring tail over a joined candidate frame carrying
    * (qid, doc, term, tf, df, dl, n_docs, avgdl) — shared verbatim by
    * the per-call path above and [[TextIndex.bm25]] (persisted
    * index), so both produce bit-identical scores. */
  private[operators] def scoreBm25(joined: DataFrame, k1: Double,
      b: Double): DataFrame =
    joined
      .withColumn("idf",
        floor(log(lit(1.0) + (col("n_docs") - col("df") + 0.5)
          / (col("df") + 0.5)) * 1e9).cast("double") / 1e9)
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1))
          / (col("tf") + lit(k1) * (lit(1 - b)
            + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("qid"), col("doc"))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("term"), col("w")))),
          x => x.getField("w")),
        lit(0.0), (acc, x) => acc + x).as("score"))

  /** Per-query top-`limit` prefetch of a (qid, doc, score) frame. */
  def prefetch(scored: DataFrame, limit: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("score"), col("doc"))
    scored.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= limit).drop("_r")
  }

  /** V5: Distribution-Based Score Fusion — per query and branch,
    * scores normalize against the branch's score distribution
    * (mean ± 3σ window), then the two branches sum; missing docs
    * contribute 0. Returns the fused top-`k` per query.
    *
    * The branch mean and population stddev fold over the scores in
    * doc-id order (sorted collect) rather than window aggregates, so
    * the doubles accumulate in a fixed order — bit-reproducible and
    * mirrored by the oracle's `list_reduce(list(x ORDER BY doc))`. */
  def dbsfFuse(dense: DataFrame, sparse: DataFrame, k: Int): DataFrame = {
    def normalize(dfr: DataFrame, out: String): DataFrame = {
      val scores = transform(
        array_sort(collect_list(struct(col("doc"), col("score")))),
        x => x.getField("score"))
      val stats = dfr.groupBy(col("qid"))
        .agg(scores.as("_ss"))
        .withColumn("_n", size(col("_ss")))
        .withColumn("_mu",
          aggregate(col("_ss"), lit(0.0), (a, x) => a + x) / col("_n"))
        .withColumn("_sd", sqrt(
          aggregate(col("_ss"), lit(0.0),
            (a, x) => a + (x - col("_mu")) * (x - col("_mu")))
            / col("_n")))
        .select(col("qid"), col("_mu"), col("_sd"))
      dfr.join(stats, Seq("qid"))
        .withColumn(out,
          when(col("_sd") > 0,
            (col("score") - (col("_mu") - lit(3.0) * col("_sd")))
              / (lit(6.0) * col("_sd")))
            .otherwise(lit(0.5)))
        .select(col("qid"), col("doc"), col(out))
    }
    val d = normalize(dense, "z_dense")
    val s = normalize(sparse, "z_sparse")
    val fused = d.join(s, Seq("qid", "doc"), "full_outer")
      .withColumn("fused_score",
        coalesce(col("z_dense"), lit(0.0))
          + coalesce(col("z_sparse"), lit(0.0)))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("fused_score"), col("doc"))
    fused.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("doc"), col("fused_score"), col("rnk"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) —
    * the rank-only fusion alternative to [[dbsfFuse]]: each branch
    * contributes 1/(k0 + rank) and docs absent from a branch
    * contribute nothing. Qdrant ships exactly this pair of fusion
    * modes (RRF | DBSF) for the reference's hybrid prefetch shape, so
    * the engine carries both.
    *
    * Determinism: ranks are branch-local row_numbers with the
    * engine-wide (score DESC, doc) tie-break, and the fused score is
    * a TWO-term IEEE sum in fixed branch order (dense + sparse) — no
    * distribution statistics, no variable-length folds, so the
    * operator is value-exact with no ordering tricks at all.
    *
    * Scale: identical shape to [[dbsfFuse]] — a full-outer join of
    * two bounded per-query prefetch sets; the rank windows run over
    * those bounded sets (≤ prefetch-limit rows per query), never over
    * the corpus. */
  def rrfFuse(dense: DataFrame, sparse: DataFrame, k: Int,
      k0: Int = 60): DataFrame = {
    def ranked(dfr: DataFrame, out: String): DataFrame =
      dfr.withColumn(out, row_number().over(
          Window.partitionBy(col("qid"))
            .orderBy(desc("score"), col("doc"))))
        .select(col("qid"), col("doc"), col(out))
    val fused = ranked(dense, "_rd")
      .join(ranked(sparse, "_rs"), Seq("qid", "doc"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (col("_rd") + lit(k0)), lit(0.0))
          + coalesce(lit(1.0) / (col("_rs") + lit(k0)), lit(0.0)))
    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("rrf_score"), col("doc"))
    fused.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("doc"), col("rrf_score"), col("rnk"))
  }

  /** T2/V5 end-to-end hybrid search with the reference's prefetch
    * limits (dense 50, sparse 100, `database_qdrant_sparse_testing
    * .py:33-42`): dense cosine + sparse BM25 → DBSF → top-k. */
  def hybridSearch(index: DataFrame, idCol: String, textCol: String,
      vecCol: String, queries: DataFrame, qidCol: String,
      qtextCol: String, qvecCol: String, k: Int,
      denseLimit: Int = 50, sparseLimit: Int = 100): DataFrame = {
    val (dense, sparse) = hybridBranches(index, idCol, textCol, vecCol,
      queries, qidCol, qtextCol, qvecCol, denseLimit, sparseLimit)
    dbsfFuse(dense, sparse, k)
  }

  /** [[hybridSearch]] with reciprocal-rank fusion ([[rrfFuse]]) in
    * place of DBSF — same branches, rank-only combination. */
  def hybridSearchRrf(index: DataFrame, idCol: String, textCol: String,
      vecCol: String, queries: DataFrame, qidCol: String,
      qtextCol: String, qvecCol: String, k: Int,
      denseLimit: Int = 50, sparseLimit: Int = 100,
      k0: Int = 60): DataFrame = {
    val (dense, sparse) = hybridBranches(index, idCol, textCol, vecCol,
      queries, qidCol, qtextCol, qvecCol, denseLimit, sparseLimit)
    rrfFuse(dense, sparse, k, k0)
  }

  /** The shared prefetch branches of the hybrid searches: bounded
    * dense cosine top-`denseLimit` and BM25 top-`sparseLimit` per
    * query, both as (qid, doc, score). */
  private def hybridBranches(index: DataFrame, idCol: String,
      textCol: String, vecCol: String, queries: DataFrame,
      qidCol: String, qtextCol: String, qvecCol: String,
      denseLimit: Int, sparseLimit: Int): (DataFrame, DataFrame) = {
    val dense = SimilaritySearch.bruteForceTopKHeap(
      queries.select(col(qidCol), col(qvecCol).as(vecCol)), qidCol,
      index.select(col(idCol), col(vecCol)), idCol, vecCol, denseLimit)
      .select(col("qid"), col("cid").as("doc"), col("score"))
    val sparse = prefetch(
      bm25(index, idCol, textCol, queries, qidCol, qtextCol),
      sparseLimit)
    (dense, sparse)
  }

  /** [[hybridSearch]] with the sparse leg served from a PERSISTED
    * [[TextIndex]] (index-once / query-many — the steady-state
    * deployment shape; the per-call form re-tokenizes the corpus on
    * every query batch). Scores are bit-identical to the per-call
    * form: TextIndexSpec pins the BM25 legs equal and the dense/DBSF
    * legs are shared code — which is how q115 reuses q37's oracle
    * verbatim. */
  def hybridSearchIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, denseIndex: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, qidCol: String,
      qtextCol: String, qvecCol: String, k: Int,
      denseLimit: Int = 50, sparseLimit: Int = 100): DataFrame = {
    val dense = SimilaritySearch.bruteForceTopKHeap(
      queries.select(col(qidCol), col(qvecCol).as(vecCol)), qidCol,
      denseIndex.select(col(idCol), col(vecCol)), idCol, vecCol,
      denseLimit)
      .select(col("qid"), col("cid").as("doc"), col("score"))
    val sparse = prefetch(
      TextIndex.bm25(spark, table, queries, qidCol, qtextCol),
      sparseLimit)
    dbsfFuse(dense, sparse, k)
  }

  /** Exact PHRASE search — contiguous-token match via positional
    * anchor intersection (the positional-postings algorithm every
    * text search engine runs, expressed relationally): token i of the
    * phrase found at position p votes for anchor p−i; an anchor with
    * all |phrase| distinct votes is a match. Repeated words in the
    * phrase are handled naturally (each phrase slot votes
    * independently), overlapping matches are counted — the places a
    * substring/replace formulation goes wrong.
    *
    * Shape: one token posexplode, a broadcast join against the
    * |phrase|-row slot frame (filters the stream to phrase terms
    * BEFORE any exchange), one (doc, anchor) aggregate, one per-doc
    * aggregate. The index-once variant stores (term, doc, pos)
    * postings bucketed by term (the [[TextIndex]] layout plus a
    * positions column) and starts from the postings scan instead of
    * the corpus scan; the anchor-intersection tail is identical. */
  def phraseMatches(corpus: DataFrame, idCol: String, textCol: String,
      phrase: String): DataFrame = {
    val words = phraseWords(phrase)
    val spark = corpus.sparkSession
    import spark.implicits._
    val slots = words.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("i", "w")
    val votes = corpus
      .select(col(idCol), posexplode(
        graft.functions.TextFunctions.tokens(col(textCol)))
        .as(Seq("pos", "w")))
      .join(broadcast(slots), "w")
      .select(col(idCol),
        col("i"), (col("pos") - col("i")).cast("long").as("anchor"))
    phraseTail(votes, idCol, words.length)
  }

  /** Phrase → non-empty token slots. `"".split` returns Array("") —
    * without the filter a blank phrase would "match" the empty tokens
    * consecutive separators produce. */
  private[operators] def phraseWords(phrase: String): Seq[String] = {
    val words = Option(phrase).getOrElse("")
      .trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(words.nonEmpty, "empty phrase")
    words
  }

  /** Shared anchor-intersection tail of [[phraseMatches]] and
    * [[TextIndex.phraseQuery]]: `votes` = (idCol, i, anchor). */
  private[operators] def phraseTail(votes: DataFrame, idCol: String,
      nSlots: Int): DataFrame =
    votes
      .groupBy(col(idCol), col("anchor"))
      .agg(countDistinct(col("i")).as("hit"))
      .filter(col("hit") === nSlots)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col("anchor")).as("first_pos"))
}
