package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Tables._
import graft.functions.VectorFunctions._
import graft.operators.{ProductQuantization, SimilaritySearch}

/** Vector / retrieval surface over the `embeddings` table (SURVEY
  * §2.11: cosine top-k V3/T1 is the reference's core query operator;
  * plus the ANN + centroid extensions from the builder brief).
  *
  * Parity note: every kernel folds left-to-right in double precision,
  * matching DuckDB's sequential `list_dot_product` bit-for-bit, so
  * scores and rank order hash-match without rounding.
  */
object VectorQueries {

  /** Brute-force cosine top-5 for the first 10 vectors as queries
    * (self excluded) — the V3/T1 retrieval path, registered through
    * the bounded-heap formulation (k rows per partition per query in
    * the shuffle; the ranked-window form stays as the TopKSpec
    * cross-check and the DuckDB oracle below). */
  def q31KnnBruteForce(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    SimilaritySearch.bruteForceTopKHeap(
      emb.filter(col("vec_id") < 10), "vec_id",
      emb, "vec_id", "embedding", k = 6)
      .filter(col("qid") =!= col("cid"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** MMR diversification ([[SimilaritySearch.mmrDiversify]], λ=0.5)
    * of a 20-candidate brute-force shortlist for the first 5 vectors:
    * 5 greedy selections per query, relevance traded against maximum
    * similarity to what is already selected. The oracle replays the
    * greedy loop as 5 chained SQL stages over the same shortlist and
    * pairwise-cosine frames — selection order, scores and mmr scores
    * all value-exact. */
  def q155MmrDiversify(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val shortlist = SimilaritySearch.bruteForceTopKHeap(
        emb.filter(col("vec_id") < 5), "vec_id",
        emb, "vec_id", "embedding", k = 21)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("score"))
    SimilaritySearch.mmrDiversify(shortlist, emb, "vec_id",
        "embedding", k = 5, lambda = 0.5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Per-label centroid components — the coarse-quantizer build for
    * IVF ANN. Mean per dimension via the exact decimal-sum mean
    * (q95 technique): per-element cast to DECIMAL(18,9), exact sum,
    * final cast to double. Order-independent, so it partial-
    * aggregates (map-side combine, bounded per-group state) AND is
    * bit-identical to the oracle's
    * `CAST(SUM(CAST(e AS DECIMAL(18,9))) AS DOUBLE)/COUNT(*)`. */
  def q32LabelCentroids(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast(
          org.apache.spark.sql.types.DecimalType(18, 9)))
        .cast("double") / count(lit(1))).as("centroid_val"))
      .orderBy(col("label"), col("pos"))

  /** L2 norms of every embedding (V-family norm check — the reference
    * stores pre-normalized vectors; this is the audit query). */
  def q33VectorNorms(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), l2Norm(col("embedding")).as("l2_norm"))
      .orderBy(col("vec_id"))

  /** Top-100 most-similar embedding pairs (embedding near-dup surface;
    * threshold 0.3 keeps the pair set small before ranking). */
  def q34CosineTopPairs(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.cosinePairsAbove(
      embeddings(s, d), "vec_id", "embedding", threshold = 0.3)
      .orderBy(desc("score"), col("id_a"), col("id_b"))
      .limit(100)

  /** IVF-style ANN: label-centroid coarse quantizer, nProbe=2 cells
    * searched per query — the pruned-scan path whose recall the
    * brute-force q31 oracles (rows-only: recall < 1 by construction). */
  def q43AnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cents = SimilaritySearch.labelCentroids(emb, "label", "embedding")
    SimilaritySearch.ivfTopK(
      emb.filter(col("vec_id") < 10), "vec_id",
      emb, "vec_id", "embedding", cents, k = 6, nProbe = 2)
      .filter(col("qid") =!= col("cid"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Cluster-balanced (semantic) data mixing: nearest-centroid
    * assignment over the embedding space ([[SimilaritySearch
    * .assignCells]] — a map-only pass at corpus scale) feeding the
    * α=0.5 temperature resampler ([[graft.operators.Split
    * .temperatureSample]]) keyed on the ASSIGNED cluster, so
    * over-represented semantic regions are downweighted toward a
    * target budget — the cluster-then-balance step of
    * SemDeDup/DoReMi-era data curation, composed from two
    * already-verified operators and value-checked end-to-end (the
    * oracle replays centroids, assignment, rates, and the md5 keep
    * bucket). */
  def q142ClusterBalanced(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cents = SimilaritySearch.labelCentroids(emb, "label",
      "embedding")
    val assigned = SimilaritySearch.assignCells(emb, "vec_id",
        "embedding", cents)
      .select(col("vec_id"), col("cell_id"))
    graft.operators.Split.temperatureSample(assigned, "vec_id",
        "cell_id", targetTotal = 30)
      .select(col("vec_id"), col("cell_id"), col("keep_threshold"))
      .orderBy(col("vec_id"))
  }

  /** ANN tuning sweep: recall@10 of IVF against the brute-force
    * truth at nProbe ∈ {1, 2, 4} — the probe-budget/recall trade
    * curve read before fixing nProbe for a corpus (the report every
    * IVF deployment publishes). Truth and candidates both exclude
    * self and re-rank to a clean top-10; hits are exact integer
    * counts, the mean recall one final division — value-exact. */
  def q147AnnRecallSweep(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val qs = emb.filter(col("vec_id") < 10)
    val cents = SimilaritySearch.labelCentroids(emb, "label",
      "embedding")
    def top10(df: DataFrame): DataFrame = df
      .filter(col("qid") =!= col("cid"))
      .withColumn("r2", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rnk"))))
      .filter(col("r2") <= 10).select(col("qid"), col("cid"))
    val truth = top10(SimilaritySearch.bruteForceTopK(
      qs, "vec_id", emb, "vec_id", "embedding", k = 11))
    // denominator derived from the truth set itself, not assumed
    // |queries|·k — short cells or a different query universe would
    // silently skew a hard-coded constant
    val truthN = truth.agg(count(lit(1)).as("n_truth"))
    Seq(1, 2, 4).map { np =>
      top10(SimilaritySearch.ivfTopK(qs, "vec_id", emb, "vec_id",
          "embedding", cents, k = 11, nProbe = np))
        .join(truth, Seq("qid", "cid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(np).as("n_probe"), col("hits"))
    }.reduce(_ unionByName _)
      .crossJoin(truthN)
      .select(col("n_probe"), col("hits"),
        (col("hits").cast("double") / col("n_truth").cast("double"))
          .as("mean_recall"))
      .orderBy(col("n_probe"))
  }

  /** Matryoshka-representation retrieval eval: recall@10 of cosine
    * top-10 computed on PREFIX truncations of the embedding (dims ∈
    * {8, 16, 32} of 64) against the full-dimension truth — the
    * quality/cost curve read before serving truncated MRL vectors
    * (Kusupati et al. 2022). Truncation is a zero-cost `slice` in
    * the scan projection (at serving scale the short vectors are
    * what's stored — 8× less IO); the sweep reuses the audited
    * bounded-heap top-k on each truncated space. Exact integer hits,
    * one final division — value-exact vs the oracle's replay. */
  def q159MatryoshkaRecall(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val qs = emb.filter(col("vec_id") < 10)
    def top10(df: DataFrame): DataFrame = df
      .filter(col("qid") =!= col("cid"))
      .withColumn("r2", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rnk"))))
      .filter(col("r2") <= 10).select(col("qid"), col("cid"))
    val truth = top10(SimilaritySearch.bruteForceTopKHeap(
      qs, "vec_id", emb, "vec_id", "embedding", k = 11))
    val truthN = truth.agg(count(lit(1)).as("n_truth"))
    Seq(8, 16, 32).map { dims =>
      def trunc(df: DataFrame) = df.withColumn("embedding",
        slice(col("embedding"), 1, dims))
      top10(SimilaritySearch.bruteForceTopKHeap(trunc(qs), "vec_id",
          trunc(emb), "vec_id", "embedding", k = 11))
        .join(truth, Seq("qid", "cid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(dims).as("dims"), col("hits"))
    }.reduce(_ unionByName _)
      .crossJoin(truthN)
      .select(col("dims"), col("hits"),
        (col("hits").cast("double") / col("n_truth").cast("double"))
          .as("mean_recall"))
      .orderBy(col("dims"))
  }

  /** Embedding near-dup mining via banded hyperplane-LSH (the
    * bucketed candidate-join + exact-verify scale path,
    * [[SimilaritySearch.cosineNearDupsBanded]]). The corpus is the
    * embeddings table plus a deterministic near-duplicate twin of
    * every vector (first component +0.02 — cosine ≈ 0.9998, far above
    * any organic pair, which top out ≈ 0.6), so the query must
    * recover exactly the planted pairs. Oracle = the exhaustive
    * cosine ≥ 0.999 scan over the same derived corpus: at that
    * threshold a missed pair needs signature Hamming ≥ 10 against
    * E[hamming] ≈ 1.2 — recall 1 with ~1e-7 slack per pair. */
  def q58EmbeddingNearDups(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val twins = emb.select((col("vec_id") + 1000000).as("vec_id"),
      concat(array(element_at(col("embedding"), 1) + lit(0.02)),
        slice(col("embedding"), lit(2), size(col("embedding")) - 1))
        .as("embedding"))
    // 256-bit signatures in 16-bit bands: twin pairs sit at
    // E[hamming] ≈ 3.6 against the bands−1 = 15 pigeonhole guarantee
    // (miss ~1e-11 even for boundary pairs), and 16-bit bands admit
    // ~2^-16 of random pairs per band — the candidate set stays
    // effectively linear where 8-bit bands let ~3% of all pairs
    // through (ScaleBench: the 8-bit config LOST to the tiled
    // exhaustive scan at every measured corpus size).
    SimilaritySearch.cosineNearDupsBanded(emb.unionByName(twins),
      "vec_id", "embedding", threshold = 0.999, bits = 256, bands = 16,
      center = true)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Symmetric int8 quantization of the embedding column — the
    * storage-compression step of an embedding pipeline (4× smaller
    * vectors; brute-force scans read a quarter of the bytes).
    * Per-vector scale = max|x|/127; every arithmetic step is a
    * deterministic elementwise double op (round-half-away matches
    * DuckDB), so the whole transform is value-checked: quantized
    * checksum (exact integer sum) + max reconstruction error. */
  def q68EmbeddingQuant(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id"),
      col("embedding").cast("array<double>").as("e"))
    emb
      .withColumn("scale",
        aggregate(col("e"), lit(0.0), (a, x) => greatest(a, abs(x)))
          / 127.0)
      .withColumn("q_checksum",
        when(col("scale") === 0.0, lit(0L)).otherwise(
          aggregate(transform(col("e"),
            x => round(x / col("scale")).cast("long")),
            lit(0L), (a, x) => a + x)))
      .withColumn("max_err",
        when(col("scale") === 0.0, lit(0.0)).otherwise(
          array_max(transform(col("e"),
            x => abs(x - round(x / col("scale")) * col("scale"))))))
      .select(col("vec_id"), col("scale"), col("q_checksum"),
        col("max_err"))
      .orderBy(col("vec_id"))
  }

  /** Product-quantization ANN ([[graft.operators.ProductQuantization]]):
    * per-label codebooks over m=8 subspaces, corpus encoded to 8
    * codes, ADC top-5 per query in the compressed domain. Like q43,
    * the RECALL is approximate (q31 is the exact oracle of record)
    * but every arithmetic step is deterministic relational algebra,
    * so the OUTPUT is value-exact against DuckDB recomputing the
    * same codebooks, assignments, and table-lookup sums. */
  def q72AnnPq(s: SparkSession, d: String): DataFrame = {
    import graft.operators.ProductQuantization
    val emb = embeddings(s, d)
    val m = 8
    // localCheckpoint (eager): the codebook aggregation runs ONCE and
    // its ~m·K tiny rows are served from block storage to all three
    // consumers (kCodes lookup, encode join, ADC broadcast) — without
    // it the whole training aggregation re-executes per consumer.
    val cb = ProductQuantization.codebooks(emb, "label", "embedding", m)
      .localCheckpoint()
    val kCodes = cb.agg(max(col("code"))).head.getInt(0) + 1
    val enc = ProductQuantization.encode(emb, "vec_id", "embedding", cb, m)
    ProductQuantization.adcTopK(
      emb.filter(col("vec_id") < 10), "vec_id",
      enc, cb, "embedding", m, kCodes, k = 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Compressed-retrieval ANN, value-checked end-to-end: the int8-
    * quantized scan builds a 10k shortlist (¼ scan bytes, integer
    * [[graft.functions.DotI8]] kernel), then ONLY shortlist rows
    * re-join their floats for the exact cosine re-rank — the
    * production shape behind `Rag.retrieveCompressed`, here over the
    * embeddings table where the quantize → shortlist → re-rank chain
    * is ANSI-SQL-expressible. The oracle mirrors `Math.round` as
    * floor(x/scale + 0.5) (the UDF's rounding, which differs from SQL
    * round() at exact negative halves). */
  def q89CompressedKnn(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
    val shortlist = SimilaritySearch.quantizedTopK(
      queries, "vec_id", emb, "vec_id", "embedding", k = 60)
    ProductQuantization.exactRerank(shortlist, queries, "vec_id",
      emb, "vec_id", "embedding", k = 6)
      .orderBy(col("qid"), col("rnk"))
  }

  /** SemDeDup (Abbas et al. 2023): within-cluster semantic dedup —
    * a row is dropped when a lower-id row in the same cluster has
    * cosine ≥ 0.3 with it. Clusters here are the embeddings' label
    * column (any upstream clustering slots in — the operator is
    * cluster-source-agnostic); the oracle replays the within-cell
    * pair scan exactly. */
  def q103SemDedup(s: SparkSession, d: String): DataFrame =
    SimilaritySearch.semDedup(
      embeddings(s, d), "vec_id", "embedding", "label", threshold = 0.3)

  /** Metadata-filtered retrieval (Qdrant filtered-search semantics,
    * `services/database.py:271-272`): top-5 among label ≥ 5 vectors
    * only — PRE-filter, so every query still gets k results from the
    * matching subset; the predicate reaches the parquet scan
    * (PlanSpec2-pinned). */
  def q112FilteredKnn(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    SimilaritySearch.filteredTopK(
      emb.filter(col("vec_id") < 10), "vec_id",
      emb, "vec_id", "embedding",
      predicate = col("label") >= 5, k = 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Hard-negative mining (DPR/E5 contrastive-training data): per
    * query, top-5 most-similar vectors EXCLUDING its positives (here:
    * same-label vectors with id < 100 — a stand-in relevance list).
    * The exclusion runs before the bounded heap, never as a shuffled
    * anti-join of the scored stream. */
  def q113HardNegatives(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val q = emb.filter(col("vec_id") < 10)
    val pos = q.select(col("vec_id").as("qid"), col("label").as("ql"))
      .join(emb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("cid"), col("label")),
        col("label") === col("ql"))
      .select(col("qid"), col("cid"))
    SimilaritySearch.hardNegatives(q, "vec_id", pos, "qid", "cid",
      emb, "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Johnson–Lindenstrauss ±1 random projection of every embedding
    * (64 → 16 dims), tall form — value-checks the engine-portable
    * sign derivation and the sequential-fold dot product against the
    * oracle's `list_dot_product` to the last bit. The search use of
    * the projected space (shortlist + exact rerank) is
    * [[graft.operators.Projection.projectedTopK]], recall-pinned in
    * ProjectionSpec. */
  def q119RandomProjection(s: SparkSession, d: String): DataFrame =
    graft.operators.Projection
      .project(embeddings(s, d), "embedding", 64, 16)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "v")))
      .orderBy(col("vec_id"), col("j"))

  /** Retrieval-evaluation metrics ([[graft.operators.Eval]]): exact
    * cosine top-10 (self excluded) scored against the same-label
    * truth set — per-query recall@10, precision@10, MRR, NDCG@10.
    * The NDCG log-gains are scaled to integers before summation
    * (exact long sums, no float accumulation), so the oracle is
    * value-exact, not approximately-equal. */
  def q124RetrievalMetrics(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
    val ranked = SimilaritySearch.bruteForceTopKHeap(
        queries, "vec_id", emb, "vec_id", "embedding", k = 11)
      .filter(col("qid") =!= col("cid"))
      .drop("rnk")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(desc("score"), col("cid"))))
      .filter(col("rnk") <= 10)
    val truth = queries.select(col("vec_id").as("qid"), col("label"))
      .join(emb.select(col("vec_id").as("cid"), col("label")), "label")
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid")
    graft.operators.Eval.retrievalMetrics(ranked, truth, k = 10)
      .orderBy(col("qid"))
  }

  /** q211: NN-descent k-NN graph ([[graft.operators.NnDescent]]) —
    * hash-derived init + 2 neighbor-of-neighbor refinement rounds,
    * k=6; the oracle replays the init permutation, both candidate
    * closures, every cosine and every tie-broken rank. */
  def q211NnDescent(s: SparkSession, d: String): DataFrame =
    graft.operators.NnDescent.knnGraph(embeddings(s, d), "vec_id",
        "embedding", k = 6, iters = 2)
      .orderBy(col("u"), col("rnk"))

  /** Score + per-node top-k rank of the (u, v) edge CTE `src`. */
  private def nnScore(src: String, out: String,
      k: Int = 6): String =
    s"""$out AS MATERIALIZED (
       |  SELECT u, v, score, rnk FROM (
       |    SELECT s.u, s.v, s.score,
       |      ROW_NUMBER() OVER (PARTITION BY s.u
       |        ORDER BY s.score DESC, s.v) AS rnk
       |    FROM (
       |      SELECT c.u, c.v,
       |        list_dot_product(a.e, b.e) /
       |          (sqrt(list_dot_product(a.e, a.e)) *
       |           sqrt(list_dot_product(b.e, b.e))) AS score
       |      FROM $src c
       |      JOIN vv a ON a.id = c.u
       |      JOIN vv b ON b.id = c.v) s)
       |  WHERE rnk <= $k)""".stripMargin

  /** One NN-descent round: undirected closure of `prev`, one
    * neighbor-of-neighbor self-join, rescore, top-k. */
  private def nnRound(prev: String, sfx: String,
      k: Int = 6): String =
    s"""und$sfx AS MATERIALIZED (
       |  SELECT u, v FROM $prev
       |  UNION
       |  SELECT v AS u, u AS v FROM $prev),
       |cd$sfx AS MATERIALIZED (
       |  SELECT a.u, b.v FROM und$sfx a
       |  JOIN und$sfx b ON a.v = b.u WHERE a.u <> b.v
       |  UNION
       |  SELECT u, v FROM $prev),
       |${nnScore(s"cd$sfx", s"g$sfx", k)}""".stripMargin

  private val q211Oracle: String =
    s"""WITH vv AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings),
       |nn AS (SELECT COUNT(*) AS n FROM vv),
       |idx AS (
       |  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS i
       |  FROM vv),
       |ie AS (
       |  SELECT x.id AS u, y.id AS v
       |  FROM idx x
       |  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS j) j
       |  CROSS JOIN nn
       |  JOIN idx y ON y.i = (x.i + 1 +
       |    ('0x' || substr(md5('nn:' || x.id || ':' || j.j), 1, 8))
       |      ::UBIGINT::BIGINT % (n - 1)) % n
       |  GROUP BY 1, 2),
       |${nnScore("ie", "g0")},
       |${nnRound("g0", "1")},
       |${nnRound("g1", "2")}
       |SELECT u, v, score, CAST(rnk AS BIGINT) AS rnk FROM g2
       |ORDER BY u, rnk""".stripMargin

  /** q220: semantic decontamination
    * ([[SimilaritySearch.semanticDecontaminate]]) — nearest
    * eval-set embedding (vec_id < 20 as the held-out set) per
    * corpus embedding, contamination flag at 0.4 (the synthetic
    * corpus's upper similarity range); eval side broadcast, corpus
    * never shuffles. */
  def q220SemanticDecon(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    SimilaritySearch.semanticDecontaminate(
      emb.filter(col("vec_id") >= 20), "vec_id",
      emb.filter(col("vec_id") < 20), "vec_id", "embedding",
      threshold = 0.4)
  }

  private val q220Oracle: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings),
      |pairs AS (
      |  SELECT c.vec_id AS cid, t.vec_id AS eid,
      |    list_dot_product(c.e, t.e) /
      |      (sqrt(list_dot_product(c.e, c.e)) *
      |       sqrt(list_dot_product(t.e, t.e))) AS score
      |  FROM v c JOIN v t ON t.vec_id < 20 AND c.vec_id >= 20),
      |r AS (
      |  SELECT cid, eid, score, ROW_NUMBER() OVER (
      |    PARTITION BY cid ORDER BY score DESC, eid) AS rnk
      |  FROM pairs)
      |SELECT cid AS vec_id, eid AS eval_id, score,
      |  score >= 0.4 AS flagged
      |FROM r WHERE rnk = 1 ORDER BY vec_id""".stripMargin

  /** q221: alignment/uniformity embedding-quality metrics
    * ([[graft.operators.Eval.alignmentUniformity]]) — same-label
    * positives, random-bucket uniformity pair sample; one row. */
  def q221AlignmentUniformity(s: SparkSession,
      d: String): DataFrame =
    graft.operators.Eval.alignmentUniformity(embeddings(s, d),
      "vec_id", "label", "embedding")

  private val q221Oracle: String =
    """WITH v AS (
      |  SELECT vec_id AS id, label AS lb,
      |    CAST(embedding AS DOUBLE[]) AS e,
      |    ('0x' || substr(md5('au:' || vec_id), 1, 8))
      |      ::UBIGINT::BIGINT % 32 AS bk
      |  FROM embeddings),
      |ap AS (
      |  SELECT floor((list_dot_product(a.e, a.e) +
      |    list_dot_product(b.e, b.e) -
      |    2.0 * list_dot_product(a.e, b.e)) * 1e9) / 1e9 AS d2
      |  FROM v a JOIN v b ON a.lb = b.lb AND a.id < b.id),
      |aa AS (
      |  SELECT COUNT(*) AS n_align_pairs,
      |    CAST(SUM(CAST(d2 AS DECIMAL(18,9))) AS DOUBLE)
      |      / COUNT(*) AS alignment
      |  FROM ap),
      |up AS (
      |  SELECT floor((list_dot_product(a.e, a.e) +
      |    list_dot_product(b.e, b.e) -
      |    2.0 * list_dot_product(a.e, b.e)) * 1e9) / 1e9 AS d2
      |  FROM v a JOIN v b ON a.bk = b.bk AND a.id < b.id),
      |uu AS (
      |  SELECT COUNT(*) AS n_unif_pairs,
      |    floor(ln(
      |      CAST(SUM(CAST(floor(exp(-2.0 * d2) * 1e9) / 1e9
      |        AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)) * 1e9)
      |      / 1e9 AS uniformity
      |  FROM up)
      |SELECT aa.n_align_pairs, aa.alignment, uu.n_unif_pairs,
      |  uu.uniformity
      |FROM aa CROSS JOIN uu""".stripMargin

  /** q260: margin-based pair mining
    * ([[graft.operators.SimilaritySearch.marginMining]], Artetxe &
    * Schwenk 2019 ratio margin) — mutual margin-best pairs between
    * the even-id and odd-id embedding halves at k=4, margin ≥ 1.0:
    * the bitext/paraphrase mining step where raw cosine fails on
    * hub vectors. Margins ride trunc9 integer top-k sums + two
    * single IEEE divisions, so the oracle replays every margin and
    * both mutual-best windows exactly.
    *
    * SCALE GATE (r11 verdict item 4): q260 is by design the exact
    * |L|×|R| TRUTH BASELINE for the registered production shape
    * q305 — quadratic compute, 91 s at sf1 and a wall at 100×. Each
    * side is therefore gated to a deterministic md5 SAMPLE of
    * ~[[Q260SideCap]] expected rows: the keep fraction is
    * min(1, cap/n_side) realized as an md5-bucket filter, so the
    * gate is the IDENTITY at sf ≤ 0.1 (sides ≤ 1000 — every
    * registered value to date is unchanged) and caps the pair count
    * at ~cap² beyond it. The oracle replays the same two counts and
    * filters, so the row stays value-exact at EVERY scale factor;
    * the q305↔q260 recall checks run at sf0.001 (SimilaritySpec),
    * inside the identity region. */
  def q260MarginMining(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    def gate(side: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      val n = side.count()
      val keep = math.floor(
        1e6 * math.min(1.0, Q260SideCap.toDouble / n)).toLong
      side.filter(conv(substring(md5(concat(lit("mm:"),
        col("vec_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 1000000L < lit(keep))
    }
    SimilaritySearch.marginMining(
        gate(emb.filter(col("vec_id") % 2 === 0)), "vec_id",
        gate(emb.filter(col("vec_id") % 2 === 1)), "vec_id",
        "embedding", k = 4, marginThreshold = 1.0)
      .orderBy(col("lid"))
  }

  /** Expected per-side row cap of the q260 exact-truth gate: 2500
    * keeps ≤ ~6.25M pair scores (the sf0.1-class cost) at any SF
    * while staying the identity for every side ≤ 2500 rows. */
  private val Q260SideCap: Int = 2500

  /** Margin-mining oracle replay over caller-supplied
    * `$leftSrc(lid, e)` / `$rightSrc(rid, e)` CTEs (the
    * [[SimilaritySearch.marginMining]] arithmetic: trunc9 integer
    * top-k sums, two single IEEE divisions, mutual-best windows) —
    * ends at the final pair projection. Shared by q260 and the
    * composed q270 so the margin arithmetic lives in ONE place. */
  private def marginCtes(leftSrc: String, rightSrc: String,
      k: Int, threshold: Double): String =
    s"""p AS (
      |  SELECT a.lid, b.rid,
      |    list_dot_product(a.e, b.e) /
      |      (sqrt(list_dot_product(a.e, a.e)) *
      |       sqrt(list_dot_product(b.e, b.e))) AS score
      |  FROM $leftSrc a CROSS JOIN $rightSrc b),
      |${marginArithCtes(k, threshold)}""".stripMargin

  /** The margin arithmetic alone (p9 → mutual-best projection),
    * reading an already-defined `p(lid, rid, score)` CTE — shared by
    * the exact cross-join form above and the q305 shortlist form
    * whose `p` is the IVF candidate pair set. */
  private def marginArithCtes(k: Int, threshold: Double): String =
    s"""p9 AS (
      |  SELECT lid, rid, score,
      |    CAST(floor(score * 1e9) AS BIGINT) AS s9
      |  FROM p),
      |rk AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY lid
      |      ORDER BY s9 DESC, rid) AS rl,
      |    row_number() OVER (PARTITION BY rid
      |      ORDER BY s9 DESC, lid) AS rr
      |  FROM p9),
      |ax AS (SELECT lid, SUM(s9) AS ax9 FROM rk
      |  WHERE rl <= $k GROUP BY lid),
      |ay AS (SELECT rid, SUM(s9) AS ay9 FROM rk
      |  WHERE rr <= $k GROUP BY rid),
      |m AS (
      |  SELECT p9.lid, p9.rid, p9.score,
      |    CAST(p9.s9 AS DOUBLE) /
      |      (CAST(ax.ax9 + ay.ay9 AS DOUBLE) / ${2.0 * k})
      |      AS margin
      |  FROM p9 JOIN ax ON ax.lid = p9.lid
      |  JOIN ay ON ay.rid = p9.rid
      |  WHERE ax.ax9 + ay.ay9 > 0),
      |bm AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY lid
      |      ORDER BY margin DESC, rid) AS bl,
      |    row_number() OVER (PARTITION BY rid
      |      ORDER BY margin DESC, lid) AS br
      |  FROM m)
      |SELECT lid, rid, score, margin FROM bm
      |WHERE bl = 1 AND br = 1 AND margin >= $threshold
      |ORDER BY lid""".stripMargin

  private val q260Oracle: String = {
    // the scale gate's keep threshold per side, replayed with the
    // same two counts + md5-bucket filter as the engine
    def keepSql(parity: Int) =
      s"""CAST(FLOOR(1000000 * LEAST(1.0, ${Q260SideCap.toDouble} /
        |    (SELECT COUNT(*) FROM v WHERE vec_id % 2 = $parity)))
        |    AS BIGINT)""".stripMargin
    s"""WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings),
      |l AS (SELECT vec_id AS lid, e FROM v WHERE vec_id % 2 = 0
      |  AND ('0x' || substr(md5('mm:' || vec_id), 1, 8))
      |    ::UBIGINT::BIGINT % 1000000 < ${keepSql(0)}),
      |r AS (SELECT vec_id AS rid, e FROM v WHERE vec_id % 2 = 1
      |  AND ('0x' || substr(md5('mm:' || vec_id), 1, 8))
      |    ::UBIGINT::BIGINT % 1000000 < ${keepSql(1)}),
      |${marginCtes("l", "r", 4, 1.0)}""".stripMargin
  }

  /** q270: the composed SENTENCE-LEVEL PARALLEL-PAIR MINING chain —
    * what a translation-mining pass actually runs: documents split
    * into sentences ([[graft.operators.Corpus.sentences]], docs
    * < 40 as the probe slice), every sentence embedded by a
    * deterministic md5-derived 8-dim vector (the engine-portable
    * hash-vector device — a stand-in for the model embedder that
    * keeps the chain oracle-replayable end to end), the even-doc
    * and odd-doc sides mined for mutual margin-best pairs
    * ([[SimilaritySearch.marginMining]], k=4). The oracle chains
    * the sentence replay, the hex-slice vector derivation, and the
    * full margin arithmetic — the three-family COMPOSITION is what
    * the hash match proves. */
  def q270SentenceMining(s: SparkSession, d: String): DataFrame = {
    val docs = graft.queries.Tables.documents(s, d)
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    val sents = graft.operators.Corpus
      .sentences(docs, "doc_id", "text")
    val h = md5(col("sentence"))
    val vec = array((0 until 8).map { j =>
      conv(substring(h, j * 4 + 1, 4), 16, 10).cast("long")
        .cast("double") / 65535.0 - 0.5
    }: _*)
    val keyed = sents.select(
      (col("doc_id") * 100000 + col("sent_id")).as("sid"),
      col("doc_id"), vec.as("vec"))
    SimilaritySearch.marginMining(
        keyed.filter(col("doc_id") % 2 === 0), "sid",
        keyed.filter(col("doc_id") % 2 === 1), "sid",
        "vec", k = 4, marginThreshold = 1.0)
      .orderBy(col("lid"), col("rid"))
  }

  private val q270Oracle: String = {
    val vecSql = (0 until 8).map { j =>
      s"CAST(('0x' || substr(md5(sentence), ${j * 4 + 1}, 4)) " +
        "AS UBIGINT)::BIGINT / 65535.0 - 0.5"
    }.mkString("[", ",\n      ", "]")
    s"""WITH sx AS (
      |  SELECT doc_id, list_filter(list_transform(
      |    regexp_extract_all(text, '([^.!?]+[.!?]+|[^.!?]+$$)', 1),
      |    s -> trim(s)), s -> len(s) > 0) AS sents
      |  FROM documents WHERE doc_id < 40),
      |se AS (
      |  SELECT doc_id, CAST(u2.i - 1 AS BIGINT) AS sent_id,
      |    sents[u2.i] AS sentence
      |  FROM sx, LATERAL unnest(generate_series(1, len(sents)))
      |    u2(i)),
      |sv AS (
      |  SELECT doc_id, doc_id * 100000 + sent_id AS sid,
      |    $vecSql AS e
      |  FROM se),
      |l AS (SELECT sid AS lid, e FROM sv WHERE doc_id % 2 = 0),
      |r AS (SELECT sid AS rid, e FROM sv WHERE doc_id % 2 = 1),
      |${marginCtes("l", "r", 4, 1.0)}""".stripMargin
  }

  /** q305: SHORTLIST-BACKED margin mining — the production shape of
    * q260 ([[SimilaritySearch.marginMiningShortlist]]): the pair
    * frame is the MULTI-MODAL union of two independent ANN
    * devices, each blind to the other's misses:
    *   (a) the two directed IVF k-NN lists
    *       ([[SimilaritySearch.ivfKnnLists]], √n-cell SAMPLE
    *       quantizer, k=8, nProbe=4) — the cell count scales with
    *       the data ([[SimilaritySearch.coarseCellCount]]; a label
    *       column would be a fixed-cardinality key, the exact
    *       q299/q239 blocking hazard: the r11 first cut's 10 label
    *       cells made the fine scan n²/10 and 56 s at sf1);
    *   (b) the cross-parity edges of the [[NnDescent]] k-NN graph
    *       (k=12, 3 refinement rounds — O(n·k²) per round, linear
    *       in n; the q211 machinery).
    * Fine-scan cost is O(n^1.5 + n·k²) vs q260's |L|×|R|. The
    * oracle replays the cell-count arithmetic, the sample-quantizer
    * table, both probe-4 shortlists, the full NN-descent build
    * (init permutation + 3 candidate closures), the candidate
    * union, and the q260 margin arithmetic on that pair set —
    * value-exact. Recall vs the exact q260 pairs, measured in
    * SimilaritySpec at sf0.001: 0.987 for the union (IVF alone
    * 0.584, NN-descent alone 0.909 — the r11 sweep in NOTES); the
    * q147 sweep device is how a deployment re-picks operating
    * points as the corpus grows. */
  def q305MarginMiningAnn(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cand = SimilaritySearch.parityMarginCandidates(emb,
      "vec_id", "embedding")
    SimilaritySearch.marginMiningShortlist(
        emb.filter(col("vec_id") % 2 === 0), "vec_id",
        emb.filter(col("vec_id") % 2 === 1), "vec_id",
        "embedding", cand, k = 4, marginThreshold = 1.0)
      .orderBy(col("lid"))
  }

  /** q329: q305's NEXT SCALE STEP — identical margin-mining
    * contract, but the coarse quantizer is sized at n^(2/3) cells
    * ([[SimilaritySearch.coarseCellCountScaled]], exact-integer
    * ⌈(n²)^(1/3)⌉) instead of √n, dropping total fine-scan work
    * from O(n^1.5) to O(n^(4/3)) (~21.5× instead of ~31.6× per 10×
    * step — the knob PLANS.md's r13 sf10 probe note says must rise
    * at the scale step where n^1.5 stops fitting the round budget).
    * Value-affecting (per-query IVF scan length falls to
    * nProbe·n^(1/3), so IVF-side candidate recall drops; the
    * NN-descent union member is unchanged and carries the recall
    * floor — measured vs q305's pair set in SimilaritySpec), hence
    * a REGISTERED variant with its own oracle replaying the
    * cube-root sizing, never a silent swap under q305. */
  def q329MarginMiningScaled(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cand = SimilaritySearch.parityMarginCandidates(emb,
      "vec_id", "embedding",
      cellsOf = SimilaritySearch.coarseCellCountScaled(_))
    SimilaritySearch.marginMiningShortlist(
        emb.filter(col("vec_id") % 2 === 0), "vec_id",
        emb.filter(col("vec_id") % 2 === 1), "vec_id",
        "embedding", cand, k = 4, marginThreshold = 1.0)
      .orderBy(col("lid"))
  }

  /** q330: ANN-shortlist RECALL GATE over BOTH registered margin
    * devices ([[SimilaritySearch.annCandidateRecallGate]], the q314
    * verdict-style contract audit): ~512 md5-sampled queries per
    * direction, exact brute-force top-4 over the full opposite
    * parity (|S|·n — linear, the one affordable truth at scale),
    * hit-rate against the PRODUCTION candidate shortlist, verdict
    * at threshold 0.9. Counts replay in SQL (the q260 gate
    * arithmetic); the oracle ASSERTS recall_ok — a run where either
    * device's shortlist lost recall at the verified operating point
    * flips the row red.
    *
    * Measured curve (r13, this gate): sqrt device 0.956/0.963 at
    * sf0.001, 0.966/0.967 at sf0.01, 0.771/0.797 at sf0.1,
    * 0.526/0.502 at sf1; cbrt (q329) device 0.949/0.959, 0.959/
    * 0.954, 0.740/0.743, 0.677/0.689. Two findings the gate makes
    * machine-visible: (1) recall DECAYS with corpus size at fixed
    * nProbe/graph-iters — the q147 sweep re-picks the operating
    * point as the corpus grows, and this gate is the tripwire that
    * says when; (2) at sf1 the n^(2/3)-cell device BEATS the √n
    * device on recall (0.68 vs 0.51) while scanning ~8× fewer
    * fine-scan pairs — on near-duplicate-structured corpora (the
    * replica geometry of scaled testdata) finer cells keep true
    * pairs co-located, so q329 is the scale path on BOTH axes. */
  def q330AnnRecallGate(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    // Multi-device gate (r15): the exact audit legs and the
    // NN-descent leg — identical between the two devices, which
    // differ only in IVF cell sizing — are built ONCE and shared
    // (the r14 shape ran the full single-device gate twice; verdict
    // values are unchanged, [[SimilaritySearch.annCandidateRecallGates]]).
    SimilaritySearch.annCandidateRecallGates(emb, "vec_id",
        "embedding",
        Seq(
          SimilaritySearch.AnnGateDevice("cells_n23",
            SimilaritySearch.coarseCellCountScaled(_)),
          SimilaritySearch.AnnGateDevice("cells_sqrt_n",
            SimilaritySearch.coarseCellCount(_))),
        k = 4, queryCap = 512, threshold = 0.9)
      .select(col("device"), col("direction"), col("n_queries"),
        col("k"), col("n_exact"), col("recall_ok"))
      .orderBy(col("device"), col("direction"))
  }

  /** SF-DEPENDENCE of the asserted verdict (r13 advice: record it
    * HERE, not only in NOTES/PLANS): recall_ok=TRUE is hardcoded, and
    * by the measured r13 curve it holds only where the gate is
    * verified — sf0.001/sf0.01 (both devices ≥ 0.94 vs the 0.9
    * threshold). At sf ≥ 0.1 the fixed-nProbe devices decay below
    * 0.9 (sqrt 0.77/0.51, cbrt 0.74/0.68 at sf0.1/sf1) and this row
    * reads as a MISMATCH — that flip is the designed re-tune
    * tripwire for q305/q329's operating point, not an oracle bug.
    * The recall-HOLDING operating point (probes growing with n) is
    * registered separately as q331 with its own gate q332, which
    * stays green at sf0.1 by measurement. */
  private val q330Oracle: String =
    """WITH ne AS (
      |  SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 2 = 0),
      |nod AS (
      |  SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 2 = 1),
      |sq AS (
      |  SELECT COUNT(*) AS nq FROM embeddings, ne
      |  WHERE vec_id % 2 = 0
      |    AND ('0x' || substr(md5('rg:' || vec_id), 1, 8))
      |      ::UBIGINT::BIGINT % 1000000
      |      < CAST(FLOOR(1000000 * LEAST(1.0,
      |          512.0 / GREATEST(ne.n, 1))) AS BIGINT)),
      |so AS (
      |  SELECT COUNT(*) AS nq FROM embeddings, nod
      |  WHERE vec_id % 2 = 1
      |    AND ('0x' || substr(md5('rg:' || vec_id), 1, 8))
      |      ::UBIGINT::BIGINT % 1000000
      |      < CAST(FLOOR(1000000 * LEAST(1.0,
      |          512.0 / GREATEST(nod.n, 1))) AS BIGINT))
      |SELECT * FROM (
      |  SELECT d.device, 'even_to_odd' AS direction,
      |    sq.nq AS n_queries, CAST(4 AS INTEGER) AS k,
      |    sq.nq * LEAST(4, nod.n) AS n_exact, TRUE AS recall_ok
      |  FROM (VALUES ('cells_sqrt_n'), ('cells_n23')) d(device),
      |    sq, nod
      |  UNION ALL
      |  SELECT d.device, 'odd_to_even', so.nq, CAST(4 AS INTEGER),
      |    so.nq * LEAST(4, ne.n), TRUE
      |  FROM (VALUES ('cells_sqrt_n'), ('cells_n23')) d(device),
      |    so, ne)
      |ORDER BY device, direction""".stripMargin

  /** q331: the RECALL-HOLDING margin-mining operating point (the
    * r13 verdict's one capability hole, closed by measurement):
    * q329's n^(2/3)-cell quantizer, but every recall knob that the
    * q330 gate measured decaying is re-sized —
    *   - nProbe GROWS with n ([[SimilaritySearch.probeCountScaled]],
    *     ⌈(64n)^(1/6)⌉ clamped [4, 64]) so probed volume tracks the
    *     per-cell shrink instead of decaying as n^(-2/3);
    *   - corpus MULTI-ASSIGNMENT 2 (each corpus vector posted to
    *     its 2 nearest cells — the classic cell-boundary lever);
    *   - NN-descent k=24 × 5 rounds (the union member that carries
    *     the recall floor; still O(n·k²) per round, linear in n).
    * Fine-scan work returns to O(n^1.5) — the √n device's budget,
    * spent where it buys recall. Operating point frozen from the
    * r14 measured sweep (PLANS.md): candidate recall 0.99/0.992 at
    * sf0.1 and 0.935/0.925 at sf1, where q305/q329's fixed knobs
    * read 0.77/0.51 and 0.74/0.68 — the q332 gate asserts ≥ 0.9 and
    * stays green at sf0.1 AND sf1, not just the sf0.01 gate point.
    * The oracle replays the whole device: BigInt cell sizing, the
    * integer sixth-root probe rule, 2-cell assignment, the deduped
    * fine scans, all 5 NN-descent rounds, and the margin
    * arithmetic — value-exact. */
  def q331MarginMiningHeld(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val cand = SimilaritySearch.parityMarginCandidates(emb,
      "vec_id", "embedding", graphK = 24, graphIters = 5,
      cellsOf = SimilaritySearch.coarseCellCountScaled(_),
      probesOf = SimilaritySearch.probeCountScaled(_, a = 64),
      corpusAssign = 2)
    SimilaritySearch.marginMiningShortlist(
        emb.filter(col("vec_id") % 2 === 0), "vec_id",
        emb.filter(col("vec_id") % 2 === 1), "vec_id",
        "embedding", cand, k = 4, marginThreshold = 1.0)
      .orderBy(col("lid"))
  }

  /** q332: the q330-style recall gate over the q331 device — the
    * row whose verdict HOLDS as the corpus grows (the designed
    * contrast to q330, whose fixed-knob devices are documented to
    * flip false at sf ≥ 0.1): measured 0.99/0.992 at sf0.1 and
    * 0.935/0.925 at sf1 against the 0.9 threshold (r14 sweep,
    * PLANS.md). recall_ok is asserted TRUE by the oracle at every
    * SF — for THIS device that assertion is the point: scale must
    * not degrade the answer.
    *
    * Measured contract ENVELOPE (recorded at the oracle, the r13
    * advice discipline): green with margin through sf1 (n=20,000);
    * at n=60,000 the device GRAZES the threshold (0.899/0.888 —
    * r14 curve, PLANS.md) where the fixed devices had already
    * fallen to 0.68 a decade of n earlier. A false past sf1 is the
    * re-tune tripwire firing at the NEXT decade; the designed
    * escalation (graphK ∝ n^(1/4), still SQL-replayable) is in
    * PLANS.md. */
  def q332AnnRecallHeldGate(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    SimilaritySearch.annCandidateRecallGate(emb, "vec_id",
        "embedding", k = 4, queryCap = 512, threshold = 0.9,
        cellsOf = SimilaritySearch.coarseCellCountScaled(_),
        probesOf = SimilaritySearch.probeCountScaled(_, a = 64),
        corpusAssign = 2, graphK = 24, graphIters = 5)
      .withColumn("device", lit("held_n23cells_n16probes"))
      .select(col("device"), col("direction"), col("n_queries"),
        col("k"), col("n_exact"), col("recall_ok"))
      .orderBy(col("direction"))
  }

  private val q332Oracle: String =
    """WITH ne AS (
      |  SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 2 = 0),
      |nod AS (
      |  SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 2 = 1),
      |sq AS (
      |  SELECT COUNT(*) AS nq FROM embeddings, ne
      |  WHERE vec_id % 2 = 0
      |    AND ('0x' || substr(md5('rg:' || vec_id), 1, 8))
      |      ::UBIGINT::BIGINT % 1000000
      |      < CAST(FLOOR(1000000 * LEAST(1.0,
      |          512.0 / GREATEST(ne.n, 1))) AS BIGINT)),
      |so AS (
      |  SELECT COUNT(*) AS nq FROM embeddings, nod
      |  WHERE vec_id % 2 = 1
      |    AND ('0x' || substr(md5('rg:' || vec_id), 1, 8))
      |      ::UBIGINT::BIGINT % 1000000
      |      < CAST(FLOOR(1000000 * LEAST(1.0,
      |          512.0 / GREATEST(nod.n, 1))) AS BIGINT))
      |SELECT 'held_n23cells_n16probes' AS device,
      |  'even_to_odd' AS direction, sq.nq AS n_queries,
      |  CAST(4 AS INTEGER) AS k, sq.nq * LEAST(4, nod.n) AS n_exact,
      |  TRUE AS recall_ok
      |FROM sq, nod
      |UNION ALL
      |SELECT 'held_n23cells_n16probes', 'odd_to_even', so.nq,
      |  CAST(4 AS INTEGER), so.nq * LEAST(4, ne.n), TRUE
      |FROM so, ne
      |ORDER BY direction""".stripMargin

  /** One directed IVF shortlist CTE: queries = `$qPar`-parity ids
    * probing 4 cells, corpus = opposite parity in its 1 home cell;
    * top-8 per query, projected as (lid, rid) with the even id
    * always on the left. */
  private def ivfListCte(out: String, qPar: Int): String = {
    val cPar = 1 - qPar
    val (lidSrc, ridSrc) =
      if (qPar == 0) ("q.vec_id", "c.vec_id")
      else ("c.vec_id", "q.vec_id")
    s"""$out AS (
       |  SELECT lid, rid FROM (
       |    SELECT $lidSrc AS lid, $ridSrc AS rid,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_dot_product(q.e, c.e) /
       |          (sqrt(list_dot_product(q.e, q.e)) *
       |           sqrt(list_dot_product(c.e, c.e))) DESC,
       |        c.vec_id) AS rnk
       |    FROM asg q JOIN asg c USING (cell_id)
       |    WHERE q.vec_id % 2 = $qPar AND c.vec_id % 2 = $cPar
       |      AND c.r <= 1 AND q.r <= 4)
       |  WHERE rnk <= 8)""".stripMargin
  }

  /** The q305 oracle body, parameterized by the coarse-quantizer
    * sizing CTE (must bind `ncc(nc)`): q305 plugs the √n rule,
    * q329 the exact-integer n^(2/3) rule — everything downstream
    * (sample-quantizer table, probe-4 shortlists, NN-descent
    * rounds, candidate union, margin arithmetic) is shared. */
  private def marginAnnOracle(nccSql: String): String =
    s"""WITH v AS (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings),
      |$nccSql,
      |cvec AS (
      |  SELECT vec_id AS cell_id, e AS centroid FROM (
      |    SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id)
      |      AS crn
      |    FROM v), ncc
      |  WHERE crn <= nc),
      |asg AS (
      |  SELECT vec_id, e, cell_id, r FROM (
      |    SELECT c.vec_id, c.e, cv.cell_id, ROW_NUMBER() OVER (
      |      PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(c.e, cv.centroid) /
      |          (sqrt(list_dot_product(c.e, c.e)) *
      |           sqrt(list_dot_product(cv.centroid, cv.centroid)))
      |          DESC,
      |        cv.cell_id) AS r
      |    FROM v c, cvec cv) WHERE r <= 4),
      |${ivfListCte("lrl", 0)},
      |${ivfListCte("rll", 1)},
      |vv AS (SELECT vec_id AS id, e FROM v),
      |nnn AS (SELECT COUNT(*) AS n FROM vv),
      |idx AS (
      |  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS i
      |  FROM vv),
      |ie AS (
      |  SELECT x.id AS u, y.id AS v
      |  FROM idx x
      |  CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS j) j
      |  CROSS JOIN nnn
      |  JOIN idx y ON y.i = (x.i + 1 +
      |    ('0x' || substr(md5('nn:' || x.id || ':' || j.j), 1, 8))
      |      ::UBIGINT::BIGINT % (n - 1)) % n
      |  GROUP BY 1, 2),
      |${nnScore("ie", "g0", 12)},
      |${nnRound("g0", "1", 12)},
      |${nnRound("g1", "2", 12)},
      |${nnRound("g2", "3", 12)},
      |gund AS (SELECT u, v FROM g3
      |  UNION ALL SELECT v AS u, u AS v FROM g3),
      |cand AS (SELECT lid, rid FROM lrl
      |  UNION SELECT lid, rid FROM rll
      |  UNION SELECT u AS lid, v AS rid FROM gund
      |    WHERE u % 2 = 0 AND v % 2 = 1),
      |l AS (SELECT vec_id AS lid, e FROM v WHERE vec_id % 2 = 0),
      |r AS (SELECT vec_id AS rid, e FROM v WHERE vec_id % 2 = 1),
      |p AS (
      |  SELECT cd.lid, cd.rid,
      |    list_dot_product(a.e, b.e) /
      |      (sqrt(list_dot_product(a.e, a.e)) *
      |       sqrt(list_dot_product(b.e, b.e))) AS score
      |  FROM cand cd JOIN l a ON a.lid = cd.lid
      |  JOIN r b ON b.rid = cd.rid),
      |${marginArithCtes(4, 1.0)}""".stripMargin

  private val q305Oracle: String = marginAnnOracle(
    """ncc AS (
      |  SELECT GREATEST(16, LEAST(65536,
      |    CAST(ceil(sqrt(COUNT(*))) AS BIGINT))) AS nc
      |  FROM embeddings)""".stripMargin)

  /** q329's sizing rule replayed in exact integer arithmetic: nc =
    * min{c : c³ ≥ n²}, i.e. ⌈(n²)^(1/3)⌉ — the engine's BigInt
    * cube root ([[SimilaritySearch.coarseCellCountScaled]]) and
    * this scan agree for every n, with no libm `pow` at a ceiling
    * boundary on either side. Overflow-safe at EVERY n (the r13
    * advice finding): the candidate scan is bounded at 262145 —
    * any true root above that clamps to 262144 anyway, and the
    * COALESCE supplies 262145 (→ clamped 262144) when no bounded
    * candidate qualifies (true for n > ~1.34e8, where n^(2/3) >
    * 262145) — so c³ stays ≤ 1.8e16 ≪ INT64 range, and n² is
    * computed in HUGEINT (INT64 n² overflows past n ≈ 3.04e9). */
  private val nccCbrtSql: String =
    """ncc AS (
      |  SELECT GREATEST(16, LEAST(262144,
      |    COALESCE(MIN(c), 262145))) AS nc
      |  FROM (SELECT unnest(generate_series(1,
      |          (SELECT LEAST(GREATEST(COUNT(*), 16), 262145)
      |           FROM embeddings))) AS c),
      |       (SELECT CAST(COUNT(*) AS HUGEINT) AS n
      |        FROM embeddings) cnt
      |  WHERE CAST(c AS HUGEINT) * c * c >= cnt.n * cnt.n)""".stripMargin

  private val q329Oracle: String = marginAnnOracle(nccCbrtSql)

  /** One directed IVF shortlist CTE pair for the q331 device:
    * probe count read from the `npp` CTE, corpus side posted to its
    * `corpusAssign` nearest cells, and the candidate (query, corpus)
    * pairs DEDUPED before ranking (multi-assignment surfaces the
    * same pair through several shared cells; the engine dedupes
    * before its row_number for exactly this reason —
    * [[SimilaritySearch.ivfKnnLists]]). */
  private def ivfListCteHeld(out: String, qPar: Int,
      corpusAssign: Int): String = {
    val cPar = 1 - qPar
    val (lidSrc, ridSrc) =
      if (qPar == 0) ("d.qid", "d.cid") else ("d.cid", "d.qid")
    s"""${out}p AS MATERIALIZED (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
       |  FROM asg q JOIN asg c USING (cell_id), npp
       |  WHERE q.vec_id % 2 = $qPar AND c.vec_id % 2 = $cPar
       |    AND c.r <= $corpusAssign AND q.r <= npp.p),
       |$out AS (
       |  SELECT lid, rid FROM (
       |    SELECT $lidSrc AS lid, $ridSrc AS rid,
       |      ROW_NUMBER() OVER (PARTITION BY d.qid ORDER BY
       |        list_dot_product(a.e, b.e) /
       |          (sqrt(list_dot_product(a.e, a.e)) *
       |           sqrt(list_dot_product(b.e, b.e))) DESC,
       |        d.cid) AS rnk
       |    FROM ${out}p d JOIN v a ON a.vec_id = d.qid
       |    JOIN v b ON b.vec_id = d.cid)
       |  WHERE rnk <= 8)""".stripMargin
  }

  /** The q331 oracle: the [[marginAnnOracle]] pipeline with every
    * recall knob parameterized and replayed in exact arithmetic —
    * the `npp` CTE is the integer sixth-root probe rule
    * ([[SimilaritySearch.probeCountScaled]]: p = min{c ≤ 64 :
    * c⁶ ≥ a·n} clamped to ≥ 4, COALESCE = the ≤ 64 clamp; c⁶ ≤
    * 6.9e10 ≪ INT64 and a·n rides HUGEINT, so the scan is exact at
    * every n), cell assignment keeps GREATEST(p, corpusAssign)
    * ranks, the fine scans dedupe multi-assigned pairs before
    * ranking, and the NN-descent build runs `graphIters` rounds at
    * `graphK`. */
  private def marginAnnOracleHeld(nccSql: String, a: Int,
      corpusAssign: Int, graphK: Int, graphIters: Int): String = {
    val rounds = (1 to graphIters)
      .map(i => nnRound(s"g${i - 1}", s"$i", graphK)).mkString(",\n")
    s"""WITH v AS MATERIALIZED (
      |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      |  FROM embeddings),
      |$nccSql,
      |npp AS (
      |  SELECT GREATEST(4, COALESCE(MIN(c), 64)) AS p
      |  FROM (SELECT unnest(generate_series(1, 64)) AS c),
      |       (SELECT CAST(COUNT(*) AS HUGEINT) AS n
      |        FROM embeddings) cnt
      |  WHERE CAST(c AS HUGEINT) * c * c * c * c * c >= $a * cnt.n),
      |cvec AS (
      |  SELECT vec_id AS cell_id, e AS centroid FROM (
      |    SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id)
      |      AS crn
      |    FROM v), ncc
      |  WHERE crn <= nc),
      |asg AS MATERIALIZED (
      |  SELECT vec_id, e, cell_id, r FROM (
      |    SELECT c.vec_id, c.e, cv.cell_id, ROW_NUMBER() OVER (
      |      PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(c.e, cv.centroid) /
      |          (sqrt(list_dot_product(c.e, c.e)) *
      |           sqrt(list_dot_product(cv.centroid, cv.centroid)))
      |          DESC,
      |        cv.cell_id) AS r
      |    FROM v c, cvec cv)
      |  WHERE r <= (SELECT GREATEST(p, $corpusAssign) FROM npp)),
      |${ivfListCteHeld("lrl", 0, corpusAssign)},
      |${ivfListCteHeld("rll", 1, corpusAssign)},
      |vv AS (SELECT vec_id AS id, e FROM v),
      |nnn AS (SELECT COUNT(*) AS n FROM vv),
      |idx AS (
      |  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS i
      |  FROM vv),
      |ie AS (
      |  SELECT x.id AS u, y.id AS v
      |  FROM idx x
      |  CROSS JOIN (SELECT unnest(generate_series(0,
      |    ${graphK - 1})) AS j) j
      |  CROSS JOIN nnn
      |  JOIN idx y ON y.i = (x.i + 1 +
      |    ('0x' || substr(md5('nn:' || x.id || ':' || j.j), 1, 8))
      |      ::UBIGINT::BIGINT % (n - 1)) % n
      |  GROUP BY 1, 2),
      |${nnScore("ie", "g0", graphK)},
      |$rounds,
      |gund AS (SELECT u, v FROM g$graphIters
      |  UNION ALL SELECT v AS u, u AS v FROM g$graphIters),
      |cand AS (SELECT lid, rid FROM lrl
      |  UNION SELECT lid, rid FROM rll
      |  UNION SELECT u AS lid, v AS rid FROM gund
      |    WHERE u % 2 = 0 AND v % 2 = 1),
      |l AS (SELECT vec_id AS lid, e FROM v WHERE vec_id % 2 = 0),
      |r AS (SELECT vec_id AS rid, e FROM v WHERE vec_id % 2 = 1),
      |p AS (
      |  SELECT cd.lid, cd.rid,
      |    list_dot_product(a.e, b.e) /
      |      (sqrt(list_dot_product(a.e, a.e)) *
      |       sqrt(list_dot_product(b.e, b.e))) AS score
      |  FROM cand cd JOIN l a ON a.lid = cd.lid
      |  JOIN r b ON b.rid = cd.rid),
      |${marginArithCtes(4, 1.0)}""".stripMargin
  }

  private val q331Oracle: String =
    marginAnnOracleHeld(nccCbrtSql, a = 64, corpusAssign = 2,
      graphK = 24, graphIters = 5)

  /** q226: graph-based ANN SERVING
    * ([[graft.operators.NnDescent.greedySearch]]) — best-first beam
    * search over the q211 k-NN graph for the first 8 vectors as
    * queries (k=5, beam=8, 3 steps); the oracle unrolls the whole
    * build AND every search round. */
  def q226GraphSearch(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val g = graft.operators.NnDescent.knnGraph(emb, "vec_id",
      "embedding", k = 6, iters = 2)
    graft.operators.NnDescent.greedySearch(g, emb, "vec_id",
        "embedding", emb.filter(col("vec_id") < 8), "vec_id",
        "embedding", k = 5, beam = 8, steps = 3)
      .orderBy(col("qid"), col("rnk"))
  }

  /** One beam round: score `src`'s (qid, cid) pairs, keep top-8. */
  private def beamScore(src: String, out: String): String =
    s"""$out AS MATERIALIZED (
       |  SELECT qid, cid, score, rnk FROM (
       |    SELECT s.qid, s.cid, s.score,
       |      ROW_NUMBER() OVER (PARTITION BY s.qid
       |        ORDER BY s.score DESC, s.cid) AS rnk
       |    FROM (
       |      SELECT c.qid, c.cid,
       |        list_dot_product(q.qe, b.e) /
       |          (sqrt(list_dot_product(q.qe, q.qe)) *
       |           sqrt(list_dot_product(b.e, b.e))) AS score
       |      FROM $src c
       |      JOIN qv q ON q.qid = c.qid
       |      JOIN vv b ON b.id = c.cid) s)
       |  WHERE rnk <= 8)""".stripMargin

  private def beamRound(prev: String, sfx: String): String =
    s"""bx$sfx AS (
       |  SELECT DISTINCT qid, cid FROM (
       |    SELECT b.qid, e.v AS cid FROM $prev b
       |    JOIN g2 e ON b.cid = e.u
       |    UNION ALL
       |    SELECT qid, cid FROM $prev) u),
       |${beamScore(s"bx$sfx", s"bb$sfx")}""".stripMargin

  private lazy val q226Oracle: String =
    s"""WITH vv AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e
       |  FROM embeddings),
       |nn AS (SELECT COUNT(*) AS n FROM vv),
       |idx AS (
       |  SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS i
       |  FROM vv),
       |ie AS (
       |  SELECT x.id AS u, y.id AS v
       |  FROM idx x
       |  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS j) j
       |  CROSS JOIN nn
       |  JOIN idx y ON y.i = (x.i + 1 +
       |    ('0x' || substr(md5('nn:' || x.id || ':' || j.j), 1, 8))
       |      ::UBIGINT::BIGINT % (n - 1)) % n
       |  GROUP BY 1, 2),
       |${nnScore("ie", "g0")},
       |${nnRound("g0", "1")},
       |${nnRound("g1", "2")},
       |qv AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
       |  FROM embeddings WHERE vec_id < 8),
       |en AS (
       |  SELECT DISTINCT q.qid, y.id AS cid
       |  FROM qv q
       |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS en) en
       |  CROSS JOIN nn
       |  JOIN idx y ON y.i =
       |    ('0x' || substr(md5('nns:' || q.qid || ':' || en.en),
       |      1, 8))::UBIGINT::BIGINT % n),
       |${beamScore("en", "bb0")},
       |${beamRound("bb0", "1")},
       |${beamRound("bb1", "2")},
       |${beamRound("bb2", "3")}
       |SELECT qid, cid, score, CAST(rnk AS BIGINT) AS rnk
       |FROM bb3 WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q211_nn_descent" -> (q211NnDescent _),
    "q220_semantic_decon" -> (q220SemanticDecon _),
    "q221_alignment_uniformity" -> (q221AlignmentUniformity _),
    "q260_margin_mining" -> (q260MarginMining _),
    "q270_sentence_mining" -> (q270SentenceMining _),
    "q305_margin_mining_ann" -> (q305MarginMiningAnn _),
    "q329_margin_mining_scaled" -> (q329MarginMiningScaled _),
    "q330_ann_recall_gate" -> (q330AnnRecallGate _),
    "q331_margin_mining_held" -> (q331MarginMiningHeld _),
    "q332_ann_recall_held_gate" -> (q332AnnRecallHeldGate _),
    "q226_graph_search" -> (q226GraphSearch _),
    "q124_retrieval_metrics" -> (q124RetrievalMetrics _),
    "q119_random_projection" -> (q119RandomProjection _),
    "q113_hard_negatives" -> (q113HardNegatives _),
    "q112_filtered_knn" -> (q112FilteredKnn _),
    "q103_semdedup" -> (q103SemDedup _),
    "q89_compressed_knn" -> (q89CompressedKnn _),
    "q72_ann_pq" -> (q72AnnPq _),
    "q68_embedding_quant" -> (q68EmbeddingQuant _),
    "q43_ann_ivf" -> (q43AnnIvf _),
    "q142_cluster_balanced" -> (q142ClusterBalanced _),
    "q147_ann_recall_sweep" -> (q147AnnRecallSweep _),
    "q159_matryoshka_recall" -> (q159MatryoshkaRecall _),
    "q58_embedding_neardups" -> (q58EmbeddingNearDups _),
    "q31_knn_bruteforce" -> (q31KnnBruteForce _),
    "q294_kcenter_select" -> (q294KCenterSelect _),
    "q155_mmr_diversify" -> (q155MmrDiversify _),
    "q32_label_centroids" -> (q32LabelCentroids _),
    "q33_vector_norms" -> (q33VectorNorms _),
    "q34_cosine_top_pairs" -> (q34CosineTopPairs _),
  )

  /** q294: greedy k-center diverse-subset selection
    * ([[graft.operators.DiverseSelection.kCenterSelect]], K=6) —
    * the farthest-first exemplar traversal over the embedding table;
    * pick order + covering radius per pick. The oracle unrolls all
    * five post-seed rounds with the q31 distance device. */
  def q294KCenterSelect(s: SparkSession, d: String): DataFrame =
    graft.operators.DiverseSelection.kCenterSelect(
        embeddings(s, d), "vec_id", "embedding", k = 6)
      .orderBy(col("round"))

  private val q294Oracle: String = {
    val rounds = (2 to 6).map { r =>
      val prev = s"acc${r - 1}"
      s"""dd$r AS (
        |  SELECT p.pid,
        |    MIN(CASE WHEN p.nrm > 0 AND c.nrm > 0
        |      THEN 1.0 - list_dot_product(p.e, c.e) / (p.nrm * c.nrm)
        |      ELSE 1.0 END) AS dist
        |  FROM vvk p CROSS JOIN $prev c
        |  WHERE p.pid NOT IN (SELECT pid FROM $prev)
        |  GROUP BY p.pid),
        |ck$r AS MATERIALIZED (
        |  SELECT CAST($r AS BIGINT) AS round, w.pid, vvk.e, vvk.nrm,
        |    w.dist
        |  FROM (SELECT pid, dist FROM dd$r
        |        ORDER BY dist DESC, pid LIMIT 1) w
        |  JOIN vvk ON vvk.pid = w.pid),
        |acc$r AS MATERIALIZED (
        |  SELECT * FROM $prev UNION ALL SELECT * FROM ck$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH vvk AS MATERIALIZED (
      |  SELECT vec_id AS pid, CAST(embedding AS DOUBLE[]) AS e,
      |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[]))) AS nrm
      |  FROM embeddings),
      |acc1 AS MATERIALIZED (
      |  SELECT CAST(1 AS BIGINT) AS round, pid, e, nrm,
      |    CAST(0.0 AS DOUBLE) AS dist
      |  FROM vvk ORDER BY pid LIMIT 1),
      |$rounds
      |SELECT round, pid AS vec_id, dist FROM acc6
      |ORDER BY round""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q294_kcenter_select" -> q294Oracle,
    "q124_retrieval_metrics" -> {
      // the gain table is driver-computed ONCE and interpolated into
      // both the plan and this SQL (see Eval.scaledGains) — no libm
      // floor evaluated inside either engine
      val gains = graft.operators.Eval.scaledGains(10)
      val cums = graft.operators.Eval.scaledGainCums(10)
      val gainVals = gains.zipWithIndex
        .map { case (g, i) => s"(${i + 1}, ${g}::BIGINT)" }
        .mkString(", ")
      val cumVals = cums.zipWithIndex
        .map { case (c, i) => s"(${i + 1}, ${c}::BIGINT)" }
        .mkString(", ")
      s"""WITH v AS (SELECT vec_id, label,
        |    CAST(embedding AS DOUBLE[]) e FROM embeddings),
        |q AS (SELECT * FROM v WHERE vec_id < 10),
        |scored AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_dot_product(q.e, c.e) /
        |   (sqrt(list_dot_product(q.e, q.e)) *
        |    sqrt(list_dot_product(c.e, c.e))) AS score
        | FROM q, v c WHERE c.vec_id <> q.vec_id),
        |ranked AS (
        | SELECT qid, cid, ROW_NUMBER() OVER (
        |   PARTITION BY qid ORDER BY score DESC, cid) AS rnk
        | FROM scored),
        |results AS (SELECT * FROM ranked WHERE rnk <= 10),
        |truth AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid
        | FROM q JOIN v c ON c.label = q.label
        |   AND c.vec_id <> q.vec_id),
        |gold AS (SELECT qid, COUNT(*) AS n_gold FROM truth GROUP BY 1),
        |gains(rnk, gain) AS (SELECT * FROM (VALUES $gainVals)),
        |ideal(i, cum) AS (SELECT * FROM (VALUES $cumVals)),
        |rel AS (SELECT r.qid, r.rnk FROM results r
        |  JOIN truth t ON r.qid = t.qid AND r.cid = t.cid),
        |perq AS (SELECT rel.qid, COUNT(*) AS hits,
        |    MIN(rel.rnk) AS min_rel_rank,
        |    SUM(gains.gain) AS dcg_s
        |  FROM rel JOIN gains ON gains.rnk = rel.rnk
        |  GROUP BY rel.qid)
        |SELECT g.qid, g.n_gold,
        |  COALESCE(p.hits, 0) AS hits,
        |  CAST(COALESCE(p.hits, 0) AS DOUBLE) / g.n_gold
        |    AS recall_at_k,
        |  CAST(COALESCE(p.hits, 0) AS DOUBLE) / 10 AS precision_at_k,
        |  COALESCE(1.0 / p.min_rel_rank, 0.0) AS mrr,
        |  COALESCE(CAST(p.dcg_s AS DOUBLE) / CAST(i.cum AS DOUBLE),
        |    0.0) AS ndcg_at_k
        |FROM gold g
        |LEFT JOIN perq p ON g.qid = p.qid
        |JOIN ideal i ON i.i = LEAST(g.n_gold, 10)
        |ORDER BY g.qid""".stripMargin
    },
    "q119_random_projection" ->
      """WITH s AS (
        |  SELECT i, j,
        |    CASE WHEN substr(md5(CAST(i AS VARCHAR) || '_' ||
        |        CAST(j AS VARCHAR)), 1, 1) BETWEEN '0' AND '7'
        |      THEN 1.0 ELSE -1.0 END AS sgn
        |  FROM range(64) r1(i), range(16) r2(j)),
        |m AS (SELECT j, list(CAST(sgn AS DOUBLE) ORDER BY i) AS row
        |  FROM s GROUP BY j),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings)
        |SELECT e.vec_id, CAST(m.j AS INT) AS j,
        |  list_dot_product(e.e, m.row) AS v
        |FROM e CROSS JOIN m
        |ORDER BY vec_id, j""".stripMargin,
    "q113_hard_negatives" ->
      """WITH v AS (SELECT vec_id, label,
        |  CAST(embedding AS DOUBLE[]) e FROM embeddings),
        |q AS (SELECT * FROM v WHERE vec_id < 10),
        |pos AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid
        |  FROM q JOIN v c ON c.label = q.label AND c.vec_id < 100),
        |scored AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_dot_product(q.e, c.e) /
        |   (sqrt(list_dot_product(q.e, q.e)) *
        |    sqrt(list_dot_product(c.e, c.e))) AS score
        | FROM q, v c
        | WHERE NOT EXISTS (SELECT 1 FROM pos
        |   WHERE pos.qid = q.vec_id AND pos.cid = c.vec_id)),
        |ranked AS (
        | SELECT qid, cid, score, ROW_NUMBER() OVER (
        |   PARTITION BY qid ORDER BY score DESC, cid) AS rnk
        | FROM scored)
        |SELECT qid, cid, score, rnk FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "q112_filtered_knn" ->
      """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        |      FROM embeddings WHERE label >= 5),
        |scored AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_dot_product(q.e, c.e) /
        |   (sqrt(list_dot_product(q.e, q.e)) *
        |    sqrt(list_dot_product(c.e, c.e))) AS score
        | FROM q, c),
        |ranked AS (
        | SELECT qid, cid, score, ROW_NUMBER() OVER (
        |   PARTITION BY qid ORDER BY score DESC, cid) AS rnk
        | FROM scored)
        |SELECT qid, cid, score, rnk FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "q103_semdedup" ->
      """WITH v AS (SELECT vec_id, label,
        |  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |d AS (
        |  SELECT DISTINCT b.vec_id AS dup
        |  FROM v a JOIN v b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) *
        |     sqrt(list_dot_product(b.v, b.v))) >= 0.3e0)
        |SELECT v.vec_id AS id, v.label AS cell,
        |  (d.dup IS NULL) AS keep
        |FROM v LEFT JOIN d ON v.vec_id = d.dup
        |ORDER BY id""".stripMargin,
    // int8 shortlist (quantized cosine, Math.round ≡ floor(x+0.5))
    // + exact float re-rank; both rank windows tie-break on cid —
    // the same contract as the engine's bounded heaps.
    "q89_compressed_knn" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  list_reduce(list_transform(e, x -> abs(x)),
        |    (a, x) -> CASE WHEN x > a THEN x ELSE a END) / 127.0
        |    AS scale FROM v),
        |q8 AS (SELECT vec_id, e,
        |  list_transform(e, x -> floor(x / scale + 0.5)) AS q
        |  FROM s WHERE scale > 0),
        |n AS (SELECT vec_id, e, q,
        |  sqrt(list_dot_product(q, q)) AS qnorm FROM q8),
        |scored AS (
        |  SELECT qr.vec_id AS qid, c.vec_id AS cid,
        |    list_dot_product(qr.q, c.q) / (qr.qnorm * c.qnorm)
        |      AS qscore
        |  FROM n qr, n c
        |  WHERE qr.vec_id < 10 AND qr.qnorm > 0 AND c.qnorm > 0),
        |short AS (SELECT qid, cid, ROW_NUMBER() OVER (
        |    PARTITION BY qid ORDER BY qscore DESC, cid) AS srn
        |  FROM scored),
        |fs AS (
        |  SELECT sh.qid, sh.cid,
        |    list_dot_product(q.e, c.e) /
        |      (sqrt(list_dot_product(q.e, q.e)) *
        |       sqrt(list_dot_product(c.e, c.e))) AS score
        |  FROM short sh
        |    JOIN v q ON sh.qid = q.vec_id
        |    JOIN v c ON sh.cid = c.vec_id
        |  WHERE sh.srn <= 60),
        |ranked AS (SELECT qid, cid, score, ROW_NUMBER() OVER (
        |    PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM fs)
        |SELECT qid, cid, score, rnk FROM ranked
        |WHERE rnk <= 6 ORDER BY qid, rnk""".stripMargin,
    // Recomputes the PQ pipeline relationally: label-rank codes,
    // exact decimal-sum codebook means (order-independent — mirrors
    // the engine's partial-aggregating mean), argmin assignment with
    // lower-code tie-break, and the ADC score as the sub-ordered fold
    // of table lookups (the (sub,code) join picks exactly the
    // corpus row's table entry per subspace).
    "q72_ann_pq" ->
      """WITH params AS (
        |  SELECT MIN(len(embedding)) // 8 AS dsub FROM embeddings),
        |lab AS (SELECT label, ROW_NUMBER() OVER (ORDER BY label) - 1
        |    AS code FROM (SELECT DISTINCT label FROM embeddings)),
        |elems AS (
        |  SELECT label, vec_id,
        |    (generate_subscripts(embedding, 1) - 1) // dsub AS sub,
        |    (generate_subscripts(embedding, 1) - 1) % dsub AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings, params),
        |cbm AS (
        |  SELECT label, sub, pos,
        |    CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
        |      AS mval
        |  FROM elems GROUP BY 1, 2, 3),
        |cb AS (
        |  SELECT code, sub, list(mval ORDER BY pos) AS cw
        |  FROM cbm JOIN lab USING (label) GROUP BY 1, 2),
        |sv AS (
        |  SELECT vec_id, sub, list(x ORDER BY pos) AS sv
        |  FROM elems GROUP BY 1, 2),
        |enc AS (
        |  SELECT vec_id, sub, code FROM (
        |    SELECT s.vec_id, s.sub, c.code, ROW_NUMBER() OVER (
        |      PARTITION BY s.vec_id, s.sub ORDER BY
        |        list_dot_product(s.sv, s.sv)
        |          - 2 * list_dot_product(s.sv, c.cw)
        |          + list_dot_product(c.cw, c.cw), c.code) AS r
        |    FROM sv s JOIN cb c USING (sub)) WHERE r = 1),
        |qt AS (
        |  SELECT s.vec_id AS qid, s.sub, c.code,
        |    list_dot_product(s.sv, c.cw) AS t
        |  FROM sv s JOIN cb c USING (sub) WHERE s.vec_id < 10),
        |contrib AS (
        |  SELECT q.qid, e.vec_id AS cid, q.sub, q.t
        |  FROM qt q JOIN enc e ON q.sub = e.sub AND q.code = e.code),
        |score AS (
        |  SELECT qid, cid,
        |    list_reduce(list_concat([0.0e0], list(t ORDER BY sub)),
        |      (a, b) -> a + b) AS score
        |  FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT qid, cid, score, ROW_NUMBER() OVER (
        |    PARTITION BY qid ORDER BY score DESC, cid) AS rnk
        |  FROM score)
        |SELECT qid, cid, score, rnk FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    "q68_embedding_quant" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |           FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  list_reduce(list_transform(e, x -> abs(x)),
        |    (a, x) -> CASE WHEN x > a THEN x ELSE a END) / 127.0
        |    AS scale FROM v)
        |SELECT vec_id, scale,
        | CASE WHEN scale = 0 THEN 0 ELSE
        |  list_reduce(list_transform(e,
        |    x -> CAST(round(x / scale) AS BIGINT)), (a, x) -> a + x)
        | END AS q_checksum,
        | CASE WHEN scale = 0 THEN 0.0 ELSE
        |  list_max(list_transform(e,
        |    x -> abs(x - round(x / scale) * scale)))
        | END AS max_err
        |FROM s ORDER BY vec_id""".stripMargin,
    // The IVF computation is deterministic relational algebra
    // (label-mean centroids via exact decimal-sum means, coarse
    // assignment windows, cell join, ranked fine scan) — so although
    // its RECALL is approximate vs q31, its OUTPUT is exactly
    // reproducible.
    "q159_matryoshka_recall" -> {
      // one ranked block per space: full (truth) + each prefix
      // truncation; every block mirrors the engine's top10 device —
      // rank INCLUDING self over k=11, drop self, re-rank, keep 10
      def rankedSel(name: String, vecExpr: String => String): String =
        s"""r$name AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |      list_dot_product(${vecExpr("q")}, ${vecExpr("c")}) /
           |       (sqrt(list_dot_product(${vecExpr("q")},
           |          ${vecExpr("q")})) *
           |        sqrt(list_dot_product(${vecExpr("c")},
           |          ${vecExpr("c")}))) DESC,
           |      c.vec_id) AS rnk
           |  FROM corp q, corp c WHERE q.vec_id < 10),
           |s$name AS (SELECT qid, cid FROM (
           |  SELECT qid, cid, ROW_NUMBER() OVER (
           |    PARTITION BY qid ORDER BY rnk) AS r2
           |  FROM r$name WHERE rnk <= 11 AND qid <> cid)
           |  WHERE r2 <= 10)""".stripMargin
      val dims = Seq(8, 16, 32)
      val blocks = rankedSel("full", a => s"$a.v") +: dims.map(dd =>
        rankedSel(s"d$dd", a => s"$a.v[1:$dd]"))
      val hitBlocks = dims.map(dd =>
        s"""SELECT $dd AS dims, COUNT(*) AS hits
           |FROM sd$dd JOIN sfull USING (qid, cid)""".stripMargin)
      s"""WITH corp AS (SELECT vec_id,
        |  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |${blocks.mkString(",\n")}
        |SELECT dims, hits,
        |  CAST(hits AS DOUBLE) /
        |    (SELECT COUNT(*) FROM sfull) AS mean_recall
        |FROM (${hitBlocks.mkString("\nUNION ALL\n")})
        |ORDER BY dims""".stripMargin
    },
    "q147_ann_recall_sweep" -> {
      val probes = Seq(1, 2, 4)
      val qaBlocks = probes.map { np =>
        s"""qa$np AS (SELECT vec_id, v, cell_id FROM (
           |  SELECT c.vec_id, c.v, cv.cell_id, ROW_NUMBER() OVER (
           |    PARTITION BY c.vec_id ORDER BY
           |     list_dot_product(c.v, cv.centroid) /
           |      (sqrt(list_dot_product(c.v, c.v)) *
           |       sqrt(list_dot_product(cv.centroid, cv.centroid))) DESC,
           |     cv.cell_id) AS r
           |  FROM corp c, cvec cv WHERE c.vec_id < 10)
           |  WHERE r <= $np)""".stripMargin
      }
      val selBlocks = probes.map { np =>
        s"""s$np AS (SELECT qid, cid FROM (
           |  SELECT q.vec_id AS qid, c.vec_id AS cid,
           |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
           |      list_dot_product(q.v, c.v) /
           |       (sqrt(list_dot_product(q.v, q.v)) *
           |        sqrt(list_dot_product(c.v, c.v))) DESC,
           |      c.vec_id) AS rnk
           |  FROM qa$np q JOIN ca c USING (cell_id))
           |  WHERE rnk <= 11 AND qid <> cid)""".stripMargin
      }
      val hitBlocks = probes.map { np =>
        s"""SELECT $np AS n_probe, COUNT(*) AS hits
           |FROM s$np JOIN truth USING (qid, cid)""".stripMargin
      }
      s"""WITH cent AS (
        | SELECT label AS cell_id, pos,
        |  CAST(SUM(CAST(e AS DECIMAL(18,9))) AS DOUBLE)
        |    / COUNT(*) AS m
        | FROM (SELECT label, vec_id,
        |         generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS e
        |       FROM embeddings)
        | GROUP BY 1, 2),
        |cvec AS (SELECT cell_id, list(m ORDER BY pos) AS centroid
        |  FROM cent GROUP BY 1),
        |corp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |ca AS (SELECT vec_id, v, cell_id FROM (
        |  SELECT c.vec_id, c.v, cv.cell_id, ROW_NUMBER() OVER (
        |    PARTITION BY c.vec_id ORDER BY
        |     list_dot_product(c.v, cv.centroid) /
        |      (sqrt(list_dot_product(c.v, c.v)) *
        |       sqrt(list_dot_product(cv.centroid, cv.centroid))) DESC,
        |     cv.cell_id) AS r
        |  FROM corp c, cvec cv) WHERE r = 1),
        |${qaBlocks.mkString(",\n")},
        |truth AS (SELECT qid, cid FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_dot_product(q.v, c.v) /
        |       (sqrt(list_dot_product(q.v, q.v)) *
        |        sqrt(list_dot_product(c.v, c.v))) DESC,
        |      c.vec_id) AS rnk
        |  FROM corp q, corp c WHERE q.vec_id < 10)
        |  WHERE rnk <= 11 AND qid <> cid),
        |${selBlocks.mkString(",\n")}
        |SELECT n_probe, hits,
        |  CAST(hits AS DOUBLE) /
        |    (SELECT COUNT(*) FROM truth) AS mean_recall
        |FROM (${hitBlocks.mkString("\nUNION ALL\n")})
        |ORDER BY n_probe""".stripMargin
    },
    "q142_cluster_balanced" ->
      """WITH cent AS (
        | SELECT label AS cell_id, pos,
        |  CAST(SUM(CAST(e AS DECIMAL(18,9))) AS DOUBLE)
        |    / COUNT(*) AS m
        | FROM (SELECT label, vec_id,
        |         generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS e
        |       FROM embeddings)
        | GROUP BY 1, 2),
        |cvec AS (SELECT cell_id, list(m ORDER BY pos) AS centroid
        |  FROM cent GROUP BY 1),
        |corp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cassign AS (SELECT vec_id, cell_id FROM (
        |  SELECT c.vec_id, cv.cell_id, ROW_NUMBER() OVER (
        |    PARTITION BY c.vec_id ORDER BY
        |     list_dot_product(c.v, cv.centroid) /
        |      (sqrt(list_dot_product(c.v, c.v)) *
        |       sqrt(list_dot_product(cv.centroid, cv.centroid))) DESC,
        |     cv.cell_id) AS r
        |  FROM corp c, cvec cv) WHERE r = 1),
        |counts AS (SELECT cell_id, COUNT(*) AS n,
        |    floor(sqrt(COUNT(*)) * 1e9) / 1e9 AS sq9
        |  FROM cassign GROUP BY 1),
        |rates AS (SELECT cell_id,
        |    CAST(floor(least(1.0e0,
        |      30.0e0 * sq9 /
        |        (SELECT CAST(SUM(CAST(sq9 AS DECIMAL(18,9)))
        |           AS DOUBLE) FROM counts) /
        |        CAST(n AS DOUBLE)) * 10000) AS BIGINT)
        |      AS keep_threshold
        |  FROM counts)
        |SELECT a.vec_id, a.cell_id, r.keep_threshold
        |FROM cassign a JOIN rates r USING (cell_id)
        |WHERE ('0x' || substr(md5('temp:' ||
        |    CAST(a.vec_id AS VARCHAR)), 1, 8))::UBIGINT % 10000
        |  < r.keep_threshold
        |ORDER BY a.vec_id""".stripMargin,
    "q43_ann_ivf" ->
      """WITH cent AS (
        | SELECT label AS cell_id, pos,
        |  CAST(SUM(CAST(e AS DECIMAL(18,9))) AS DOUBLE)
        |    / COUNT(*) AS m
        | FROM (SELECT label, vec_id,
        |         generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS e
        |       FROM embeddings)
        | GROUP BY 1, 2),
        |cvec AS (SELECT cell_id, list(m ORDER BY pos) AS centroid
        |  FROM cent GROUP BY 1),
        |corp AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cassign AS (SELECT vec_id, v, cell_id FROM (
        |  SELECT c.vec_id, c.v, cv.cell_id, ROW_NUMBER() OVER (
        |    PARTITION BY c.vec_id ORDER BY
        |     list_dot_product(c.v, cv.centroid) /
        |      (sqrt(list_dot_product(c.v, c.v)) *
        |       sqrt(list_dot_product(cv.centroid, cv.centroid))) DESC,
        |     cv.cell_id) AS r
        |  FROM corp c, cvec cv) WHERE r <= 1),
        |qassign AS (SELECT vec_id, v, cell_id FROM (
        |  SELECT c.vec_id, c.v, cv.cell_id, ROW_NUMBER() OVER (
        |    PARTITION BY c.vec_id ORDER BY
        |     list_dot_product(c.v, cv.centroid) /
        |      (sqrt(list_dot_product(c.v, c.v)) *
        |       sqrt(list_dot_product(cv.centroid, cv.centroid))) DESC,
        |     cv.cell_id) AS r
        |  FROM corp c, cvec cv WHERE c.vec_id < 10) WHERE r <= 2),
        |fine AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_dot_product(q.v, c.v) /
        |   (sqrt(list_dot_product(q.v, q.v)) *
        |    sqrt(list_dot_product(c.v, c.v))) AS score
        | FROM qassign q JOIN cassign c USING (cell_id)),
        |ranked AS (SELECT qid, cid, score, ROW_NUMBER() OVER (
        |  PARTITION BY qid ORDER BY score DESC, cid) AS rnk FROM fine)
        |SELECT qid, cid, score, rnk FROM ranked
        |WHERE rnk <= 6 AND qid <> cid
        |ORDER BY qid, rnk""".stripMargin,
    // Exhaustive cosine >= 0.999 over embeddings ∪ planted twins: the
    // banded-LSH engine path must recover exactly these pairs.
    "q58_embedding_neardups" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        |              FROM embeddings),
        |twins AS (SELECT vec_id + 1000000 AS vec_id,
        |  list_concat([e[1] + 0.02], e[2:]) AS e FROM base),
        |v AS (SELECT * FROM base UNION ALL SELECT * FROM twins)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | list_dot_product(a.e, b.e) /
        |  (sqrt(list_dot_product(a.e, a.e)) *
        |   sqrt(list_dot_product(b.e, b.e))) AS score
        |FROM v a, v b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.e, b.e) /
        |   (sqrt(list_dot_product(a.e, a.e)) *
        |    sqrt(list_dot_product(b.e, b.e))) >= 0.999
        |ORDER BY id_a, id_b""".stripMargin,
    "q155_mmr_diversify" -> {
      // the engine's k greedy steps replayed as k chained SQL stages;
      // every arithmetic shape (0.5e0·score − 0.5e0·COALESCE(maxsim,
      // 0)) mirrors the engine's fixed-shape mmr expression exactly
      val k = 5
      val stages = (1 to k).map { i =>
        val prev = s"sel${i - 1}"
        s"""s$i AS (
           | SELECT qid, cid, score, mmr_score, $i AS rnk FROM (
           |  SELECT c.qid, c.cid, c.score,
           |   0.5e0*c.score - 0.5e0*COALESCE(m.maxsim, 0.0e0)
           |     AS mmr_score,
           |   ROW_NUMBER() OVER (PARTITION BY c.qid
           |     ORDER BY 0.5e0*c.score - 0.5e0*COALESCE(m.maxsim,
           |       0.0e0) DESC, c.cid) AS r
           |  FROM cand c
           |  LEFT JOIN (SELECT p.qid, p.cid, MAX(p.sim) AS maxsim
           |    FROM pairs p JOIN $prev s
           |      ON s.qid = p.qid AND s.cid = p.other
           |    GROUP BY p.qid, p.cid) m
           |   ON m.qid = c.qid AND m.cid = c.cid
           |  WHERE NOT EXISTS (SELECT 1 FROM $prev s2
           |    WHERE s2.qid = c.qid AND s2.cid = c.cid)
           | ) WHERE r = 1),
           |sel$i AS (SELECT qid, cid FROM $prev
           |  UNION ALL SELECT qid, cid FROM s$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
         |           FROM embeddings),
         |scored AS (
         | SELECT q.vec_id AS qid, c.vec_id AS cid,
         |  list_dot_product(q.e, c.e) /
         |   (sqrt(list_dot_product(q.e, q.e)) *
         |    sqrt(list_dot_product(c.e, c.e))) AS score
         | FROM v q, v c WHERE q.vec_id < 5),
         |ranked AS (SELECT qid, cid, score, ROW_NUMBER() OVER (
         |   PARTITION BY qid ORDER BY score DESC, cid) AS rnk
         |  FROM scored),
         |cand AS (SELECT qid, cid, score FROM ranked
         |  WHERE rnk <= 21 AND cid <> qid),
         |pairs AS (SELECT a.qid, a.cid, b.cid AS other,
         |  list_dot_product(ca.e, cb.e) /
         |   (sqrt(list_dot_product(ca.e, ca.e)) *
         |    sqrt(list_dot_product(cb.e, cb.e))) AS sim
         | FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
         |  JOIN v ca ON ca.vec_id = a.cid
         |  JOIN v cb ON cb.vec_id = b.cid),
         |sel0 AS (SELECT qid, cid FROM cand WHERE false),
         |$stages
         |SELECT qid, cid, score, mmr_score, rnk FROM (
         | ${(1 to k).map(i => s"SELECT * FROM s$i")
             .mkString(" UNION ALL ")})
         |ORDER BY qid, rnk""".stripMargin
    },
    "q211_nn_descent" -> q211Oracle,
    "q220_semantic_decon" -> q220Oracle,
    "q221_alignment_uniformity" -> q221Oracle,
    "q260_margin_mining" -> q260Oracle,
    "q305_margin_mining_ann" -> q305Oracle,
    "q329_margin_mining_scaled" -> q329Oracle,
    "q330_ann_recall_gate" -> q330Oracle,
    "q331_margin_mining_held" -> q331Oracle,
    "q332_ann_recall_held_gate" -> q332Oracle,
    "q270_sentence_mining" -> q270Oracle,
    "q226_graph_search" -> q226Oracle,
    "q31_knn_bruteforce" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        |           FROM embeddings),
        |scored AS (
        | SELECT q.vec_id AS qid, c.vec_id AS cid,
        |  list_dot_product(q.e, c.e) /
        |   (sqrt(list_dot_product(q.e, q.e)) *
        |    sqrt(list_dot_product(c.e, c.e))) AS score
        | FROM v q, v c WHERE q.vec_id < 10),
        |ranked AS (
        | SELECT qid, cid, score, ROW_NUMBER() OVER (
        |   PARTITION BY qid ORDER BY score DESC, cid) AS rnk
        | FROM scored)
        |SELECT qid, cid, score, rnk FROM ranked
        |WHERE rnk <= 6 AND qid <> cid
        |ORDER BY qid, rnk""".stripMargin,
    "q32_label_centroids" ->
      """SELECT label, pos,
        | CAST(SUM(CAST(e AS DECIMAL(18,9))) AS DOUBLE)
        |   / COUNT(*) AS centroid_val
        |FROM (SELECT label, vec_id,
        |        generate_subscripts(embedding, 1) - 1 AS pos,
        |        CAST(unnest(embedding) AS DOUBLE) AS e
        |      FROM embeddings)
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "q33_vector_norms" ->
      """SELECT vec_id,
        | sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                       CAST(embedding AS DOUBLE[]))) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q34_cosine_top_pairs" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e
        |           FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | list_dot_product(a.e, b.e) /
        |  (sqrt(list_dot_product(a.e, a.e)) *
        |   sqrt(list_dot_product(b.e, b.e))) AS score
        |FROM v a, v b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.e, b.e) /
        |   (sqrt(list_dot_product(a.e, a.e)) *
        |    sqrt(list_dot_product(b.e, b.e))) > 0.3
        |ORDER BY score DESC, id_a, id_b LIMIT 100""".stripMargin,
  )
}
