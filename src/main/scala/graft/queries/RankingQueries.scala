package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Retrieval-scoring suite: Kneser-Ney LM surprisal
  * ([[graft.operators.LanguageModel.kneserNeySurprisal]]), Dirichlet
  * query likelihood, ColBERT-style MaxSim, and 1-bit sign-quantized
  * Hamming retrieval ([[graft.operators.Ranking]]) — the published
  * ranking models a reference user would run next to BM25/cosine.
  * All value-exact vs DuckDB via the ln9/decimal-sum/total-order
  * devices.
  */
object RankingQueries {

  /** q164: interpolated Kneser-Ney bigram surprisal per document
    * (D=0.75) over CJK-aware tokens — the smoothing real n-gram
    * quality filters ship; complements the add-one LM (q101). */
  def q164KneserNey(s: SparkSession, d: String): DataFrame =
    graft.operators.LanguageModel.kneserNeySurprisal(
      documents(s, d), "doc_id", "text")

  private val DirichletQueries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "table"),
    1 -> Seq("hash", "row"),
    2 -> Seq("scan", "merge", "fast"),
    3 -> Seq("window", "batch", "key"))

  /** q165: Dirichlet-smoothed query likelihood (μ=2000), top-10 docs
    * per query over four fixed lexical queries. */
  def q165DirichletQl(s: SparkSession, d: String): DataFrame =
    graft.operators.Ranking.dirichletTopK(
      documents(s, d), "doc_id", "text", DirichletQueries)

  /** q166: MaxSim late interaction — 64-dim embeddings as 8×8-dim
    * "token" sub-vectors, queries = vec_id < 4, top-10 per query. */
  def q166MaxSim(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    graft.operators.Ranking.maxSimTopK(
      emb.filter(col("vec_id") < 4), "vec_id",
      emb, "vec_id", "embedding", tokens = 8, subDim = 8)
  }

  /** q167: sign-bit Hamming shortlist (depth 32) + exact cosine
    * rerank, queries = vec_id < 8, top-10 per query. */
  def q167HammingRetrieval(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    graft.operators.Ranking.signHammingTopK(
      emb.filter(col("vec_id") < 8), "vec_id",
      emb, "vec_id", "embedding")
  }

  /** q173: Moore-Lewis cross-entropy-difference selection — rank the
    * corpus by H_en-slice(d) − H_corpus(d) under add-one bigram LMs
    * (the classic intelligent-selection score DSIR descends from). */
  def q173MooreLewis(s: SparkSession, d: String): DataFrame =
    graft.operators.LanguageModel.mooreLewisScores(
      documents(s, d), "doc_id", "text", col("lang") === "en")

  /** q174: exact embedding covariance matrix (the whitening/PCA
    * input — [[graft.operators.Pca]]): d² cells regardless of corpus
    * size, every cross-row sum decimal-exact. The eigen/projection
    * half is PcaSpec territory (not SQL-expressible). */
  def q174EmbeddingCovariance(s: SparkSession, d: String): DataFrame =
    graft.operators.Pca.covariance(embeddings(s, d), "embedding")

  /** The q198/q216/q217 family's SHARED trained model — both leading
    * power axes ([[graft.operators.Pca.topTwoAxes]]), built ONCE per
    * corpus content and served from a persisted
    * [[graft.operators.ModelArtifacts]] table. The r8 registry
    * retrained the identical covariance + first-axis frames three
    * times (~33 s quiet at sf0.1 for the family); train-once/
    * serve-many is the deployment shape, and the fingerprint guard
    * makes staleness structurally impossible. */
  private def pcaAxes(s: SparkSession, d: String): DataFrame =
    // version "2" = the r11 unit-sum covariance arithmetic; the
    // version (not a name rotation) is what isolates artifacts
    // built by older code from this build's oracles
    graft.operators.ModelArtifacts.cached(s, "pca2",
      graft.operators.ModelArtifacts.contentFingerprint(s, d,
        Seq("embeddings.parquet")), version = "2") {
      graft.operators.Pca.topTwoAxes(embeddings(s, d), "embedding",
        iters = 8)
    }

  /** q198: leading principal axis by DISTRIBUTED power iteration
    * ([[graft.operators.Pca.topTwoAxes]] axis 1, served from the
    * shared [[pcaAxes]] artifact) — the scale path next to
    * q174/q177's driver-side Jacobi: 8 matvec rounds over the d²
    * covariance cells, max-abs normalized, fully SQL-replayable
    * (unlike the eigensolve, which needed the fixture-parquet gate). */
  def q198PowerIteration(s: SparkSession, d: String): DataFrame =
    pcaAxes(s, d).filter(col("axis") === 1)
      .select(col("i"), col("v"), col("lambda_inf"))
      .orderBy(col("i"))

  /** q216: SECOND principal axis by Hotelling deflation
    * ([[graft.operators.Pca.topTwoAxes]] axis 2, served from the
    * shared [[pcaAxes]] artifact) — C' = C − λ·(u uᵀ)/(uᵀu) with the
    * q198 axis as u, then the same 8-round iteration on C'; the
    * oracle replays both phases and the Rayleigh scalars exactly. */
  def q216SecondAxis(s: SparkSession, d: String): DataFrame =
    pcaAxes(s, d).filter(col("axis") === 2)
      .select(col("i"), col("v"), col("lambda_inf"))
      .orderBy(col("i"))

  /** q217: whitened 2-component projection
    * ([[graft.operators.Pca.whitenedProject2From]] over the shared
    * [[pcaAxes]] artifact) — each embedding's coordinates on the two
    * leading power axes scaled by 1/√λ; the oracle replays both axis
    * phases plus the projection pass. */
  def q217WhitenedProjection(s: SparkSession, d: String): DataFrame =
    graft.operators.Pca.whitenedProject2From(pcaAxes(s, d),
      embeddings(s, d), "vec_id", "embedding")

  /** CJK-aware token CTE over plain documents (the q101 device
    * without the multilingual fixture concat). */
  private val TokCtes: String =
    raw"""tl AS (
      |  SELECT doc_id, list_filter(regexp_split_to_array(
      |    regexp_replace(text,
      |      '([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}])',
      |      ' \1 ', 'g'),
      |    '[ \t\n\x{0B}\f\r\x{1C}-\x{1F}\x{85}\x{A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id,
      |    generate_subscripts(t, 1) - 1 AS pos,
      |    unnest(t) AS w
      |  FROM tl)""".stripMargin

  private val q164Oracle: String =
    s"""WITH $TokCtes,
       |big AS (
       |  SELECT a.doc_id, a.w AS w1, b.w AS w2
       |  FROM toks a JOIN toks b
       |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
       |bc AS (SELECT w1, w2, COUNT(*) AS cb FROM big GROUP BY 1, 2),
       |ctx AS (SELECT w1, SUM(cb) AS cw, COUNT(*) AS fw
       |        FROM bc GROUP BY 1),
       |bwt AS (SELECT w2, COUNT(*) AS bw FROM bc GROUP BY 1),
       |tt AS (SELECT COUNT(*) AS t FROM bc),
       |s AS (
       |  SELECT big.doc_id,
       |    -floor(ln(
       |      GREATEST(CAST(bc.cb AS DOUBLE) - 0.75, 0.0) / ctx.cw +
       |      ((0.75 * ctx.fw) / ctx.cw) *
       |        (CAST(bwt.bw AS DOUBLE) / tt.t)) * 1e9) / 1e9 AS s
       |  FROM big JOIN bc USING (w1, w2)
       |   JOIN ctx ON big.w1 = ctx.w1
       |   JOIN bwt ON big.w2 = bwt.w2
       |   CROSS JOIN tt)
       |SELECT doc_id, COUNT(*) AS n_bigrams,
       |  CAST(SUM(CAST(s AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
       |    AS mean_kn_surprisal
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val q165Oracle: String = {
    val qvals = DirichletQueries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")
    s"""WITH $TokCtes,
       |qt AS (SELECT * FROM (VALUES $qvals) AS v(qid, term)),
       |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
       |dlen AS (SELECT doc_id, SUM(tf) AS dlen FROM tf GROUP BY 1),
       |qcf AS (
       |  SELECT qt.qid, qt.term, SUM(tf.tf) AS cf
       |  FROM tf JOIN qt ON tf.w = qt.term GROUP BY 1, 2),
       |ctot AS (SELECT SUM(dlen) AS csz FROM dlen),
       |grid AS (
       |  SELECT q.qid, dl.doc_id AS doc, q.term,
       |    COALESCE(tf.tf, 0) AS tfv, q.cf, q.csz, dl.dlen
       |  FROM dlen dl CROSS JOIN (SELECT * FROM qcf CROSS JOIN ctot) q
       |  LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.w = q.term),
       |s AS (
       |  SELECT qid, doc,
       |    floor(ln((tfv + (2000.0 * cf) / csz) / (dlen + 2000.0))
       |      * 1e9) / 1e9 AS s
       |  FROM grid),
       |scored AS (
       |  SELECT qid, doc,
       |    CAST(SUM(CAST(s AS DECIMAL(18,9))) AS DOUBLE) AS ql_score
       |  FROM s GROUP BY 1, 2),
       |ranked AS (
       |  SELECT qid, doc, ql_score, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY ql_score DESC, doc) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, doc AS doc_id, ql_score FROM ranked
       |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  }

  private val q166Oracle: String =
    """WITH dt AS (
      |  SELECT vec_id AS cid, g.s AS di,
      |    CAST(embedding[g.s * 8 + 1 : g.s * 8 + 8] AS DOUBLE[]) AS dv
      |  FROM embeddings, range(0, 8) g(s)),
      |qt AS (
      |  SELECT vec_id AS qid, g.s AS qi,
      |    CAST(embedding[g.s * 8 + 1 : g.s * 8 + 8] AS DOUBLE[]) AS qv
      |  FROM embeddings, range(0, 8) g(s)
      |  WHERE vec_id < 4),
      |pm AS (
      |  SELECT qt.qid, dt.cid, qt.qi,
      |    MAX(list_dot_product(qt.qv, dt.dv)) AS mx
      |  FROM dt CROSS JOIN qt GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT qid, cid,
      |    CAST(SUM(CAST(floor(mx * 1e9) / 1e9 AS DECIMAL(18,9)))
      |      AS DOUBLE) AS maxsim_score
      |  FROM pm GROUP BY 1, 2),
      |ranked AS (
      |  SELECT qid, cid, maxsim_score, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY maxsim_score DESC, cid) AS rnk
      |  FROM scored)
      |SELECT qid, rnk, cid, maxsim_score FROM ranked
      |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  private val q167Oracle: String = {
    def word(off: Int): String =
      (0 until 32).map(j =>
        s"(CASE WHEN embedding[${off + j + 1}] > 0 THEN ${1L << j} " +
          "ELSE 0 END)").mkString(" + ")
    s"""WITH p AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
       |    ${word(0)} AS lo, ${word(32)} AS hi
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, e AS qe, lo AS qlo, hi AS qhi
       |      FROM p WHERE vec_id < 8),
       |ham AS (
       |  SELECT q.qid, p.vec_id AS cid, q.qe, p.e,
       |    bit_count(xor(q.qlo, p.lo)) + bit_count(xor(q.qhi, p.hi))
       |      AS hamming
       |  FROM p CROSS JOIN q),
       |short AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY hamming, cid) AS hrnk
       |  FROM ham QUALIFY hrnk <= 32),
       |rr AS (
       |  SELECT qid, cid, hamming,
       |    list_dot_product(qe, e) /
       |      (sqrt(list_dot_product(qe, qe)) *
       |       sqrt(list_dot_product(e, e))) AS score
       |  FROM short),
       |ranked AS (
       |  SELECT qid, cid, hamming, score, ROW_NUMBER() OVER (
       |    PARTITION BY qid ORDER BY score DESC, cid) AS rnk
       |  FROM rr)
       |SELECT qid, rnk, cid, hamming, score FROM ranked
       |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  }

  /** q316: CKA quantization audit ([[graft.operators.Cka]]) — how
    * much representation geometry does the q68 symmetric-int8
    * quantization keep? X = the raw embeddings, Y = their
    * dequantized int8 view (per-vector scale = max|x|/127, values
    * trunc9'd so the covariance build's decimal casts stay
    * engine-portable), CKA via one concatenated covariance pass.
    * Expected ≈ 1 − O(quant-noise²); the oracle replays the
    * quantization, both q174-style covariance passes, the block
    * sums, and the final ratio bit-exactly. */
  def q316CkaQuantization(s: SparkSession, d: String): DataFrame = {
    def t9x(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e9)).cast("double") / lit(1e9)
    val emb = embeddings(s, d)
      .select(col("embedding").cast("array<double>").as("e"))
      .withColumn("scale",
        aggregate(col("e"), lit(0.0), (a, x) => greatest(a, abs(x)))
          / 127.0)
      .withColumn("y", transform(col("e"), x =>
        when(col("scale") === 0.0, lit(0.0))
          .otherwise(t9x(round(x / col("scale")) * col("scale")))))
    graft.operators.Cka.linearCka(emb, col("e"), col("y"), d = 64)
  }

  private val q316Oracle: String =
    """WITH e0 AS (
      |  SELECT vec_id,
      |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
      |  FROM embeddings),
      |sc AS (
      |  SELECT vec_id, x,
      |    list_max(list_transform(x, v -> abs(v))) / 127.0e0
      |      AS scale
      |  FROM e0),
      |zz AS (
      |  SELECT vec_id, x || list_transform(x, v ->
      |    CASE WHEN scale = 0.0e0 THEN 0.0e0
      |      ELSE floor(round(v / scale) * scale * 1e9) / 1e9 END)
      |    AS z
      |  FROM sc),
      |xs AS (
      |  SELECT vec_id, generate_subscripts(z, 1) - 1 AS i,
      |    CAST(unnest(z) AS DOUBLE) AS v
      |  FROM zz),
      |mu AS (
      |  SELECT i, CAST(SUM(CAST(floor(v * 1e9) AS DECIMAL(30,0)))
      |      AS DOUBLE) / 1e9 / COUNT(*) AS mu
      |  FROM xs GROUP BY 1),
      |p AS (
      |  SELECT a.i AS i, b.i AS j, a.v * b.v AS p
      |  FROM xs a JOIN xs b ON a.vec_id = b.vec_id),
      |e AS (
      |  SELECT i, j, CAST(SUM(CAST(floor(p * 1e9) AS DECIMAL(30,0)))
      |      AS DOUBLE) / 1e9 / COUNT(*) AS exy
      |  FROM p GROUP BY 1, 2),
      |cells AS (
      |  SELECT e.i, e.j, e.exy - ma.mu * mb.mu AS cov
      |  FROM e JOIN mu ma ON e.i = ma.i JOIN mu mb ON e.j = mb.i),
      |sums AS (
      |  SELECT
      |    CAST(SUM(CAST(CASE WHEN i < 64 AND j >= 64
      |      THEN floor(cov * cov * 1e9) / 1e9 ELSE 0.0e0 END
      |      AS DECIMAL(38,9))) AS DOUBLE) AS hsic_xy,
      |    CAST(SUM(CAST(CASE WHEN i < 64 AND j < 64
      |      THEN floor(cov * cov * 1e9) / 1e9 ELSE 0.0e0 END
      |      AS DECIMAL(38,9))) AS DOUBLE) AS norm_xx,
      |    CAST(SUM(CAST(CASE WHEN i >= 64 AND j >= 64
      |      THEN floor(cov * cov * 1e9) / 1e9 ELSE 0.0e0 END
      |      AS DECIMAL(38,9))) AS DOUBLE) AS norm_yy
      |  FROM cells)
      |SELECT 64 AS dim, hsic_xy, norm_xx, norm_yy,
      |  hsic_xy / (sqrt(norm_xx) * sqrt(norm_yy)) AS cka
      |FROM sums""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q316_cka_quantization" -> (q316CkaQuantization _),
    "q164_kneser_ney" -> (q164KneserNey _),
    "q165_dirichlet_ql" -> (q165DirichletQl _),
    "q166_maxsim" -> (q166MaxSim _),
    "q167_hamming_retrieval" -> (q167HammingRetrieval _),
    "q173_moore_lewis" -> (q173MooreLewis _),
    "q174_embedding_covariance" -> (q174EmbeddingCovariance _),
    "q198_power_iteration" -> (q198PowerIteration _),
    "q216_second_axis" -> (q216SecondAxis _),
    "q217_whitened_projection" -> (q217WhitenedProjection _),
  )

  val oracle: Map[String, String] = Map(
    "q316_cka_quantization" -> q316Oracle,
    "q164_kneser_ney" -> q164Oracle,
    "q165_dirichlet_ql" -> q165Oracle,
    "q166_maxsim" -> q166Oracle,
    "q167_hamming_retrieval" -> q167Oracle,
    "q173_moore_lewis" -> q173Oracle,
    "q174_embedding_covariance" ->
      """WITH x AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |mu AS (
        |  SELECT i, CAST(SUM(CAST(floor(v * 1e9) AS DECIMAL(30,0)))
        |      AS DOUBLE) / 1e9 / COUNT(*) AS mu
        |  FROM x GROUP BY 1),
        |p AS (
        |  SELECT a.i AS i, b.i AS j, a.v * b.v AS p
        |  FROM x a JOIN x b ON a.vec_id = b.vec_id),
        |e AS (
        |  SELECT i, j, CAST(SUM(CAST(floor(p * 1e9) AS DECIMAL(30,0)))
        |      AS DOUBLE) / 1e9 / COUNT(*) AS exy
        |  FROM p GROUP BY 1, 2)
        |SELECT e.i, e.j, e.exy - ma.mu * mb.mu AS cov
        |FROM e JOIN mu ma ON e.i = ma.i JOIN mu mb ON e.j = mb.i
        |ORDER BY e.i, e.j""".stripMargin,
    "q198_power_iteration" -> q198Oracle,
    "q216_second_axis" -> q216Oracle,
    "q217_whitened_projection" -> q217Oracle,
  )

  /** 8 unrolled matvec rounds over the cell CTE `covName`, CTE
    * names prefixed `p`, each MATERIALIZED (the q163 lesson:
    * per-round CTEs are referenced twice — by the max and the
    * normalize — and default inlining re-evaluates the whole chain
    * exponentially). Expects a `${p}v0` init CTE. */
  private def piRounds(covName: String, p: String): String =
    (1 to 8).map { r =>
      s"""${p}w$r AS MATERIALIZED (
         |  SELECT cov.i,
         |    CAST(SUM(CAST(floor(cov.cov * v.v * 1e12) / 1e12
         |      AS DECIMAL(18,15))) AS DOUBLE) AS w
         |  FROM $covName cov JOIN ${p}v${r - 1} v ON cov.j = v.vi
         |  GROUP BY cov.i),
         |${p}m$r AS MATERIALIZED (
         |  SELECT MAX(abs(w)) AS m FROM ${p}w$r),
         |${p}v$r AS MATERIALIZED (
         |  SELECT i AS vi, floor(w / m * 1e12) / 1e12 AS v
         |  FROM ${p}w$r CROSS JOIN ${p}m$r)""".stripMargin
    }.mkString(",\n")

  /** q174's covariance CTE chain ending in `cov`. */
  // r11: integer 1e-9 unit sums (floor(v·1e9) is an exact BIGINT;
  // the DECIMAL(30,0) sum is order-free) — mirrors the
  // Pca.covariance rewrite that removed the per-row double→decimal
  // toString cast; the /1e9 /COUNT division sequence must match the
  // engine exactly.
  private lazy val covCtes: String =
    s"""x AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings),
       |mu AS (
       |  SELECT i, CAST(SUM(CAST(floor(v * 1e9) AS DECIMAL(30,0)))
       |      AS DOUBLE) / 1e9 / COUNT(*) AS mu
       |  FROM x GROUP BY 1),
       |p AS (
       |  SELECT a.i AS i, b.i AS j, a.v * b.v AS p
       |  FROM x a JOIN x b ON a.vec_id = b.vec_id),
       |e AS (
       |  SELECT i, j, CAST(SUM(CAST(floor(p * 1e9) AS DECIMAL(30,0)))
       |      AS DOUBLE) / 1e9 / COUNT(*) AS exy
       |  FROM p GROUP BY 1, 2),
       |cov AS MATERIALIZED (
       |  SELECT e.i, e.j, e.exy - ma.mu * mb.mu AS cov
       |  FROM e JOIN mu ma ON e.i = ma.i
       |  JOIN mu mb ON e.j = mb.i)""".stripMargin

  private lazy val q198Oracle: String =
    s"""WITH $covCtes,
       |v0 AS (SELECT DISTINCT i AS vi, 1e0 AS v FROM cov),
       |${piRounds("cov", "")}
       |SELECT v8.vi AS i, v8.v, floor(m8.m * 1e12) / 1e12
       |  AS lambda_inf
       |FROM v8 CROSS JOIN m8 ORDER BY i""".stripMargin

  /** Shared two-phase CTE chain: covariance, q198's 8 rounds, the
    * Rayleigh scalars s1/s2, the deflated cell table, and 8 more
    * rounds under the `b` prefix. */
  private lazy val twoAxisCtes: String =
    s"""$covCtes,
       |v0 AS (SELECT DISTINCT i AS vi, 1e0 AS v FROM cov),
       |${piRounds("cov", "")},
       |u AS MATERIALIZED (SELECT vi, v FROM v8),
       |s1 AS MATERIALIZED (
       |  SELECT CAST(SUM(CAST(floor(cov.cov * a.v * b.v * 1e12)
       |    / 1e12 AS DECIMAL(18,15))) AS DOUBLE) AS s1
       |  FROM cov JOIN u a ON cov.i = a.vi
       |  JOIN u b ON cov.j = b.vi),
       |s2 AS MATERIALIZED (
       |  SELECT CAST(SUM(CAST(floor(v * v * 1e12) / 1e12
       |    AS DECIMAL(18,15))) AS DOUBLE) AS s2
       |  FROM u),
       |kk AS MATERIALIZED (
       |  SELECT floor(s1 / (s2 * s2) * 1e12) / 1e12 AS k
       |  FROM s1 CROSS JOIN s2),
       |cov2 AS MATERIALIZED (
       |  SELECT cov.i, cov.j,
       |    floor((cov.cov - kk.k * a.v * b.v) * 1e12) / 1e12 AS cov
       |  FROM cov JOIN u a ON cov.i = a.vi
       |  JOIN u b ON cov.j = b.vi
       |  CROSS JOIN kk),
       |bv0 AS (SELECT DISTINCT i AS vi, 1e0 AS v FROM cov2),
       |${piRounds("cov2", "b")}""".stripMargin

  private lazy val q216Oracle: String =
    s"""WITH $twoAxisCtes
       |SELECT bv8.vi AS i, bv8.v, floor(bm8.m * 1e12) / 1e12
       |  AS lambda_inf
       |FROM bv8 CROSS JOIN bm8 ORDER BY i""".stripMargin

  /** q217 oracle: the two-phase chain + whitened projections —
    * per-embedding decimal-exact dot with each axis, scaled by
    * 1/√λ_inf. */
  private lazy val q217Oracle: String =
    s"""WITH $twoAxisCtes,
       |xx AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS xv
       |  FROM embeddings),
       |n1 AS (
       |  SELECT sqrt(CAST(SUM(CAST(floor(v * v * 1e12) / 1e12
       |    AS DECIMAL(18,15))) AS DOUBLE)) AS nrm
       |  FROM v8),
       |n2 AS (
       |  SELECT sqrt(CAST(SUM(CAST(floor(v * v * 1e12) / 1e12
       |    AS DECIMAL(18,15))) AS DOUBLE)) AS nrm
       |  FROM bv8),
       |pw1 AS (
       |  SELECT xx.vec_id,
       |    floor(CAST(SUM(CAST(floor(xx.xv * v.v * 1e12) / 1e12
       |      AS DECIMAL(18,15))) AS DOUBLE) /
       |      (ANY_VALUE(n1.nrm) *
       |        sqrt(floor(ANY_VALUE(m8.m) * 1e12) / 1e12)) * 1e12)
       |      / 1e12 AS w1
       |  FROM xx JOIN v8 v ON xx.i = v.vi CROSS JOIN m8
       |  CROSS JOIN n1
       |  GROUP BY xx.vec_id),
       |pw2 AS (
       |  SELECT xx.vec_id,
       |    floor(CAST(SUM(CAST(floor(xx.xv * v.v * 1e12) / 1e12
       |      AS DECIMAL(18,15))) AS DOUBLE) /
       |      (ANY_VALUE(n2.nrm) *
       |        sqrt(floor(ANY_VALUE(bm8.m) * 1e12) / 1e12)) * 1e12)
       |      / 1e12 AS w2
       |  FROM xx JOIN bv8 v ON xx.i = v.vi CROSS JOIN bm8
       |  CROSS JOIN n2
       |  GROUP BY xx.vec_id)
       |SELECT pw1.vec_id, pw1.w1, pw2.w2
       |FROM pw1 JOIN pw2 USING (vec_id) ORDER BY vec_id""".stripMargin

  private lazy val q173Oracle: String =
    raw"""WITH tl AS (
      |  SELECT doc_id, lang = 'en' AS tgt,
      |    list_filter(regexp_split_to_array(
      |    regexp_replace(text,
      |      '([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}])',
      |      ' \1 ', 'g'),
      |    '[ \t\n\x{0B}\f\r\x{1C}-\x{1F}\x{85}\x{A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+'),
      |    x -> len(x) > 0) AS t
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, tgt, generate_subscripts(t, 1) - 1 AS pos,
      |    unnest(t) AS w
      |  FROM tl),
      |big AS (
      |  SELECT a.doc_id, a.tgt, a.w AS w1, b.w AS w2
      |  FROM toks a JOIN toks b
      |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
      |sbi AS (SELECT w1, w2, COUNT(*) AS scb FROM big GROUP BY 1, 2),
      |suni AS (SELECT w, COUNT(*) AS scu FROM toks GROUP BY 1),
      |svoc AS (SELECT COUNT(DISTINCT w) AS sv FROM toks),
      |tbi AS (SELECT w1, w2, COUNT(*) AS tcb FROM big
      |        WHERE tgt GROUP BY 1, 2),
      |tuni AS (SELECT w, COUNT(*) AS tcu FROM toks
      |         WHERE tgt GROUP BY 1),
      |tvoc AS (SELECT COUNT(DISTINCT w) AS tv FROM toks WHERE tgt),
      |s AS (
      |  SELECT big.doc_id,
      |    -floor(ln(CAST(COALESCE(sbi.scb, 0) + 1 AS DOUBLE) /
      |      CAST(COALESCE(suni.scu, 0) + svoc.sv AS DOUBLE)) * 1e9)
      |      / 1e9 AS ss,
      |    -floor(ln(CAST(COALESCE(tbi.tcb, 0) + 1 AS DOUBLE) /
      |      CAST(COALESCE(tuni.tcu, 0) + tvoc.tv AS DOUBLE)) * 1e9)
      |      / 1e9 AS st
      |  FROM big
      |  LEFT JOIN sbi ON big.w1 = sbi.w1 AND big.w2 = sbi.w2
      |  LEFT JOIN suni ON big.w1 = suni.w
      |  LEFT JOIN tbi ON big.w1 = tbi.w1 AND big.w2 = tbi.w2
      |  LEFT JOIN tuni ON big.w1 = tuni.w
      |  CROSS JOIN svoc CROSS JOIN tvoc)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(CAST(st AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
      |    AS h_target,
      |  CAST(SUM(CAST(ss AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
      |    AS h_source,
      |  CAST(SUM(CAST(st AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) -
      |  CAST(SUM(CAST(ss AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)
      |    AS ml_score
      |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
