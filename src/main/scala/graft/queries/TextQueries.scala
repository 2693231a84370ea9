package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Text-analysis + dedup surface over the `documents` table (builder
  * brief: dedup family, token counting, quality scoring — the
  * training-data-pipeline extensions; reference analogs F6/F7/F8 in
  * `utils/text_utils.py` and dedup D2).
  */
object TextQueries {

  val StopWords: Seq[String] = Seq("the", "a")

  /** Shared with the q54 oracle so the SQL formula tracks the
    * chunker's defaults. */
  private val ChunkBudget = graft.operators.Chunker.DefaultBudget
  private val ChunkStep =
    ChunkBudget - graft.operators.Chunker.DefaultOverlap

  /** Language × source distribution (A6 content-distribution analog,
    * `analytics.md:205-222`). */
  def q23LangDistribution(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        (sum(col("n_chars")).cast("double") / count(lit(1)))
          .as("avg_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"))

  /** Per-document token statistics (F6 token counting + F7 uniqueness
    * — `text_utils.py:142-168`). */
  def q24TokenStats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(tokens(col("text")))).as("n_uniq"),
        uniqueWordRatio(col("text")).as("uniq_ratio"))
      .orderBy(col("doc_id"))

  /** Corpus word frequency, top 50 (explode + groupBy — the C-family
    * flatMap shape). */
  def q25WordFreq(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("word"))
      .limit(50)

  /** Per-document quality features for training-data filtering
    * (quality-scoring extension; deterministic double arithmetic). */
  def q26DocQuality(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        meanWordLength(col("text")).as("mean_word_len"),
        stopwordRatio(col("text"), StopWords).as("stopword_ratio"),
        punctCount(col("text")).as("n_punct"))
      .orderBy(col("doc_id"))

  /** Exact dedup by content hash (D2 idempotent-upsert analog):
    * representative = lowest doc_id per md5(text). */
  def q27ExactDedup(s: SparkSession, d: String): DataFrame =
    Dedup.exactDedup(documents(s, d), "doc_id", "text")
      .orderBy(col("content_hash"))

  /** Top near-duplicate pairs by exact 3-gram Jaccard over an inverted
    * shingle index with a document-frequency skew cap. */
  def q28JaccardPairs(s: SparkSession, d: String): DataFrame =
    Dedup.jaccardPairs(documents(s, d), "doc_id", "text",
      shingleN = 3, maxDf = 50)
      .orderBy(desc("jaccard"), col("id_a"), col("id_b"))
      .limit(100)

  /** MinHash LSH banding (16 hashes, 4 bands): per-doc band hashes —
    * docs sharing a band hash are near-dup candidates. */
  def q29MinhashBands(s: SparkSession, d: String): DataFrame =
    Dedup.minhashBands(documents(s, d), "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4)
      .orderBy(col("doc_id"), col("band"))

  /** 60-bit SimHash fingerprints (term-frequency-weighted bit votes
    * over md5-derived token hashes). */
  def q30Simhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhash(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Chunker window math, oracle-checked: per-document chunk counts
    * from the real ingest must equal the closed-form window count
    * 1 + ceil(max(0, n−budget)/step) the SQL oracle computes
    * (documents have no headers, so each is one section). */
  def q54ChunkCounts(s: SparkSession, d: String): DataFrame =
    graft.operators.Ingest.ingestMarkdown(
      documents(s, d).select(
        concat(lit("doc"), col("doc_id"), lit(".md")).as("source_file"),
        col("text")))
      .groupBy(col("source_file"))
      .agg(count(lit(1)).as("n_chunks"))
      .orderBy(col("source_file"))

  /** Quality-predicate truth table over the corpus, oracle-checked:
    * the F6/F7/F8/F9 thresholds computed by the engine's column
    * expressions must match the SQL re-derivation row for row. */
  def q55QualityGate(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      isLowQuality(col("text")).as("is_low"),
      isRepetitive(col("text")).as("is_repetitive"),
      hasAbnormalWordLengths(col("text")).as("is_abnormal"),
      isBadOcr(col("text")).as("is_bad"))
      .orderBy(col("doc_id"))

  /** SimHash near-dup candidates: closest 100 document pairs by
    * Hamming distance over the 60-bit fingerprints (bitwise XOR +
    * popcount; the banding-free exhaustive check the LSH variants
    * approximate). */
  def q56SimhashPairs(s: SparkSession, d: String): DataFrame = {
    val h = Dedup.simhash(documents(s, d), "doc_id", "text")
    val a = h.select(col("doc_id").as("id_a"), col("simhash").as("h_a"))
    val b = h.select(col("doc_id").as("id_b"), col("simhash").as("h_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .orderBy(col("hamming"), col("id_a"), col("id_b"))
      .limit(100)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_chunk_counts" -> (q54ChunkCounts _),
    "q55_quality_gate" -> (q55QualityGate _),
    "q56_simhash_pairs" -> (q56SimhashPairs _),
    "q23_lang_distribution" -> (q23LangDistribution _),
    "q24_token_stats" -> (q24TokenStats _),
    "q25_word_freq" -> (q25WordFreq _),
    "q26_doc_quality" -> (q26DocQuality _),
    "q27_exact_dedup" -> (q27ExactDedup _),
    "q28_jaccard_pairs" -> (q28JaccardPairs _),
    "q29_minhash_bands" -> (q29MinhashBands _),
    "q30_simhash" -> (q30Simhash _),
  )

  val oracle: Map[String, String] = Map(
    "q56_simhash_pairs" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS t
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  ('0x' || substr(md5(t), 1, 15))::UBIGINT AS hv FROM tok),
        |votes AS (
        | SELECT doc_id, b,
        |  SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        | FROM h, (SELECT unnest(generate_series(0, 59)) AS b)
        | GROUP BY 1, 2),
        |sh AS (
        | SELECT doc_id,
        |  CAST(SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << b)
        |    ELSE 0 END) AS BIGINT) AS simhash
        | FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | bit_count(xor(a.simhash, b.simhash)) AS hamming
        |FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |ORDER BY hamming, id_a, id_b LIMIT 100""".stripMargin,
    "q54_chunk_counts" ->
      s"""SELECT 'doc' || CAST(doc_id AS VARCHAR) || '.md' AS source_file,
        | CASE WHEN len(string_split(text, ' ')) <= $ChunkBudget THEN 1
        |   ELSE 1 + CAST(CEIL(
        |     (len(string_split(text, ' ')) - $ChunkBudget)
        |       / $ChunkStep.0) AS BIGINT)
        |   END AS n_chunks
        |FROM documents ORDER BY source_file""".stripMargin,
    "q55_quality_gate" ->
      """WITH f AS (
        | SELECT doc_id, string_split(text, ' ') AS t,
        |        regexp_matches(text, '[âã¢£™žÂÃ]') AS corrupt
        | FROM documents),
        |m AS (
        | SELECT doc_id, corrupt, len(t) AS n,
        |  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS uniq_ratio,
        |  CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
        |    / len(t) AS mean_len,
        |  CAST(len(list_filter(t, x -> len(x) > 30)) AS DOUBLE)
        |    / len(t) AS long_frac
        | FROM f)
        |SELECT doc_id, n AS n_tokens,
        | n < 5 AS is_low,
        | (n > 10 AND uniq_ratio < 0.2) AS is_repetitive,
        | (mean_len < 2.0 OR mean_len > 20.0 OR long_frac > 0.1)
        |   AS is_abnormal,
        | (corrupt OR n < 5 OR (n > 10 AND uniq_ratio < 0.2)
        |  OR mean_len < 2.0 OR mean_len > 20.0 OR long_frac > 0.1)
        |   AS is_bad
        |FROM m ORDER BY doc_id""".stripMargin,
    "q23_lang_distribution" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | COUNT(DISTINCT source) AS n_sources,
        | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        | MAX(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q24_token_stats" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | len(list_distinct(string_split(text, ' '))) AS n_uniq,
        | CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS uniq_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q25_word_freq" ->
      """SELECT word, COUNT(*) AS n FROM (
        | SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 50""".stripMargin,
    "q26_doc_quality" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | CAST(list_sum(list_transform(string_split(text, ' '),
        |     x -> len(x))) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS mean_word_len,
        | CAST(len(list_filter(string_split(text, ' '),
        |     x -> x IN ('the', 'a'))) AS DOUBLE)
        |   / len(string_split(text, ' ')) AS stopword_ratio,
        | CAST(len(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS BIGINT)
        |   AS n_punct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q27_exact_dedup" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id,
        | COUNT(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "q28_jaccard_pairs" ->
      """WITH sh AS (
        | SELECT DISTINCT doc_id, unnest(list_transform(
        |   generate_series(1, len(string_split(text,' ')) - 2),
        |   i -> string_split(text,' ')[i] || ' ' ||
        |        string_split(text,' ')[i+1] || ' ' ||
        |        string_split(text,' ')[i+2])) AS s
        | FROM documents WHERE len(string_split(text,' ')) >= 3),
        |kept AS (
        | SELECT doc_id, s FROM sh WHERE s IN (
        |   SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 50)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
        |common AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        | FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT id_a, id_b, common,
        | CAST(common AS DOUBLE) / (x.n + y.n - common) AS jaccard
        |FROM common JOIN sizes x ON id_a = x.doc_id
        | JOIN sizes y ON id_b = y.doc_id
        |ORDER BY jaccard DESC, id_a, id_b LIMIT 100""".stripMargin,
    "q29_minhash_bands" ->
      s"""WITH sh AS (
        | SELECT doc_id, list_distinct(list_transform(
        |   generate_series(1, len(string_split(text,' ')) - 2),
        |   i -> string_split(text,' ')[i] || ' ' ||
        |        string_split(text,' ')[i+1] || ' ' ||
        |        string_split(text,' ')[i+2])) AS ss
        | FROM documents WHERE len(string_split(text,' ')) >= 3),
        |hs AS (
        | SELECT doc_id, list_transform(ss,
        |   s -> ('0x' || substr(md5(s), 1, 7))::UBIGINT::BIGINT) AS hv
        | FROM sh WHERE len(ss) > 0),
        |mh AS (
        | SELECT doc_id, list_transform(generate_series(0, 15),
        |   p -> list_min(list_transform(hv, h ->
        |     ((${Dedup.MhA1}*p + ${Dedup.MhA0}) * h
        |      + (${Dedup.MhB1}*p + ${Dedup.MhB0}))
        |      % ${Dedup.MhMod}))) AS sig
        | FROM hs)
        |SELECT doc_id, band,
        | md5(CAST(sig[band*4+1] AS VARCHAR) || '|' ||
        |     CAST(sig[band*4+2] AS VARCHAR) || '|' ||
        |     CAST(sig[band*4+3] AS VARCHAR) || '|' ||
        |     CAST(sig[band*4+4] AS VARCHAR)) AS band_hash
        |FROM mh, (SELECT unnest(generate_series(0, 3)) AS band)
        |ORDER BY doc_id, band""".stripMargin,
    "q30_simhash" ->
      """WITH tok AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS t
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  ('0x' || substr(md5(t), 1, 15))::UBIGINT AS hv FROM tok),
        |votes AS (
        | SELECT doc_id, b,
        |  SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
        | FROM h, (SELECT unnest(generate_series(0, 59)) AS b)
        | GROUP BY 1, 2)
        |SELECT doc_id,
        | CAST(SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << b)
        |   ELSE 0 END) AS BIGINT) AS simhash
        |FROM votes GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  )
}
