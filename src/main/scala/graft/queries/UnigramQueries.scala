package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.operators.Unigram

/** Unigram-LM tokenizer suite ([[graft.operators.Unigram]]): the
  * SentencePiece-style trainable tokenizer gated end to end — seed
  * vocabulary, Viterbi E-step, EM M-step, and the full E→M→E loop
  * with corpus compression stats — each replayed value-exactly by
  * the oracle (the Viterbi DP replays as a DuckDB list_reduce fold,
  * the q82 state-machine device, instantiated once per vocabulary
  * via [[dpCtes]]). */
object UnigramQueries {

  private def corpusWords(s: SparkSession, d: String): DataFrame =
    Unigram.words(documents(s, d), "text")

  /** q204: Viterbi segmentation of every distinct corpus word under
    * the substring-frequency seed vocabulary — the unigram E-step.
    * Output: (w, wcnt, total_cost, n_pieces, seg). */
  def q204UnigramSegment(s: SparkSession, d: String): DataFrame = {
    val w = corpusWords(s, d)
    Unigram.segment(w, Unigram.seedVocab(w)).orderBy(col("w"))
  }

  /** q205: one EM M-step — piece usage under the q204 segmentation,
    * zero-usage pieces pruned, survivors re-scored. Output:
    * (piece, usage, cost). */
  def q205UnigramEmStep(s: SparkSession, d: String): DataFrame = {
    val w = corpusWords(s, d)
    Unigram.emStep(w, Unigram.seedVocab(w)).orderBy(col("piece"))
  }

  /** q210: the full train-apply loop — segment under the EM-stepped
    * vocabulary (the second E-step) and report corpus compression:
    * vocab sizes, total word occurrences, total pieces under the
    * seed vs trained vocab, and trained pieces-per-word. One row;
    * every number is an exact integer sum except the final IEEE
    * division. */
  def q210UnigramCompression(s: SparkSession,
      d: String): DataFrame = {
    val w = corpusWords(s, d)
    val v1 = Unigram.seedVocab(w)
    val v2 = Unigram.emStep(w, v1)
    val s1 = Unigram.segment(w, v1)
    val s2 = Unigram.segment(w, v2)
    val c1 = v1.agg(count(lit(1)).as("vocab_seed"))
    val c2 = v2.agg(count(lit(1)).as("vocab_em"))
    val a1 = s1.agg(sum(col("wcnt")).as("words_total"),
      sum(col("wcnt") * col("n_pieces")).as("pieces_seed"))
    val a2 = s2.agg(sum(col("wcnt") * col("n_pieces"))
      .as("pieces_em"))
    c1.crossJoin(broadcast(c2)).crossJoin(broadcast(a1))
      .crossJoin(broadcast(a2))
      .select(col("vocab_seed"), col("vocab_em"),
        col("words_total"), col("pieces_seed"), col("pieces_em"),
        (col("pieces_em").cast("double") / col("words_total"))
          .as("pieces_per_word_em"))
  }

  /** Shared oracle base: words → substring frequencies → seed
    * vocabulary with ln9 costs. */
  private val baseCtes: String =
    """wr AS (
      |  SELECT unnest(list_filter(string_split(text, ' '),
      |    x -> len(x) > 0)) AS w
      |  FROM documents),
      |words AS (
      |  SELECT w, COUNT(*) AS wcnt FROM wr WHERE len(w) <= 20
      |  GROUP BY 1),
      |subs AS (
      |  SELECT w.w, w.wcnt, CAST(s.s AS INT) AS s, CAST(l.l AS INT)
      |      AS l,
      |    substr(w.w, CAST(s.s AS INT) + 1, CAST(l.l AS INT))
      |      AS piece
      |  FROM words w
      |  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS s) s
      |  CROSS JOIN (SELECT unnest(generate_series(1, 6)) AS l) l
      |  WHERE s.s + l.l <= len(w.w)),
      |freq AS (
      |  SELECT piece, CAST(SUM(wcnt) AS BIGINT) AS freq FROM subs
      |  GROUP BY 1),
      |vocab0 AS (
      |  SELECT piece, freq FROM freq WHERE len(piece) = 1
      |  UNION ALL
      |  SELECT piece, freq FROM (
      |    SELECT piece, freq FROM freq
      |    WHERE len(piece) >= 2 AND freq >= 4
      |    ORDER BY freq DESC, piece LIMIT 2048)),
      |tot AS (SELECT SUM(freq) AS tot FROM vocab0),
      |vocab AS (
      |  SELECT piece, freq,
      |    floor(ln(tot) * 1e9) / 1e9 - floor(ln(freq) * 1e9) / 1e9
      |      AS cost
      |  FROM vocab0 CROSS JOIN tot)""".stripMargin

  /** One Viterbi instantiation (matches → DP fold → backpointer
    * walk → segmentation) against the vocabulary CTE `vocab`,
    * with all four CTE names suffixed `sfx`. The list_reduce folds
    * iterate a dummy-padded list whose head is the init state
    * (list_reduce has no separate init argument) — and the
    * accumulator must stay a LIST (the q204 device): DuckDB 1.0
    * mis-evaluates plain-STRUCT accumulators in list_reduce. */
  private def dpCtes(sfx: String, vocab: String): String =
    s"""matches$sfx AS (
       |  SELECT w.w, w.wcnt, CAST(len(w.w) AS INT) AS n,
       |    COALESCE(m.ms, CAST([] AS
       |      STRUCT(s INTEGER, e INTEGER, "cost" DOUBLE)[])) AS ms
       |  FROM words w LEFT JOIN (
       |    SELECT subs.w,
       |      list(struct_pack(s := subs.s, e := subs.s + subs.l,
       |        cost := v.cost) ORDER BY subs.s, subs.l) AS ms
       |    FROM subs JOIN $vocab v USING (piece)
       |    GROUP BY subs.w) m USING (w)),
       |dp$sfx AS (
       |  SELECT w, wcnt, n, ms,
       |    list_reduce(
       |      list_prepend(
       |        [struct_pack(cost := CAST(0.0 AS DOUBLE),
       |          frm := CAST(-1 AS INT))],
       |        list_transform(generate_series(1, n), j ->
       |          CAST(NULL AS STRUCT("cost" DOUBLE, frm INTEGER)[]))),
       |      (acc, x) -> list_append(acc,
       |        COALESCE(
       |          (list_sort(list_transform(
       |            list_filter(ms, m -> m.e = len(acc)),
       |            m -> struct_pack(
       |              cost := acc[m.s + 1].cost + m.cost,
       |              frm := m.s))))[1],
       |          struct_pack(cost := CAST('infinity' AS DOUBLE),
       |            frm := -2)))) AS best
       |  FROM matches$sfx),
       |bt$sfx AS (
       |  SELECT w, wcnt, n, best,
       |    list_reduce(
       |      list_prepend(
       |        [struct_pack(pos := n,
       |          pieces := CAST([] AS VARCHAR[]))],
       |        list_transform(generate_series(1, n), j ->
       |          CAST(NULL AS STRUCT(pos INTEGER, pieces VARCHAR[])[]))),
       |      (acc, x) -> list_append(acc,
       |        CASE WHEN acc[len(acc)].pos > 0
       |            AND best[acc[len(acc)].pos + 1].cost <
       |              CAST('infinity' AS DOUBLE) THEN
       |          struct_pack(
       |            pos := best[acc[len(acc)].pos + 1].frm,
       |            pieces := list_prepend(
       |              substr(w, best[acc[len(acc)].pos + 1].frm + 1,
       |                acc[len(acc)].pos -
       |                  best[acc[len(acc)].pos + 1].frm),
       |              acc[len(acc)].pieces))
       |        ELSE acc[len(acc)] END)) AS walk
       |  FROM dp$sfx),
       |seg$sfx AS (
       |  SELECT w, wcnt, best[n + 1].cost AS total_cost,
       |    CAST(len(walk[n + 1].pieces) AS BIGINT) AS n_pieces,
       |    array_to_string(walk[n + 1].pieces, ' ') AS seg
       |  FROM bt$sfx)""".stripMargin

  /** The M-step CTEs: usage under seg → pruned, re-scored vocab2. */
  private val emCtes: String =
    """usage AS (
      |  SELECT unnest(string_split(seg.seg, ' ')) AS piece,
      |    seg.wcnt
      |  FROM seg),
      |u AS (
      |  SELECT piece, CAST(SUM(wcnt) AS BIGINT) AS usage FROM usage
      |  GROUP BY 1),
      |ut AS (SELECT SUM(usage) AS tot FROM u)""".stripMargin

  private val q204Oracle: String =
    s"""WITH $baseCtes,
       |${dpCtes("", "vocab")}
       |SELECT w, wcnt, total_cost, n_pieces, seg FROM seg
       |ORDER BY w""".stripMargin

  private val q205Oracle: String =
    s"""WITH $baseCtes,
       |${dpCtes("", "vocab")},
       |$emCtes
       |SELECT piece, usage,
       |  floor(ln(tot) * 1e9) / 1e9 - floor(ln(usage) * 1e9) / 1e9
       |    AS cost
       |FROM u CROSS JOIN ut
       |ORDER BY piece""".stripMargin

  private val q210Oracle: String =
    s"""WITH $baseCtes,
       |${dpCtes("", "vocab")},
       |$emCtes,
       |vocab2 AS (
       |  SELECT piece,
       |    floor(ln(tot) * 1e9) / 1e9 -
       |      floor(ln(usage) * 1e9) / 1e9 AS cost
       |  FROM u CROSS JOIN ut),
       |${dpCtes("2", "vocab2")}
       |SELECT
       |  (SELECT COUNT(*) FROM vocab) AS vocab_seed,
       |  (SELECT COUNT(*) FROM vocab2) AS vocab_em,
       |  (SELECT CAST(SUM(wcnt) AS BIGINT) FROM seg)
       |    AS words_total,
       |  (SELECT CAST(SUM(wcnt * n_pieces) AS BIGINT) FROM seg)
       |    AS pieces_seed,
       |  (SELECT CAST(SUM(wcnt * n_pieces) AS BIGINT) FROM seg2)
       |    AS pieces_em,
       |  CAST((SELECT CAST(SUM(wcnt * n_pieces) AS BIGINT)
       |      FROM seg2) AS DOUBLE) /
       |    (SELECT CAST(SUM(wcnt) AS BIGINT) FROM seg)
       |    AS pieces_per_word_em""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q204_unigram_segment" -> (q204UnigramSegment _),
    "q205_unigram_em_step" -> (q205UnigramEmStep _),
    "q210_unigram_compression" -> (q210UnigramCompression _),
  )

  val oracle: Map[String, String] = Map(
    "q204_unigram_segment" -> q204Oracle,
    "q205_unigram_em_step" -> q205Oracle,
    "q210_unigram_compression" -> q210Oracle,
  )
}
