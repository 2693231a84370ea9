package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.operators.Unigram

/** Unigram-LM tokenizer suite ([[graft.operators.Unigram]]): the
  * SentencePiece-style trainable tokenizer gated end to end — seed
  * vocabulary, Viterbi E-step, and EM M-step each replayed
  * value-exactly by the oracle (the Viterbi DP replays as a DuckDB
  * list_reduce fold, the q82 state-machine device). */
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

  /** Shared oracle CTEs: words → substring seed vocab → per-word
    * match lists → Viterbi DP fold → backpointer walk. The
    * list_reduce folds iterate a dummy-padded list whose head is the
    * init state (list_reduce has no separate init argument); every
    * numbered CTE mirrors the engine stage of the same name. */
  private val viterbiCtes: String =
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
      |  FROM vocab0 CROSS JOIN tot),
      |matches AS (
      |  SELECT subs.w, subs.wcnt, CAST(len(subs.w) AS INT) AS n,
      |    list(struct_pack(s := subs.s, e := subs.s + subs.l,
      |      cost := v.cost) ORDER BY subs.s, subs.l) AS ms
      |  FROM subs JOIN vocab v USING (piece)
      |  GROUP BY 1, 2, 3),
      |dp AS (
      |  SELECT w, wcnt, n, ms,
      |    list_reduce(
      |      list_prepend(
      |        [struct_pack(cost := CAST(0.0 AS DOUBLE),
      |          frm := CAST(-1 AS INT))],
      |        list_transform(generate_series(1, n), j ->
      |          CAST(NULL AS STRUCT("cost" DOUBLE, frm INTEGER)[]))),
      |      (acc, x) -> list_append(acc,
      |        (list_sort(list_transform(
      |          list_filter(ms, m -> m.e = len(acc)),
      |          m -> struct_pack(
      |            cost := acc[m.s + 1].cost + m.cost,
      |            frm := m.s))))[1])) AS best
      |  FROM matches),
      |bt AS (
      |  SELECT w, wcnt, n, best,
      |    list_reduce(
      |      list_prepend(
      |        [struct_pack(pos := n,
      |          pieces := CAST([] AS VARCHAR[]))],
      |        list_transform(generate_series(1, n), j ->
      |          CAST(NULL AS STRUCT(pos INTEGER, pieces VARCHAR[])[]))),
      |      (acc, x) -> list_append(acc,
      |        CASE WHEN acc[len(acc)].pos > 0 THEN
      |          struct_pack(
      |            pos := best[acc[len(acc)].pos + 1].frm,
      |            pieces := list_prepend(
      |              substr(w, best[acc[len(acc)].pos + 1].frm + 1,
      |                acc[len(acc)].pos -
      |                  best[acc[len(acc)].pos + 1].frm),
      |              acc[len(acc)].pieces))
      |        ELSE acc[len(acc)] END)) AS walk
      |  FROM dp),
      |seg AS (
      |  SELECT w, wcnt, best[n + 1].cost AS total_cost,
      |    CAST(len(walk[n + 1].pieces) AS BIGINT) AS n_pieces,
      |    array_to_string(walk[n + 1].pieces, ' ') AS seg
      |  FROM bt)""".stripMargin

  private val q204Oracle: String =
    s"""WITH $viterbiCtes
       |SELECT w, wcnt, total_cost, n_pieces, seg FROM seg
       |ORDER BY w""".stripMargin

  private val q205Oracle: String =
    s"""WITH $viterbiCtes,
       |usage AS (
       |  SELECT unnest(string_split(seg.seg, ' ')) AS piece,
       |    seg.wcnt
       |  FROM seg),
       |u AS (
       |  SELECT piece, CAST(SUM(wcnt) AS BIGINT) AS usage FROM usage
       |  GROUP BY 1),
       |ut AS (SELECT SUM(usage) AS tot FROM u)
       |SELECT piece, usage,
       |  floor(ln(tot) * 1e9) / 1e9 - floor(ln(usage) * 1e9) / 1e9
       |    AS cost
       |FROM u CROSS JOIN ut
       |ORDER BY piece""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q204_unigram_segment" -> (q204UnigramSegment _),
    "q205_unigram_em_step" -> (q205UnigramEmStep _),
  )

  val oracle: Map[String, String] = Map(
    "q204_unigram_segment" -> q204Oracle,
    "q205_unigram_em_step" -> q205Oracle,
  )
}
