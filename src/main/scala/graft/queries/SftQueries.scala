package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.operators.{Corpus, Fim, Sft}

/** Fine-tuning data-materialization suite: fill-in-the-middle
  * splits ([[graft.operators.Fim]]), chat-template rendering with
  * loss-mask boundaries, and preference-pair assembly
  * ([[graft.operators.Sft]]) — the record constructors that sit
  * between corpus curation and the trainer. Every hash decision,
  * cut point, rendered string, and tie-break is replayed
  * value-exactly by the DuckDB oracle. */
object SftQueries {

  /** q206: FIM materialization over the corpus — 50% transform
    * rate, 50/50 PSM/SPM among transformed, character-level cuts;
    * the oracle replays every hash, both cuts, and the full
    * rendered string (gated via its md5 too). */
  def q206FimTransform(s: SparkSession, d: String): DataFrame =
    Fim.transform(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q206Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, text, CAST(len(text) AS BIGINT) AS n
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, text, n,
      |    ('0x' || substr(md5('fim:a:' || doc_id), 1, 8))
      |      ::UBIGINT::BIGINT % (n + 1) AS c1,
      |    ('0x' || substr(md5('fim:b:' || doc_id), 1, 8))
      |      ::UBIGINT::BIGINT % (n + 1) AS c2,
      |    ('0x' || substr(md5('fim:r:' || doc_id), 1, 8))
      |      ::UBIGINT::BIGINT % 1000 < 500 AS do_fim,
      |    ('0x' || substr(md5('fim:s:' || doc_id), 1, 8))
      |      ::UBIGINT::BIGINT % 1000 < 500 AS do_spm
      |  FROM d),
      |c AS (
      |  SELECT *, LEAST(c1, c2) AS lo, GREATEST(c1, c2) AS hi
      |  FROM h),
      |p AS (
      |  SELECT doc_id, text, n, do_fim, do_spm, lo, hi,
      |    substr(text, 1, CAST(lo AS INT)) AS pre,
      |    substr(text, CAST(lo AS INT) + 1, CAST(hi - lo AS INT))
      |      AS mid,
      |    substr(text, CAST(hi AS INT) + 1) AS suf
      |  FROM c),
      |r AS (
      |  SELECT doc_id,
      |    CASE WHEN NOT do_fim THEN 'plain'
      |      WHEN do_spm THEN 'spm' ELSE 'psm' END AS mode,
      |    CASE WHEN do_fim THEN lo END AS cut_lo,
      |    CASE WHEN do_fim THEN hi END AS cut_hi,
      |    n AS n_chars,
      |    CASE WHEN NOT do_fim THEN text
      |      WHEN do_spm THEN '<fim_suffix>' || suf ||
      |        '<fim_prefix>' || pre || '<fim_middle>' || mid
      |      ELSE '<fim_prefix>' || pre ||
      |        '<fim_suffix>' || suf || '<fim_middle>' || mid
      |    END AS rendered
      |  FROM p)
      |SELECT doc_id, mode, cut_lo, cut_hi, n_chars, rendered,
      |  md5(rendered) AS rendered_md5
      |FROM r ORDER BY doc_id""".stripMargin

  /** q207: chat-template SFT records — first 12 whitespace tokens
    * as the user turn, remainder as the assistant turn, 1-based
    * loss-mask character boundary; too-short docs dropped. */
  def q207SftRender(s: SparkSession, d: String): DataFrame =
    Sft.renderChat(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  private val q207Oracle: String =
    """WITH tl AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |    x -> len(x) > 0) AS t
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens
      |  FROM tl WHERE len(t) > 12),
      |r AS (
      |  SELECT doc_id, n_tokens, n_tokens - 12 AS response_tokens,
      |    '<|system|>' || chr(10) || 'You are a helpful assistant.'
      |      || chr(10) || '<|user|>' || chr(10) ||
      |      array_to_string(t[1:12], ' ') || chr(10) ||
      |      '<|assistant|>' || chr(10) AS head,
      |    array_to_string(t[13:], ' ') AS resp
      |  FROM f)
      |SELECT doc_id, n_tokens, response_tokens,
      |  head || resp || '<|end|>' AS rendered,
      |  CAST(len(head) + 1 AS BIGINT) AS loss_start,
      |  md5(head || resp || '<|end|>') AS rendered_md5
      |FROM r ORDER BY doc_id""".stripMargin

  /** q208: preference pairs per (lang, source) under the Flesch
    * reading-ease score ([[Corpus.readabilityStats]], the q189
    * scorer): chosen = most readable (ties → smaller doc_id),
    * rejected = least readable (ties → larger doc_id) — one
    * map-side-combining aggregation, no window, no self-join. */
  def q208PreferencePairs(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val scored = Corpus.readabilityStats(docs, "doc_id", "text")
      .filter(col("flesch").isNotNull)
      .join(docs.select(col("doc_id"), col("lang"), col("source")),
        "doc_id")
    Sft.preferencePairs(scored, Seq("lang", "source"), "doc_id",
        "flesch")
      .orderBy(col("lang"), col("source"))
  }

  private val q208Oracle: String =
    """WITH c AS (
      |  SELECT doc_id, lang, source,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
      |      AS BIGINT) AS words,
      |    GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT)) AS sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS syllables
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id, lang, source,
      |    floor((CAST(206.835 AS DOUBLE) -
      |      CAST(1.015 AS DOUBLE) *
      |        (CAST(words AS DOUBLE) / sentences) -
      |      CAST(84.6 AS DOUBLE) *
      |        (CAST(syllables AS DOUBLE) / words)) * 1e9) / 1e9
      |      AS flesch
      |  FROM c WHERE words > 0),
      |rk AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY flesch DESC, doc_id ASC) AS rc,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY flesch ASC, doc_id DESC) AS rr,
      |    COUNT(*) OVER (PARTITION BY lang, source) AS group_size
      |  FROM sc)
      |SELECT ch.lang, ch.source, ch.doc_id AS chosen_id,
      |  rj.doc_id AS rejected_id, ch.flesch AS chosen_score,
      |  rj.flesch AS rejected_score,
      |  ch.flesch - rj.flesch AS margin,
      |  CAST(ch.group_size AS BIGINT) AS group_size
      |FROM (SELECT * FROM rk WHERE rc = 1) ch
      |JOIN (SELECT * FROM rk WHERE rr = 1) rj
      |  ON rj.lang = ch.lang AND rj.source = ch.source
      |WHERE ch.doc_id <> rj.doc_id
      |ORDER BY ch.lang, ch.source""".stripMargin

  /** q212: multi-turn conversation assembly from the event log
    * ([[Sft.assembleConversations]]) — 30-min gap sessionization at
    * MICROSECOND precision, alternating roles, 8-turn cap, rendered
    * transcript gated via md5. Turn text is event_type + the props
    * JSON field (never a raw double — double-to-string rendering is
    * engine-specific). */
  def q212Conversations(s: SparkSession, d: String): DataFrame =
    Sft.assembleConversations(
      events(s, d).withColumn("turn_text",
        concat(col("event_type"), lit("#"),
          get_json_object(col("props"), "$.k"))),
      "user_id", "ts", "event_id", "turn_text")
      .orderBy(col("user_id"), col("session_idx"))

  private val q212Oracle: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id, epoch_us(ts) AS ts_us,
      |    event_type || '#' || json_extract_string(props, '$.k')
      |      AS turn_text
      |  FROM events),
      |s AS (
      |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000
      |    THEN 1 ELSE 0 END AS ns
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s2 AS (
      |  SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id) AS BIGINT) AS session_idx
      |  FROM s),
      |t AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id,
      |    session_idx ORDER BY ts, event_id) AS turn
      |  FROM s2),
      |p AS (
      |  SELECT user_id, session_idx, turn,
      |    CASE WHEN turn <= 8 THEN
      |      (CASE WHEN turn % 2 = 1 THEN '<|user|>' || chr(10)
      |        ELSE '<|assistant|>' || chr(10) END) ||
      |      turn_text || chr(10)
      |    END AS piece
      |  FROM t),
      |r AS (
      |  SELECT user_id, session_idx, COUNT(*) AS n_events,
      |    CAST(SUM(CASE WHEN piece IS NOT NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_turns,
      |    COALESCE(string_agg(piece, '' ORDER BY turn)
      |      FILTER (WHERE piece IS NOT NULL), '') || '<|end|>'
      |      AS rendered
      |  FROM p GROUP BY 1, 2)
      |SELECT user_id, session_idx, n_events, n_turns, rendered,
      |  md5(rendered) AS rendered_md5
      |FROM r ORDER BY user_id, session_idx""".stripMargin

  /** q225: the END-TO-END SFT data build — badwords gate → exact
    * dedup → chat-template rendering → train/val/test hash split →
    * token-budget sequence packing of the train split; per-bin
    * packing stats out. Five oracle-gated operators composed into
    * the one materialization an instruction-tuning run ships; the
    * oracle chains each stage's established CTE replay. */
  def q225SftBuild(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val bad = Seq("dup", "corrupt", "spam").toDF("word")
    val clean = graft.operators.Corpus.badwordsFilter(
      docs, "doc_id", "text", bad)
    val keep = graft.operators.Dedup.exactDedup(clean, "doc_id",
      "text").select(col("doc_id"))
    val surv = clean.join(keep, "doc_id")
    val rec = Sft.renderChat(surv, "doc_id", "text")
    val train = graft.operators.Split.hashSplit(rec, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .filter(col("split") === "train")
    graft.operators.Packing.packSequences(
        train.select(col("doc_id"), col("n_tokens")),
        "doc_id", "n_tokens", budget = 512, shards = 8)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_records"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .withColumn("fill_ratio", col("total_tokens") / lit(512.0))
      .orderBy(col("bin"))
  }

  private val q225Oracle: String =
    """WITH bw AS (
      |  SELECT * FROM (VALUES ('dup'), ('corrupt'), ('spam'))
      |    b(word)),
      |btoks AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
      |  FROM documents),
      |bm AS (
      |  SELECT DISTINCT doc_id FROM btoks
      |  JOIN bw ON btoks.tok = bw.word),
      |clean AS (
      |  SELECT doc_id, text FROM documents
      |  WHERE doc_id NOT IN (SELECT doc_id FROM bm)),
      |keep AS (
      |  SELECT MIN(doc_id) AS doc_id FROM clean
      |  GROUP BY md5(text)),
      |surv AS (
      |  SELECT c.doc_id, c.text FROM clean c JOIN keep
      |  USING (doc_id)),
      |tl AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |    x -> len(x) > 0) AS t
      |  FROM surv),
      |rec AS (
      |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens
      |  FROM tl WHERE len(t) > 12),
      |spl AS (
      |  SELECT doc_id, n_tokens FROM (
      |    SELECT *, ('0x' || substr(md5('split:' ||
      |      CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000
      |      AS bkt
      |    FROM rec) x
      |  WHERE bkt < 8000),
      |pc AS (
      |  SELECT doc_id, n_tokens, doc_id % 8 AS shard,
      |    SUM(n_tokens) OVER (PARTITION BY doc_id % 8
      |      ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cum
      |  FROM spl),
      |pb AS (
      |  SELECT doc_id, n_tokens,
      |    shard * 1000000 + CAST(FLOOR(
      |      CAST(cum - n_tokens AS DOUBLE) / 512) AS BIGINT) AS bin
      |  FROM pc)
      |SELECT bin, COUNT(*) AS n_records,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
      |  CAST(SUM(n_tokens) AS BIGINT) / 512.0 AS fill_ratio
      |FROM pb GROUP BY bin ORDER BY bin""".stripMargin

  /** Synthetic 4-rater label frame for the agreement family: rater
    * r's label for doc d is the doc's `lang` with probability 0.7
    * and a deterministic off-label otherwise, both decided by the
    * established md5-prefix hash device — so agreement is real but
    * imperfect, every κ branch is exercised, and the oracle replays
    * the labels bit-identically. */
  private def raterLabels(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("rate:"),
      col("doc_id").cast("string"), lit(":"),
      col("rater").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10
    documents(s, d).select(col("doc_id"), col("lang"))
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0L), lit(3L))).as("rater"))
      .withColumn("h", h)
      .withColumn("label", when(col("h") < 7, col("lang"))
        .otherwise(concat(lit("alt"), (col("h") - 7).cast("string"))))
      .select("doc_id", "rater", "label")
  }

  /** The q282/q283 shared oracle CTE ending at
    * `rl(doc_id, rater, label)` — the exact [[raterLabels]] replay. */
  private val RaterCtes: String =
    """rl AS (
      |  SELECT doc_id, r AS rater,
      |    CASE WHEN h < 7 THEN lang
      |      ELSE 'alt' || CAST(h - 7 AS VARCHAR) END AS label
      |  FROM (
      |    SELECT doc_id, lang, r,
      |      ('0x' || substr(md5('rate:' || doc_id || ':' || r), 1, 8))
      |        ::UBIGINT::BIGINT % 10 AS h
      |    FROM documents,
      |      (SELECT unnest(generate_series(0, 3)) AS r)))""".stripMargin

  /** q282: Fleiss' κ over the 4-rater label frame
    * ([[graft.operators.Agreement.fleissKappa]]) — corpus-level
    * beyond-chance agreement as an exact integer rational plus one
    * final double division; `r_min`/`r_max` prove the balanced
    * design the statistic requires. */
  def q282FleissKappa(s: SparkSession, d: String): DataFrame =
    graft.operators.Agreement.fleissKappa(
      raterLabels(s, d), "doc_id", "rater", "label")

  private val q282Oracle: String =
    s"""WITH $RaterCtes,
      |cells AS (SELECT doc_id, label, COUNT(*) AS n
      |  FROM rl GROUP BY 1, 2),
      |pi AS (SELECT doc_id, SUM(n) AS r, SUM(n*n) AS s2
      |  FROM cells GROUP BY 1),
      |mg AS (SELECT SUM(c*c) AS sum_c2, COUNT(*) AS n_labels
      |  FROM (SELECT label, SUM(n) AS c FROM cells GROUP BY 1)),
      |tt AS (SELECT COUNT(*) AS n_items, SUM(r) AS nr, SUM(s2) AS a,
      |    MIN(r) AS r_min, MAX(r) AS r_max FROM pi)
      |SELECT CAST(n_items AS BIGINT) AS n_items,
      |  CAST(r_min AS BIGINT) AS r_min,
      |  CAST(r_max AS BIGINT) AS r_max,
      |  CAST(n_labels AS BIGINT) AS n_labels,
      |  CAST((a - nr)*nr*nr - nr*(r_max - 1)*sum_c2 AS BIGINT) AS num,
      |  CAST(nr*(r_max - 1)*(nr*nr - sum_c2) AS BIGINT) AS den,
      |  CAST(CAST((a - nr)*nr*nr - nr*(r_max - 1)*sum_c2 AS BIGINT)
      |      AS DOUBLE) /
      |    CAST(CAST(nr*(r_max - 1)*(nr*nr - sum_c2) AS BIGINT)
      |      AS DOUBLE) AS kappa
      |FROM tt, mg""".stripMargin

  /** q283: pairwise Cohen's κ matrix over the same label frame
    * ([[graft.operators.Agreement.cohenKappaPairs]]) — the
    * drifting-annotator detector, one exact-rational row per rater
    * pair. */
  def q283CohenPairs(s: SparkSession, d: String): DataFrame =
    graft.operators.Agreement.cohenKappaPairs(
        raterLabels(s, d), "doc_id", "rater", "label")
      .orderBy(col("rater_a"), col("rater_b"))

  private val q283Oracle: String =
    s"""WITH $RaterCtes,
      |pr0 AS (SELECT a.rater AS rater_a, b.rater AS rater_b,
      |    a.label AS label_a, b.label AS label_b
      |  FROM rl a JOIN rl b
      |    ON a.doc_id = b.doc_id AND a.rater < b.rater),
      |pr AS (SELECT rater_a, rater_b, COUNT(*) AS n_items,
      |    COUNT(CASE WHEN label_a = label_b THEN 1 END) AS n_agree
      |  FROM pr0 GROUP BY 1, 2),
      |ma AS (SELECT rater_a, rater_b, label_a AS label,
      |    COUNT(*) AS m FROM pr0 GROUP BY 1, 2, 3),
      |mb AS (SELECT rater_a, rater_b, label_b AS label,
      |    COUNT(*) AS m FROM pr0 GROUP BY 1, 2, 3),
      |s AS (SELECT rater_a, rater_b, SUM(x.m * y.m) AS s
      |  FROM ma x JOIN mb y USING (rater_a, rater_b, label)
      |  GROUP BY 1, 2)
      |SELECT pr.rater_a, pr.rater_b,
      |  CAST(pr.n_items AS BIGINT) AS n_items,
      |  CAST(pr.n_agree AS BIGINT) AS n_agree,
      |  CAST(pr.n_items * pr.n_agree - COALESCE(s.s, 0) AS BIGINT)
      |    AS num,
      |  CAST(pr.n_items * pr.n_items - COALESCE(s.s, 0) AS BIGINT)
      |    AS den,
      |  CAST(CAST(pr.n_items * pr.n_agree - COALESCE(s.s, 0)
      |      AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(pr.n_items * pr.n_items - COALESCE(s.s, 0)
      |        AS BIGINT) AS DOUBLE) AS kappa
      |FROM pr LEFT JOIN s
      |  ON pr.rater_a = s.rater_a AND pr.rater_b = s.rater_b
      |ORDER BY pr.rater_a, pr.rater_b""".stripMargin

  /** q284: Bradley–Terry preference-strength fit
    * ([[graft.operators.BradleyTerry.fit]], 8 MM rounds) over
    * comparisons synthesized from a KNOWN BT model: items 0–7 with
    * latent strength i+1, per-doc matchup and outcome drawn by the
    * md5 device with P(a beats b) = (a+1)/(a+b+2) — so the fit is
    * exercised on data the model actually generates. The oracle
    * unrolls all 8 MM rounds under the t12/DECIMAL contract. */
  def q284BradleyTerry(s: SparkSession, d: String): DataFrame = {
    val a = col("doc_id") % 8
    val h7 = conv(substring(md5(concat(lit("bt:p:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 7
    val b = (a + 1 + h7) % 8
    val draw = conv(substring(md5(concat(lit("bt:w:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") % (a + b + 2)
    val cmp = documents(s, d).select(
      when(draw < a + 1, a).otherwise(b).as("winner"),
      when(draw < a + 1, b).otherwise(a).as("loser"))
    graft.operators.BradleyTerry.fit(cmp, "winner", "loser",
        rounds = 8)
      .orderBy(col("item"))
  }

  private val q284Oracle: String = {
    val rounds = (1 to 8).map { r =>
      val prev = s"w${r - 1}"
      // MATERIALIZED: w$r references w${r-1} twice — DuckDB would
      // otherwise inline the chain exponentially (2^rounds scans).
      s"""d$r AS MATERIALIZED (
        |  SELECT g.i AS item,
        |    CAST(SUM(CAST(floor(g.n_ij / (si.s + sj.s) * 1e12) / 1e12
        |      AS DECIMAL(28,15))) AS DOUBLE) AS d
        |  FROM games g JOIN $prev si ON g.i = si.item
        |    JOIN $prev sj ON g.j = sj.item
        |  GROUP BY 1),
        |r$r AS MATERIALIZED (
        |  SELECT wins.item,
        |    floor(wins.n_wins / d$r.d * 1e12) / 1e12 AS s_raw
        |  FROM wins JOIN d$r ON wins.item = d$r.item),
        |w$r AS MATERIALIZED (
        |  SELECT item, floor(s_raw / t.tot * 1e12) / 1e12 AS s
        |  FROM r$r, (SELECT CAST(SUM(CAST(s_raw AS DECIMAL(28,15)))
        |    AS DOUBLE) AS tot FROM r$r) t)""".stripMargin
    }.mkString(",\n")
    s"""WITH cmp AS MATERIALIZED (
      |  SELECT CASE WHEN draw < a + 1 THEN a ELSE b END AS winner,
      |    CASE WHEN draw < a + 1 THEN b ELSE a END AS loser
      |  FROM (
      |    SELECT a, b,
      |      ('0x' || substr(md5('bt:w:' || doc_id), 1, 8))
      |        ::UBIGINT::BIGINT % (a + b + 2) AS draw
      |    FROM (
      |      SELECT doc_id, doc_id % 8 AS a,
      |        (doc_id % 8 + 1 +
      |          ('0x' || substr(md5('bt:p:' || doc_id), 1, 8))
      |            ::UBIGINT::BIGINT % 7) % 8 AS b
      |      FROM documents))),
      |dir AS MATERIALIZED (SELECT winner, loser, COUNT(*) AS n
      |  FROM cmp GROUP BY 1, 2),
      |games AS MATERIALIZED (
      |  SELECT i, j, CAST(SUM(n) AS BIGINT) AS n_ij FROM (
      |    SELECT winner AS i, loser AS j, n FROM dir
      |    UNION ALL SELECT loser AS i, winner AS j, n FROM dir)
      |  GROUP BY 1, 2),
      |wins AS MATERIALIZED (
      |  SELECT it.item, CAST(COALESCE(w.w, 0) AS BIGINT)
      |    AS n_wins
      |  FROM (SELECT DISTINCT i AS item FROM games) it
      |  LEFT JOIN (SELECT winner AS item, SUM(n) AS w FROM dir
      |    GROUP BY 1) w ON it.item = w.item),
      |w0 AS MATERIALIZED (
      |  SELECT item, CAST(1.0 AS DOUBLE) AS s FROM wins),
      |$rounds,
      |played AS (SELECT i AS item, CAST(SUM(n_ij) AS BIGINT)
      |    AS n_games FROM games GROUP BY 1)
      |SELECT wins.item, wins.n_wins, played.n_games, w8.s AS strength
      |FROM wins JOIN played ON wins.item = played.item
      |  JOIN w8 ON wins.item = w8.item
      |ORDER BY wins.item""".stripMargin
  }

  /** Synthetic n=10-sample eval-candidate frame over a problem
    * slice of `orders` — the shared fixture under q319/q320: the
    * true answer is `o_orderkey % 5`; sample s of problem p answers
    * correctly when the md5 device's h = md5('ev:p:s') % 10 < 6
    * (≈60% per-sample accuracy) and otherwise emits the
    * deterministic off-answer `(p + h) % 5` (h % 5 ≠ 0 for
    * h ∈ 6..9, so an off-answer NEVER collides with the truth).
    * Every hash, answer, and correctness flag replays in SQL. */
  private def evalCandidates(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("ev:"),
      col("problem").cast("string"), lit(":"),
      col("sample").cast("string"))), 1, 8), 16, 10)
      .cast("long") % 10
    orders(s, d).select(col("o_orderkey").as("problem"))
      .filter(col("problem") % 20 === 0)
      .select(col("problem"),
        explode(sequence(lit(0L), lit(9L))).as("sample"))
      .withColumn("h", h)
      .withColumn("answer",
        when(col("h") < 6, (col("problem") % 5).cast("string"))
          .otherwise(((col("problem") + col("h")) % 5)
            .cast("string")))
      .withColumn("correct",
        col("answer") === (col("problem") % 5).cast("string"))
      .select("problem", "sample", "answer", "correct")
  }

  /** The q319/q320 shared oracle CTE ending at
    * `cand(problem, sample, answer, correct)` — the exact
    * [[evalCandidates]] replay. */
  private val CandCtes: String =
    """cand AS (
      |  SELECT problem, s AS sample,
      |    CASE WHEN h < 6 THEN CAST(problem % 5 AS VARCHAR)
      |      ELSE CAST((problem + h) % 5 AS VARCHAR) END AS answer,
      |    h < 6 AS correct
      |  FROM (
      |    SELECT o_orderkey AS problem, s,
      |      ('0x' || substr(md5('ev:' || o_orderkey || ':' || s),
      |        1, 8))::UBIGINT::BIGINT % 10 AS h
      |    FROM orders, (SELECT unnest(generate_series(0, 9)) AS s)
      |    WHERE o_orderkey % 20 = 0))""".stripMargin

  /** q319: unbiased pass@k over the n=10 eval-candidate fixture
    * ([[graft.operators.Eval.passAtK]], Chen et al. 2021 eq. 1) at
    * k ∈ {1, 4, 10} — the code-eval family's headline metric next
    * to BLEU/ROUGE/retrieval (q124/q157/q176). The oracle replays
    * the candidate hashes, the (n, c) aggregate, and the
    * fixed-order factor product via list_reduce. */
  def q319PassAtK(s: SparkSession, d: String): DataFrame =
    graft.operators.Eval.passAtK(evalCandidates(s, d),
        col("problem"), col("correct"), Seq(1, 4, 10))
      .orderBy(col("problem"), col("k"))

  private val q319Oracle: String =
    s"""WITH $CandCtes,
      |agg AS (
      |  SELECT problem, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(CASE WHEN correct THEN 1 END) AS BIGINT) AS c
      |  FROM cand GROUP BY 1),
      |ks AS (SELECT unnest([1, 4, 10]) AS k)
      |SELECT problem, CAST(k AS BIGINT) AS k, n, c,
      |  CASE WHEN k > n THEN NULL
      |    ELSE 1.0 - list_reduce(
      |      list_prepend(CAST(1.0 AS DOUBLE),
      |        list_transform(generate_series(0, k - 1),
      |          i -> CAST(n - c - i AS DOUBLE) / (n - i))),
      |      (a, b) -> a * b)
      |  END AS pass_at_k
      |FROM agg CROSS JOIN ks
      |ORDER BY problem, k""".stripMargin

  /** q320: self-consistency majority voting over the same candidate
    * fixture ([[graft.operators.Eval.consensusVote]], Wang et al.
    * 2022) — modal answer, vote share, and consensus correctness
    * per problem, ties broken by the smallest answer. The oracle
    * replays the vote table and the (votes DESC, answer ASC)
    * mode selection. */
  def q320Consensus(s: SparkSession, d: String): DataFrame =
    graft.operators.Eval.consensusVote(evalCandidates(s, d),
        col("problem"), col("answer"), col("correct"))
      .orderBy(col("problem"))

  private val q320Oracle: String =
    s"""WITH $CandCtes,
      |v AS (
      |  SELECT problem, answer, CAST(COUNT(*) AS BIGINT) AS votes,
      |    MAX(CASE WHEN correct THEN 1 ELSE 0 END) AS okv
      |  FROM cand GROUP BY 1, 2),
      |t AS (
      |  SELECT problem, CAST(SUM(votes) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_distinct_answers
      |  FROM v GROUP BY 1),
      |rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY problem
      |    ORDER BY votes DESC, answer ASC) AS r
      |  FROM v)
      |SELECT t.problem, t.n, t.n_distinct_answers,
      |  rk.answer AS consensus_answer,
      |  rk.votes AS consensus_votes,
      |  CAST(rk.votes AS DOUBLE) / t.n AS vote_share,
      |  rk.okv = 1 AS consensus_correct
      |FROM t JOIN rk ON t.problem = rk.problem AND rk.r = 1
      |ORDER BY t.problem""".stripMargin

  /** Shared (problem, sample, reward) fixture for the RL-analytics
    * rows q326/q327: 8 samples per q319-population problem, reward
    * = md5-uniform in [0, 1) at 3 decimal places — every reward
    * replays in SQL. */
  private def rewardSamples(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(col("o_orderkey").as("problem"))
      .filter(col("problem") % 20 === 0)
      .select(col("problem"),
        explode(sequence(lit(0L), lit(7L))).as("sample"))
      .withColumn("reward",
        (conv(substring(md5(concat(lit("rw:"),
          col("problem").cast("string"), lit(":"),
          col("sample").cast("string"))), 1, 8), 16, 10)
          .cast("long") % 1000).cast("double") / 1000.0)

  /** The q326/q327 shared oracle CTE ending at
    * `rw(problem, sample, reward)` — the exact [[rewardSamples]]
    * replay. */
  private val RwCtes: String =
    """rw AS (
      |  SELECT o_orderkey AS problem, s AS sample,
      |    CAST(('0x' || substr(md5('rw:' || o_orderkey || ':' || s),
      |      1, 8))::UBIGINT::BIGINT % 1000 AS DOUBLE) / 1000.0
      |      AS reward
      |  FROM orders, (SELECT unnest(generate_series(0, 7)) AS s)
      |  WHERE o_orderkey % 20 = 0)""".stripMargin

  /** q326: GRPO group-normalized advantage
    * ([[graft.operators.Eval.groupNormalizedAdvantage]], Shao et
    * al. 2024 eq. 3) over the 8-sample reward fixture — the
    * value-model-free RL baseline at (problem, sample) grain. The
    * oracle replays the reward hashes, the exact HUGEINT/DECIMAL
    * integer moment sums, and the fixed IEEE mean/std/advantage
    * sequence. */
  def q326GroupAdvantage(s: SparkSession, d: String): DataFrame =
    graft.operators.Eval.groupNormalizedAdvantage(
        rewardSamples(s, d), col("problem"), col("sample"),
        col("reward"))
      .orderBy(col("problem"), col("sample"))

  private val q326Oracle: String =
    s"""WITH $RwCtes,
      |sc AS (
      |  SELECT problem, sample,
      |    CAST(floor(reward * 1e9) AS BIGINT) AS r9
      |  FROM rw),
      |g AS (
      |  SELECT problem, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(r9) AS HUGEINT) AS s1,
      |    SUM(CAST(r9 AS HUGEINT) * r9) AS s2
      |  FROM sc GROUP BY 1),
      |j AS (
      |  SELECT sc.problem, sc.sample, sc.r9, g.n, g.s1,
      |    sqrt(CAST(CAST(g.n AS HUGEINT) * g.s2 - g.s1 * g.s1
      |        AS DOUBLE)
      |      / (CAST(g.n AS DOUBLE) * g.n) / 1e18) AS std
      |  FROM sc JOIN g USING (problem))
      |SELECT problem, sample,
      |  CAST(r9 AS DOUBLE) / 1e9 AS reward, n,
      |  CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e9) AS mean,
      |  std,
      |  CASE WHEN std > 0 THEN
      |    floor(CAST(CAST(r9 AS HUGEINT) * n - s1 AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * 1e9) / std * 1e9) / 1e9
      |    ELSE NULL END AS advantage,
      |  std = 0 AS degenerate
      |FROM j ORDER BY problem, sample""".stripMargin

  /** q327: unbiased best-of-n yield curve
    * ([[graft.operators.Eval.bestOfNCurve]], the WebGPT BoN
    * estimator) at n ∈ {1, 4, 16} over the same fixture — n=16 > N=8
    * exercises the null diagnostic. The oracle replays the rank
    * window, the fixed-order combinatorial ratio folds, and the
    * t9/DECIMAL term sums. */
  def q327BestOfN(s: SparkSession, d: String): DataFrame =
    graft.operators.Eval.bestOfNCurve(rewardSamples(s, d),
        col("problem"), col("sample"), col("reward"), Seq(1, 4, 16))
      .orderBy(col("problem"), col("n"))

  private val q327Oracle: String = {
    def fold(iExpr: String): String =
      s"""CASE WHEN $iExpr < n THEN 0.0 ELSE list_reduce(
        |    list_prepend(CAST(1.0 AS DOUBLE),
        |      list_transform(generate_series(0, n - 1),
        |        k -> CAST($iExpr - k AS DOUBLE) / (nn - k))),
        |    (a, b) -> a * b) END""".stripMargin
    s"""WITH $RwCtes,
      |rk AS (
      |  SELECT problem, floor(reward * 1e9) / 1e9 AS r,
      |    CAST(row_number() OVER (PARTITION BY problem
      |      ORDER BY floor(reward * 1e9) / 1e9, sample) AS BIGINT)
      |      AS i,
      |    CAST(COUNT(*) OVER (PARTITION BY problem) AS BIGINT) AS nn
      |  FROM rw),
      |t AS (
      |  SELECT problem, CAST(n AS BIGINT) AS n, nn,
      |    CASE WHEN n > nn THEN 0.0
      |      ELSE (${fold("i")}) - (${fold("i - 1")}) END AS w, r
      |  FROM rk CROSS JOIN (SELECT unnest([1, 4, 16]) AS n))
      |SELECT problem, n, MAX(nn) AS n_samples,
      |  CASE WHEN n > MAX(nn) THEN NULL
      |    ELSE CAST(SUM(CAST(floor(w * r * 1e9) / 1e9
      |      AS DECIMAL(38,9))) AS DOUBLE) END AS best_of_n
      |FROM t GROUP BY problem, n
      |ORDER BY problem, n""".stripMargin
  }

  /** q328: best-of-n yield curve FROM COUNTS
    * ([[graft.operators.Eval.bestOfNFromCounts]]) — the same curve
    * as q327 computed from the PRE-AGGREGATED (problem, r9, weight)
    * reward-multiset table, the auditFromCounts member the
    * streaming yield sketch feeds (StreamingYieldSpec proves the
    * two paths bit-equal; this row pins the counts path against
    * DuckDB independently). The oracle replays the count aggregate,
    * the cumulative rank spans, the per-rank combinatorial folds
    * and the t9/DECIMAL term sums. */
  def q328BestOfNCounts(s: SparkSession, d: String): DataFrame = {
    val counts = rewardSamples(s, d)
      .select(col("problem"),
        graft.operators.Eval.r9Column(col("reward")).as("r9"))
      .groupBy(col("problem"), col("r9"))
      .agg(count(lit(1)).as("weight"))
    graft.operators.Eval.bestOfNFromCounts(counts, Seq(1, 4, 16))
      .orderBy(col("problem"), col("n"))
  }

  private val q328Oracle: String = {
    def fold(iExpr: String): String =
      s"""CASE WHEN $iExpr < n THEN 0.0 ELSE list_reduce(
        |    list_prepend(CAST(1.0 AS DOUBLE),
        |      list_transform(generate_series(0, n - 1),
        |        k -> CAST($iExpr - k AS DOUBLE) / (nn - k))),
        |    (a, b) -> a * b) END""".stripMargin
    s"""WITH $RwCtes,
      |c AS (
      |  SELECT problem, CAST(floor(reward * 1e9) AS BIGINT) AS r9,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM rw GROUP BY 1, 2),
      |sp AS (
      |  SELECT problem, r9, cnt,
      |    CAST(SUM(cnt) OVER (PARTITION BY problem ORDER BY r9
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi,
      |    CAST(SUM(cnt) OVER (PARTITION BY problem) AS BIGINT) AS nn
      |  FROM c),
      |rk AS (
      |  SELECT problem, CAST(r9 AS DOUBLE) / 1e9 AS r, nn,
      |    unnest(generate_series(hi - cnt + 1, hi)) AS i
      |  FROM sp),
      |t AS (
      |  SELECT problem, CAST(n AS BIGINT) AS n, nn,
      |    CASE WHEN n > nn THEN 0.0
      |      ELSE (${fold("i")}) - (${fold("i - 1")}) END AS w, r
      |  FROM rk CROSS JOIN (SELECT unnest([1, 4, 16]) AS n))
      |SELECT problem, n, MAX(nn) AS n_samples,
      |  CASE WHEN n > MAX(nn) THEN NULL
      |    ELSE CAST(SUM(CAST(floor(w * r * 1e9) / 1e9
      |      AS DECIMAL(38,9))) AS DOUBLE) END AS best_of_n
      |FROM t GROUP BY problem, n
      |ORDER BY problem, n""".stripMargin
  }

  /** q324: DEDUP-AWARE pass@k
    * ([[graft.operators.Eval.passAtKDedupAware]]) over the q319
    * candidate fixture with problems clustered into order-key blocks
    * of 800 (40 problems per family — the stand-in for the template/
    * near-dup families a real eval set carries; production wiring
    * feeds MinHash component labels, q74-style). Reports per k the
    * naive problem-mean next to the cluster-mean-of-means and the
    * counts, so the gap IS the duplication bias. The oracle replays
    * the candidate hashes, the per-problem estimator, the block
    * assignment, and both DECIMAL(38,9) mean stacks. */
  def q324DedupPassAtK(s: SparkSession, d: String): DataFrame = {
    val cand = evalCandidates(s, d)
    val clusters = cand.select(col("problem")).distinct()
      .select(col("problem"),
        (col("problem") - pmod(col("problem"), lit(800L)))
          .as("cluster"))
    graft.operators.Eval.passAtKDedupAware(cand, col("problem"),
        col("correct"), clusters, Seq(1, 4, 10))
      .orderBy(col("k"))
  }

  private val q324Oracle: String =
    s"""WITH $CandCtes,
      |agg AS (
      |  SELECT problem, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(CASE WHEN correct THEN 1 END) AS BIGINT) AS c
      |  FROM cand GROUP BY 1),
      |ks AS (SELECT unnest([1, 4, 10]) AS k),
      |pk AS (
      |  SELECT problem, CAST(k AS BIGINT) AS k,
      |    CASE WHEN k > n THEN NULL
      |      ELSE 1.0 - list_reduce(
      |        list_prepend(CAST(1.0 AS DOUBLE),
      |          list_transform(generate_series(0, k - 1),
      |            i -> CAST(n - c - i AS DOUBLE) / (n - i))),
      |        (a, b) -> a * b)
      |    END AS pass_at_k
      |  FROM agg CROSS JOIN ks),
      |cl AS (
      |  SELECT problem, problem - problem % 800 AS cluster
      |  FROM (SELECT DISTINCT problem FROM cand)),
      |j AS (
      |  SELECT pk.k, cl.cluster,
      |    floor(pk.pass_at_k * 1e9) / 1e9 AS p
      |  FROM pk JOIN cl USING (problem)
      |  WHERE pk.pass_at_k IS NOT NULL),
      |pc AS (
      |  SELECT k, cluster,
      |    CAST(SUM(CAST(p AS DECIMAL(38,9))) AS DOUBLE) AS ps,
      |    CAST(COUNT(*) AS BIGINT) AS np
      |  FROM j GROUP BY 1, 2)
      |SELECT k, CAST(SUM(np) AS BIGINT) AS n_problems,
      |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
      |  CAST(SUM(CAST(ps AS DECIMAL(38,9))) AS DOUBLE)
      |    / CAST(SUM(np) AS BIGINT) AS macro_naive,
      |  CAST(SUM(CAST(floor(ps / np * 1e9) / 1e9
      |    AS DECIMAL(38,9))) AS DOUBLE)
      |    / CAST(COUNT(*) AS BIGINT) AS macro_dedup
      |FROM pc GROUP BY k ORDER BY k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q326_group_advantage" -> (q326GroupAdvantage _),
    "q327_best_of_n" -> (q327BestOfN _),
    "q328_best_of_n_counts" -> (q328BestOfNCounts _),
    "q324_dedup_pass_at_k" -> (q324DedupPassAtK _),
    "q319_pass_at_k" -> (q319PassAtK _),
    "q320_consensus_vote" -> (q320Consensus _),
    "q225_sft_build" -> (q225SftBuild _),
    "q282_fleiss_kappa" -> (q282FleissKappa _),
    "q283_cohen_pairs" -> (q283CohenPairs _),
    "q284_bradley_terry" -> (q284BradleyTerry _),
    "q206_fim_transform" -> (q206FimTransform _),
    "q207_sft_render" -> (q207SftRender _),
    "q208_preference_pairs" -> (q208PreferencePairs _),
    "q212_conversations" -> (q212Conversations _),
  )

  val oracle: Map[String, String] = Map(
    "q326_group_advantage" -> q326Oracle,
    "q327_best_of_n" -> q327Oracle,
    "q328_best_of_n_counts" -> q328Oracle,
    "q324_dedup_pass_at_k" -> q324Oracle,
    "q319_pass_at_k" -> q319Oracle,
    "q320_consensus_vote" -> q320Oracle,
    "q225_sft_build" -> q225Oracle,
    "q282_fleiss_kappa" -> q282Oracle,
    "q283_cohen_pairs" -> q283Oracle,
    "q284_bradley_terry" -> q284Oracle,
    "q206_fim_transform" -> q206Oracle,
    "q207_sft_render" -> q207Oracle,
    "q208_preference_pairs" -> q208Oracle,
    "q212_conversations" -> q212Oracle,
  )
}
