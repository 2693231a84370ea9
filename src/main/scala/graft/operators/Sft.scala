package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Supervised-fine-tuning data materialization: the two record
  * constructors an instruction-tuning pipeline runs after curation —
  * chat-template rendering with a loss-mask boundary, and
  * preference-pair (chosen/rejected) assembly for DPO/RLHF-style
  * objectives.
  *
  * Both are pure column algebra over already-curated frames: render
  * is a narrow projection (scan-speed at 100 TB), pairs are one
  * hash-aggregation with map-side combine (min/max of lexicographic
  * structs — no window, no self-join, no per-group state beyond two
  * structs). */
object Sft {

  /** Render (prompt, response) chat records from documents: the
    * first `promptTokens` whitespace tokens become the user turn,
    * the remainder the assistant turn, rendered under a fixed
    * role-sentinel template. Documents too short to yield a
    * non-empty response are dropped (a real SFT builder's minimum
    * viable record). `lossStart` is the 1-based character offset in
    * `rendered` where the assistant span begins — the loss-mask
    * boundary a trainer needs so prompt tokens contribute no loss.
    *
    * Output: (idCol, n_tokens, response_tokens, rendered,
    * loss_start, rendered_md5). */
  def renderChat(docs: DataFrame, idCol: String, textCol: String,
      system: String = "You are a helpful assistant.",
      promptTokens: Int = 12): DataFrame = {
    require(promptTokens >= 1, s"promptTokens >= 1 ($promptTokens)")
    val toks = filter(split(col(textCol), " "), x => length(x) > 0)
    val withToks = docs
      .select(col(idCol), toks.as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .filter(col("n_tokens") > promptTokens)
    val prompt = array_join(slice(col("toks"), 1, promptTokens), " ")
    val response = array_join(
      slice(col("toks"), lit(promptTokens + 1),
        (col("n_tokens") - promptTokens).cast("int")), " ")
    val head = concat(lit(s"<|system|>\n$system\n<|user|>\n"),
      prompt, lit("\n<|assistant|>\n"))
    withToks.select(
        col(idCol),
        col("n_tokens"),
        (col("n_tokens") - promptTokens).as("response_tokens"),
        concat(head, response, lit("<|end|>")).as("rendered"),
        (length(head) + 1).cast("long").as("loss_start"))
      .withColumn("rendered_md5", md5(col("rendered")))
  }

  /** Assemble multi-turn chat transcripts from an event log: gap
    * sessionization (a new conversation after `gapMinutes` of
    * inactivity — the q02 device), strict (ts, orderCol) turn
    * order, roles alternating user/assistant from the first turn,
    * first `maxTurns` turns kept. The rendered string is rebuilt
    * with the order-preserving sorted-struct aggregation
    * ([[SpanCorruption]]'s device) — one shuffle on the session
    * key, no per-group state beyond the capped turn list.
    * (ts, orderCol) must be row-unique per user — orderCol is the
    * tie-break that makes turn order total.
    *
    * Output: (userCol, session_idx, n_events, n_turns, rendered,
    * rendered_md5), session_idx 1-based per user. */
  def assembleConversations(events: DataFrame, userCol: String,
      tsCol: String, orderCol: String, textCol: String,
      gapMinutes: Int = 30, maxTurns: Int = 8): DataFrame = {
    require(gapMinutes >= 1 && maxTurns >= 1,
      s"gapMinutes, maxTurns >= 1 ($gapMinutes, $maxTurns)")
    val wUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    // microsecond precision: the ts column carries sub-second parts
    // and second-truncated gaps would disagree with the oracle
    val sessions = events
      .withColumn("ts_us", expr(s"unix_micros(`$tsCol`)"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(wUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") >
            gapMinutes * 60000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(wUser))
    val wSess = Window
      .partitionBy(col(userCol), col("session_idx"))
      .orderBy(col(tsCol), col(orderCol))
    val turns = sessions
      .withColumn("turn", row_number().over(wSess))
      .withColumn("piece",
        when(col("turn") <= maxTurns,
          concat(
            when(col("turn") % 2 === 1, lit("<|user|>\n"))
              .otherwise(lit("<|assistant|>\n")),
            col(textCol), lit("\n"))))
    turns
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("piece").isNotNull, 1L).otherwise(0L))
          .as("n_turns"),
        concat(array_join(transform(
            array_sort(collect_list(when(col("piece").isNotNull,
              struct(col("turn"), col("piece").as("p"))))),
            x => x.getField("p")), ""), lit("<|end|>"))
          .as("rendered"))
      .withColumn("rendered_md5", md5(col("rendered")))
  }

  /** Preference pairs per group: chosen = argmax(score), rejected =
    * argmin(score), ties resolved deterministically (chosen prefers
    * the SMALLER id on equal score, rejected the LARGER — so a
    * two-doc tied group still yields a well-defined, non-degenerate
    * pair). Groups that cannot produce two distinct members (size 1,
    * or all scores AND ids equal — impossible with unique ids) are
    * dropped. `margin` is the raw score gap; callers gate on it for
    * DPO-style filtering.
    *
    * One aggregation, no join: argmax/argmin ride lexicographic
    * struct min/max — (score, −id) max ⇒ score desc then id asc;
    * (score, −id) min ⇒ score asc then id desc — which combine
    * map-side, so a group never materializes its members.
    *
    * Null scores must be filtered upstream (a null score field
    * makes the lexicographic struct order engine-defined).
    * Output: (groupCols*, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin, group_size). */
  def preferencePairs(scored: DataFrame, groupCols: Seq[String],
      idCol: String, scoreCol: String): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(scored.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"idCol '$idCol' must be numeric — the anti-symmetric " +
        "tie-break negates it (string ids would cast to null and " +
        "make ties engine-defined)")
    val id = col(idCol)
    val s = col(scoreCol)
    val packed = struct(s.as("score"), (-id).as("nid"), id.as("id"))
    scored
      .groupBy(groupCols.map(col): _*)
      .agg(max(packed).as("ch"), min(packed).as("rj"),
        count(lit(1)).as("group_size"))
      .filter(col("ch.id") =!= col("rj.id"))
      .select(groupCols.map(col) ++ Seq(
        col("ch.id").as("chosen_id"),
        col("rj.id").as("rejected_id"),
        col("ch.score").as("chosen_score"),
        col("rj.score").as("rejected_score"),
        (col("ch.score") - col("rj.score")).as("margin"),
        col("group_size")): _*)
  }
}
