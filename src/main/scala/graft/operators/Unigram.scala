package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization (Kudo 2018 — the SentencePiece
  * unigram model): the fourth tokenizer family next to whitespace,
  * WordPiece, and byte-BPE ([[Tokenizers]]), and the trainable one
  * whose EM loop this module expresses Spark-first:
  *
  *  - [[seedVocab]]: substring-frequency seed vocabulary (Kudo §3.2
  *    seeds from frequent substrings; the suffix-array variant is
  *    [[SuffixArray]] territory) — all single chars plus the top
  *    multi-char substrings by corpus frequency;
  *  - [[segment]]: the E-step — per-word VITERBI segmentation under
  *    per-piece costs, the whole DP expressed as an in-row
  *    `aggregate` fold (the q82 list-reduce state-machine device):
  *    best[j] = min over vocab pieces ending at j of best[start] +
  *    cost, then a backpointer walk rebuilds the argmin path. No
  *    UDF, no driver state: the DP is a Catalyst expression over a
  *    per-word match list bounded by |word| × maxPieceLen;
  *  - [[emStep]]: the M-step — piece usage counted from the chosen
  *    segmentations (weighted by word frequency), re-scored
  *    cost = ln(total) − ln(usage), unused pieces pruned.
  *
  * Determinism: costs are differences of 9-decimal-truncated logs;
  * every candidate path sum is the same IEEE addition chain in both
  * engines (DP order is fixed), and the argmin tie order is the
  * struct order (cost, start) — equal-cost ties resolve to the
  * SMALLER start, i.e. the longer final piece, the SentencePiece
  * longest-match convention. The oracle replays seed, DP, walk, and
  * M-step list-for-list.
  *
  * Scale: words first collapse to DISTINCT (word, count) — Zipf
  * makes this the big reduction (the corpus may be 100 TB; its
  * distinct-word table is not) — then every stage is keyed joins +
  * in-row folds, embarrassingly parallel across words. `maxWordLen`
  * bounds the DP (longer words are dropped here; production would
  * pre-split on punctuation). */
object Unigram {

  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  /** Distinct words with corpus occurrence counts (whitespace
    * tokens, length ≤ maxWordLen). */
  def words(docs: DataFrame, textCol: String,
      maxWordLen: Int = 20): DataFrame =
    docs.select(explode(filter(split(col(textCol), " "),
        x => length(x) > 0)).as("w"))
      .filter(length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("wcnt"))

  /** All (word, start, piece) substring occurrences up to
    * maxPieceLen. */
  private def subs(wordsDf: DataFrame, maxPieceLen: Int): DataFrame =
    wordsDf
      .select(col("w"), col("wcnt"),
        explode(sequence(lit(0), length(col("w")) - 1)).as("s"))
      .select(col("w"), col("wcnt"), col("s"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("s") + col("l") <= length(col("w")))
      .select(col("w"), col("wcnt"), col("s").cast("int").as("s"),
        col("l").cast("int").as("l"),
        expr("substring(w, s + 1, l)").as("piece"))

  /** Seed vocabulary: every single character (full coverage) plus
    * the top `maxSize` multi-char substrings with corpus frequency ≥
    * `minCount`, scored cost = ln9(total) − ln9(freq) over the
    * selected set. Output: (piece, freq, cost). */
  def seedVocab(wordsDf: DataFrame, maxPieceLen: Int = 6,
      minCount: Int = 4, maxSize: Int = 2048): DataFrame = {
    val freq = subs(wordsDf, maxPieceLen)
      .groupBy(col("piece")).agg(sum(col("wcnt")).as("freq"))
    val singles = freq.filter(length(col("piece")) === 1)
    val multi = freq
      .filter(length(col("piece")) >= 2 && col("freq") >= minCount)
      .orderBy(col("freq").desc, col("piece"))
      .limit(maxSize)
    val vocab = singles.unionByName(multi)
    val tot = vocab.agg(sum(col("freq")).as("tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("freq"),
        (ln9(col("tot")) - ln9(col("freq"))).as("cost"))
  }

  /** Viterbi-segment every word under `vocab` (piece, cost).
    * Output: (w, wcnt, total_cost, n_pieces, seg) with seg the
    * space-joined argmin pieces. [[seedVocab]] guarantees full
    * coverage (every single char); under a PRUNED vocab (e.g. an
    * [[emStep]] output) unreachable DP positions carry an IEEE-inf
    * sentinel that poisons any path through them, and a word the
    * vocab cannot cover at all surfaces loudly as (total_cost =
    * Infinity, n_pieces = 0, seg = ''). */
  def segment(wordsDf: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    // LEFT join so a word with zero vocab coverage keeps a row (an
    // empty match list → all-inf DP → the loud unsegmentable shape)
    // instead of silently vanishing from the output
    val ms = subs(wordsDf, maxPieceLen)
      .join(vocab.select(col("piece"), col("cost")), "piece")
      .groupBy(col("w"))
      .agg(collect_list(struct(col("s"), (col("s") + col("l"))
        .cast("int").as("e"), col("cost"))).as("ms"))
    val matches = wordsDf.join(ms, Seq("w"), "left")
      .withColumn("ms", coalesce(col("ms"), expr(
        "cast(array() as array<struct<s:int,e:int,cost:double>>)")))
      .withColumn("n", length(col("w")).cast("int"))
    // best[j] (1-based list, entry 1 = position 0): struct(cost, frm)
    // unreachable positions (no surviving piece ends there — can
    // happen under a PRUNED vocab, never under seedVocab) carry an
    // (Infinity, -2) sentinel: IEEE inf poisons any path through
    // them, finite candidates always sort ahead, and the entries
    // stay non-null (a null struct in the accumulator array breaks
    // codegen's non-null element assumption)
    val dp = matches.withColumn("best",
      expr("""aggregate(
        sequence(1, n),
        array(named_struct('cost', cast(0.0 as double), 'frm', -1)),
        (acc, j) -> concat(acc, array(
          coalesce(
            try_element_at(
              array_sort(transform(
                filter(ms, m -> m.e = j),
                m -> named_struct(
                  'cost', element_at(acc, m.s + 1).cost + m.cost,
                  'frm', m.s))),
              1),
            named_struct('cost', cast('Infinity' as double),
              'frm', -2)))))"""))
    // backpointer walk: state (pos, pieces); prepend pieces walking
    // from n back to 0 (at most n steps, idle once pos = 0)
    // an unsegmentable word (infinite best at n) walks zero steps
    // and surfaces loudly: n_pieces = 0, seg = '', total_cost = inf;
    // a finite chain only ever references finite predecessors, so
    // the guard holds along the whole walk
    val walked = dp.withColumn("walk",
      expr("""aggregate(
        sequence(1, n),
        named_struct('pos', n, 'pieces', cast(array() as array<string>)),
        (acc, j) -> if(acc.pos > 0
            and element_at(best, acc.pos + 1).cost <
              cast('Infinity' as double),
          named_struct(
            'pos', element_at(best, acc.pos + 1).frm,
            'pieces', concat(
              array(substring(w, element_at(best, acc.pos + 1).frm + 1,
                acc.pos - element_at(best, acc.pos + 1).frm)),
              acc.pieces)),
          acc))"""))
    walked.select(col("w"), col("wcnt"),
      expr("element_at(best, n + 1).cost").as("total_cost"),
      size(col("walk.pieces")).cast("long").as("n_pieces"),
      array_join(col("walk.pieces"), " ").as("seg"))
  }

  /** One EM M-step: usage(piece) = Σ wcnt over the pieces chosen by
    * [[segment]] under `vocab`; pieces with zero usage are pruned
    * and survivors re-scored against the new total. Output:
    * (piece, usage, cost). */
  def emStep(wordsDf: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    val usage = segment(wordsDf, vocab, maxPieceLen)
      .select(col("wcnt"),
        explode(split(col("seg"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wcnt")).as("usage"))
    val tot = usage.agg(sum(col("usage")).as("tot"))
    usage.crossJoin(broadcast(tot))
      .select(col("piece"), col("usage"),
        (ln9(col("tot")) - ln9(col("usage"))).as("cost"))
  }
}
