package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.wordShinglesFast

/** The complete Gopher repetition-filter signal suite (Rae et al.
  * 2021, §A1.2 / Table A1) — the per-document repetition measurements
  * a MassiveText-style pipeline thresholds on (dup-line 0.30,
  * dup-paragraph 0.30, dup-line-chars 0.20, dup-paragraph-chars 0.20,
  * top 2/3/4-gram chars 0.20/0.18/0.16, dup 5..10-gram chars
  * 0.15..0.10). Complements the q87 subset (top-2-gram + dup-3-gram
  * mass) with the full 13-signal table. Reference analog: the
  * quality screens applied before chunk admission
  * (`markdown_utils.py` boilerplate skips).
  *
  * Signal definitions (documented because published implementations
  * differ in the details; the oracle mirrors these exactly):
  *  - Lines split on `\n`, paragraphs on `\n\n`; space-trimmed-empty
  *    units are not content and are excluded everywhere.
  *  - `dup_line_frac` = (occurrences − distinct) / occurrences —
  *    the fraction of line occurrences that are repeats of an
  *    earlier identical line in the SAME document (Gopher filters
  *    are per-document). Same for paragraphs.
  *  - `dup_line_char_frac` = chars in ALL occurrences of lines that
  *    appear >1× / chars in all lines (separator chars excluded from
  *    both sides). Same for paragraphs.
  *  - `top{2,3,4}_frac` = (count of the most frequent word n-gram ×
  *    its char length) / total text length — the q87 denominator,
  *    kept for continuity (ties broken by gram text ascending).
  *  - `dup{5..10}_frac` = OVERLAP-AWARE coverage: the char mass of
  *    word positions covered by at least one occurrence of a
  *    duplicated n-gram, / the char mass of all word positions
  *    (spaces excluded). Counting each duplicated gram's chars
  *    independently (the RedPajama shortcut) over-counts overlapping
  *    repeats past 1.0; position coverage is the Gopher semantics.
  *
  * Shape: one line explode + one paragraph explode (per-doc hash
  * aggregates — the unit key includes the doc id, so repetition of a
  * unit across documents does NOT shuffle to one partition); ONE
  * unioned gram stream for n∈{2,3,4} (top-gram) and one for
  * n∈{5..10} (coverage), each a single window/aggregate over
  * (doc, n, gram); coverage positions distinct-ed per (doc, n, pos)
  * and joined back to the word stream. Everything keys on (doc, …)
  * so the whole computation is embarrassingly parallel across
  * documents — no corpus-wide hot keys, no self-joins, no state
  * beyond a group's own rows. At 100 TB each doc contributes
  * O(words × 9) exploded rows; partial aggregation collapses them
  * map-side before any exchange. */
object Repetition {

  private def unitSignals(df: DataFrame, idCol: String,
      textCol: String, sep: String, prefix: String): DataFrame = {
    val units = df
      .select(col(idCol).as("doc"),
        explode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as("u"))
      .filter(length(trim(col("u"))) > 0)
    units
      .groupBy(col("doc"), col("u"))
      .agg(count(lit(1)).as("c"), length(col("u")).as("len"))
      .groupBy(col("doc"))
      .agg(sum(col("c")).as("occ"),
        count(lit(1)).as("dst"),
        sum(when(col("c") > 1, col("c") * col("len"))
          .otherwise(0L)).as("dup_chars"),
        sum(col("c") * col("len")).as("tot_chars"))
      .select(col("doc"),
        ((col("occ") - col("dst")).cast("double") /
          col("occ").cast("double")).as(s"dup_${prefix}_frac"),
        (col("dup_chars").cast("double") /
          col("tot_chars").cast("double"))
          .as(s"dup_${prefix}_char_frac"))
  }

  /** One row per document with all 13 Gopher repetition signals. */
  def signals(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val docs = df.select(col(idCol).as("doc"), col(textCol).as("text"))

    val lineSig = unitSignals(docs, "doc", "text", "\n", "line")
    val paraSig = unitSignals(docs, "doc", "text", "\n\n", "para")

    // Top n-gram char mass, n ∈ {2,3,4}: one unioned stream, one
    // aggregate, one per-(doc,n) window for the argmax.
    val topStream = Seq(2, 3, 4).map { n =>
      docs.select(col("doc"), lit(n).as("n"),
        explode(wordShinglesFast(col("text"), n)).as("g"))
    }.reduce(_ unionByName _)
    val topGram = topStream
      .groupBy(col("doc"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc"), col("n"))
          .orderBy(desc("c"), col("g"))))
      .filter(col("rn") === 1)
      .groupBy(col("doc"))
      .agg(
        max(when(col("n") === 2, col("c") * length(col("g"))))
          .as("top2_chars"),
        max(when(col("n") === 3, col("c") * length(col("g"))))
          .as("top3_chars"),
        max(when(col("n") === 4, col("c") * length(col("g"))))
          .as("top4_chars"))

    // Word stream with positions (split on single space — the same
    // tokenization wordShinglesFast applies, so gram starts index
    // into this stream exactly).
    val words = docs.select(col("doc"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val wordMass = words.groupBy(col("doc"))
      .agg(sum(length(col("w"))).cast("long").as("word_chars"))

    // Duplicated n-gram coverage, n ∈ {5..10}: occurrences of grams
    // seen >1× in the doc mark their covered word positions; the
    // char mass of DISTINCT covered positions is the numerator.
    val covStream = (5 to 10).map { n =>
      docs.select(col("doc"), lit(n).as("n"),
        posexplode(wordShinglesFast(col("text"), n))
          .as(Seq("start", "g")))
    }.reduce(_ unionByName _)
    val covered = covStream
      .withColumn("c", count(lit(1)).over(
        Window.partitionBy(col("doc"), col("n"), col("g"))))
      .filter(col("c") > 1)
      .select(col("doc"), col("n"),
        explode(sequence(col("start"),
          col("start") + col("n") - 1)).as("pos"))
      .distinct()
    val covCols = (5 to 10).map { n =>
      sum(when(col("n") === n, length(col("w")))
        .otherwise(0)).cast("long").as(s"cov$n")
    }
    val covMass = covered
      .join(words, Seq("doc", "pos"))
      .groupBy(col("doc"))
      .agg(covCols.head, covCols.tail: _*)

    def frac(num: Column, den: Column): Column =
      coalesce(num.cast("double") / den.cast("double"), lit(0.0))

    docs.select(col("doc"), length(col("text")).as("nc"))
      .join(lineSig, Seq("doc"), "left")
      .join(paraSig, Seq("doc"), "left")
      .join(topGram, Seq("doc"), "left")
      .join(wordMass, Seq("doc"), "left")
      .join(covMass, Seq("doc"), "left")
      .select(
        col("doc").as(idCol) +:
        coalesce(col("dup_line_frac"), lit(0.0)).as("dup_line_frac") +:
        coalesce(col("dup_line_char_frac"), lit(0.0))
          .as("dup_line_char_frac") +:
        coalesce(col("dup_para_frac"), lit(0.0)).as("dup_para_frac") +:
        coalesce(col("dup_para_char_frac"), lit(0.0))
          .as("dup_para_char_frac") +:
        frac(col("top2_chars"), col("nc")).as("top2_frac") +:
        frac(col("top3_chars"), col("nc")).as("top3_frac") +:
        frac(col("top4_chars"), col("nc")).as("top4_frac") +:
        (5 to 10).map(n =>
          frac(coalesce(col(s"cov$n"), lit(0L)), col("word_chars"))
            .as(s"dup${n}_frac")): _*)
  }
}
