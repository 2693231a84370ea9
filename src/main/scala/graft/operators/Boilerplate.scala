package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Main-content HTML extraction — block-level boilerplate
  * classification in the jusText family (Pomikálek 2011: segment at
  * block tags, score each block by link density / length / stopword
  * density, then a context pass where undecided blocks adopt a
  * neighbor's verdict). This is the extraction step C4/RefinedWeb-
  * class web curation runs where a flat `get_text` (the reference's
  * BeautifulSoup call, `processors/document_processor.py:21-37`, and
  * [[Ingest.htmlToText]]) keeps nav/footer/share chrome glued to the
  * prose.
  *
  * DELIBERATELY deterministic-rules-only (no DOM, no trained model)
  * so a SQL oracle replays every step: regex segmentation, integer
  * character/word counts, IEEE ratio thresholds, and a window-based
  * context pass. Divergences from jusText proper, documented: the
  * context pass adopts the PREVIOUS decided block's class (jusText
  * consults both sides); the stoplist is a parameter (jusText ships
  * per-language lists, and its 0.30/0.32 density defaults assume
  * them — the compact default list here uses lower cuts).
  *
  * Scale shape: one regex chain per document (codegen'd), one
  * bounded explode to blocks, per-doc windows for the context pass —
  * keyed shuffles only, nothing corpus².
  */
object Boilerplate {

  /** Compact English stoplist for the density signal; callers
    * curating other domains/languages pass their own. */
  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "this", "that", "was",
    "are", "be", "from", "but", "not")

  /** Block-level tags: a closing or opening occurrence ends the
    * current block. `html`/`head`/`title`/`body` are included so
    * head chrome never glues onto the first content block; the
    * `[\s/]` tail admits `<br/>` / `<hr />`. */
  private val BlockTagSplit: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|td|th|tr|table|" +
      "blockquote|pre|br|hr|section|article|header|footer|nav|" +
      "aside|main|figure|figcaption|form|fieldset|html|head|title|" +
      "body)(?:[\\s/][^>]*)?>"

  /** Inline-tag strip + the 6-entity decode + whitespace collapse —
    * the [[Ingest.htmlToText]] tail, shared by block text and anchor
    * text so densities are ratios of IDENTICALLY cleaned strings. */
  private def cleanFragment(b: Column): Column = {
    val noTags = regexp_replace(b, "(?s)<[^>]+>", " ")
    val entities = Seq("&nbsp;" -> " ", "&amp;" -> "&",
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'")
      .foldLeft(noTags) { case (c, (e, r)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(e), r) }
    trim(regexp_replace(entities, "\\s+", " "))
  }

  /** Script/style/comment removal — written WITHOUT the backreference
    * `</\1>` form so RE2-only engines replay it. */
  private def stripNonContent(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Per-block signal + classification table. Output: (idCol,
    * block_id, text, n_chars, n_words, link_density, stop_density,
    * cls_raw, cls) — block_id is the block's raw segmentation
    * position (gaps where empty inter-tag fragments were dropped),
    * cls_raw ∈ {good, bad, short, near}, cls the post-context
    * {good, bad}.
    *
    * Rules (jusText-shaped, thresholds as parameters):
    *  - link_density > maxLinkDensity             → bad
    *  - n_chars < lenLow ∧ link_density > 0       → bad
    *  - n_chars < lenLow                          → short
    *  - stop_density ≥ stopHigh ∧ n_chars > lenHigh → good
    *  - stop_density ≥ stopHigh                   → near
    *  - stop_density ≥ stopLow                    → near
    *  - else                                      → bad
    * Context: short/near adopt the PREVIOUS decided class (document
    * order), defaulting to bad at the document head. */
  def htmlBlocks(df: DataFrame, idCol: String, htmlCol: String,
      stopwords: Seq[String] = DefaultStopwords,
      maxLinkDensity: Double = 0.2, lenLow: Int = 70,
      lenHigh: Int = 200, stopLow: Double = 0.15,
      stopHigh: Double = 0.20): DataFrame = {
    require(stopwords.nonEmpty && maxLinkDensity >= 0 &&
      lenLow <= lenHigh && stopLow <= stopHigh, "bad thresholds")
    val blocks = df
      .select(col(idCol), posexplode(
        split(stripNonContent(col(htmlCol)), BlockTagSplit))
        .as(Seq("block_id", "rawb")))
      .withColumn("text", cleanFragment(col("rawb")))
      .filter(length(col("text")) > 0)
    val anchors = regexp_extract_all(col("rawb"),
      lit("(?is)<a[^>]*>(.*?)</a>"), lit(1))
    val toks = split(lower(col("text")), " ")
    val signals = blocks
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("link_chars",
        aggregate(transform(anchors, a => length(cleanFragment(a))),
          lit(0), (acc, x) => acc + x))
      .withColumn("link_density",
        least(lit(1.0),
          col("link_chars").cast("double") / col("n_chars")))
      .withColumn("stop_density",
        size(filter(toks, t => t.isin(stopwords.map(lit(_)): _*)))
          .cast("double") / col("n_words"))
    val clsRaw = when(col("link_density") > maxLinkDensity, "bad")
      .when(col("n_chars") < lenLow && col("link_density") > 0.0,
        "bad")
      .when(col("n_chars") < lenLow, "short")
      .when(col("stop_density") >= stopHigh,
        when(col("n_chars") > lenHigh, "good").otherwise("near"))
      .when(col("stop_density") >= stopLow, "near")
      .otherwise("bad")
    val w = Window.partitionBy(col(idCol)).orderBy(col("block_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    signals
      .withColumn("cls_raw", clsRaw)
      .withColumn("cls",
        when(col("cls_raw").isin("good", "bad"), col("cls_raw"))
          .otherwise(coalesce(
            last(when(col("cls_raw").isin("good", "bad"),
              col("cls_raw")), ignoreNulls = true).over(w),
            lit("bad"))))
      .select(col(idCol), col("block_id").cast("long").as("block_id"),
        col("text"), col("n_chars"), col("n_words"),
        col("link_density"), col("stop_density"), col("cls_raw"),
        col("cls"))
  }

  /** Outlink extraction — every `<a href="...">` target in document
    * order, the raw-HTML step web-graph construction starts from
    * (crawl frontier seeding, PageRank-class authority over the
    * corpus's own link structure, outlink-spam signals). Output:
    * (idCol, link_id, href) with link_id the 0-based position of the
    * anchor among the document's double-quoted hrefs; documents with
    * no links are absent. Runs on the COMMENT-STRIPPED page (links
    * inside `<script>`/`<style>`/comments are not content) but before
    * block segmentation — chrome links are kept, because link-graph
    * construction wants nav/footer edges too (it's the *text* paths
    * that drop them).
    *
    * Deliberately regex-level and double-quote-only (RE2 ∩ Java so a
    * SQL oracle replays it byte-exactly; single-quoted/bare hrefs are
    * out of the snapshot's scope and documented so). Scale shape:
    * one codegen'd regex chain per document + one bounded explode —
    * no shuffle at all until the caller aggregates edges. */
  def outlinks(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    df.select(col(idCol), posexplode(
        regexp_extract_all(stripNonContent(col(htmlCol)),
          lit("(?is)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\""), lit(1)))
        .as(Seq("link_id", "href")))
      .withColumn("link_id", col("link_id").cast("long"))

  /** Outlinks WITH their anchor text — the (href, text) pairs that
    * feed anchor-text aggregation, the classic off-page relevance
    * signal ("what the web calls this page"): per target, the terms
    * of every anchor pointing at it. Differs from [[outlinks]] in
    * requiring a well-formed `<a …>…</a>` (the text capture needs
    * the close tag); anchor text is cleaned with the SAME fragment
    * chain as block text. Output: (idCol, link_id, href, anchor);
    * anchors whose cleaned text is empty keep the row (href still a
    * link) with anchor = ''. Same regex-snapshot scope as
    * [[outlinks]]: double-quoted hrefs, RE2 ∩ Java. */
  def outlinksWithText(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val pat = lit("(?is)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>" +
      "(.*?)</a>")
    val stripped = stripNonContent(col(htmlCol))
    df.select(col(idCol), posexplode(arrays_zip(
        regexp_extract_all(stripped, pat, lit(1)),
        regexp_extract_all(stripped, pat, lit(2))))
        .as(Seq("link_id", "z")))
      .select(col(idCol), col("link_id").cast("long").as("link_id"),
        col("z.0").as("href"),
        cleanFragment(col("z.1")).as("anchor"))
  }

  /** HTML table extraction — `<table>` bodies to structured
    * (table_id, row_id, col_id, cell) records, the extraction step
    * table-QA / table-grounding corpora start from (a flat text path
    * smears cells together and loses the grid). Three nested bounded
    * explodes (tables → rows → cells), cells cleaned with the SAME
    * fragment chain as block text; `is_header` marks rows whose
    * FIRST cell tag is `<th>`. Same regex-snapshot scope as the rest
    * of the family (well-formed close tags, RE2 ∩ Java; nested
    * tables stay inside their outer cell's raw capture and are out
    * of the snapshot's scope, documented). */
  def htmlTables(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val tables = df.select(col(idCol), posexplode(
        regexp_extract_all(stripNonContent(col(htmlCol)),
          lit("(?is)<table[^>]*>(.*?)</table>"), lit(1)))
        .as(Seq("table_id", "tbl")))
    val rows = tables.select(col(idCol), col("table_id"), posexplode(
        regexp_extract_all(col("tbl"),
          lit("(?is)<tr[^>]*>(.*?)</tr>"), lit(1)))
        .as(Seq("row_id", "rowh")))
    rows.select(col(idCol), col("table_id").cast("long"),
        col("row_id").cast("long"),
        regexp_extract(col("rowh"), "(?is)<(t[dh])[^>]*>", 1)
          .as("first_tag"),
        posexplode(regexp_extract_all(col("rowh"),
          lit("(?is)<t[dh][^>]*>(.*?)</t[dh]>"), lit(1)))
          .as(Seq("col_id", "cellh")))
      .select(col(idCol), col("table_id"), col("row_id"),
        col("col_id").cast("long").as("col_id"),
        cleanFragment(col("cellh")).as("cell"),
        (lower(col("first_tag")) === "th").as("is_header"))
  }

  /** Grid → markdown-table linearization — the table-to-text step
    * table-QA/grounding corpora run over [[htmlTables]] output
    * (training text needs the GRID's structure back in token form;
    * flat extraction already smeared it). Assembly rule, declared so
    * a SQL oracle replays the bytes:
    *   - each row renders `| c0 | c1 | … |` (cells in col_id order);
    *   - when row 0 is a header row (`is_header`), a `| --- | … |`
    *     separator with row 0's column count follows it;
    *   - rows join with newlines in row_id order.
    * Output per table: (idCol, table_id, n_rows, n_cols, markdown)
    * where n_cols is the MAX row width (ragged rows render at their
    * own width — no cell invention). Two keyed aggregations on the
    * (doc, table) key, both bounded by table size; docs never
    * shuffle whole. */
  def linearizeTables(grid: DataFrame, idCol: String): DataFrame = {
    val rowStr = grid.groupBy(col(idCol), col("table_id"),
        col("row_id"))
      .agg(
        concat(lit("| "), concat_ws(" | ", transform(
          array_sort(collect_list(struct(col("col_id"), col("cell")))),
          s => s.getField("cell"))), lit(" |")).as("row_md"),
        count(lit(1)).as("row_w"),
        max(col("is_header")).as("row_hdr"))
    rowStr.groupBy(col(idCol), col("table_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        max(col("row_w")).as("n_cols"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("row_id"),
            col("row_md"), col("row_hdr"), col("row_w")))),
          s => when(s.getField("row_id") === 0 && s.getField("row_hdr"),
            concat(s.getField("row_md"), lit("\n| "),
              concat_ws(" | ", array_repeat(lit("---"),
                s.getField("row_w").cast("int"))), lit(" |")))
            .otherwise(s.getField("row_md")))).as("markdown"))
  }

  /** Page-level metadata extraction — the four signals web curation
    * reads BEFORE touching body text: the `<html lang="…">` declared
    * language (a prior for LID routing), the `<title>` (cleaned with
    * the same fragment chain as block text), the robots `noindex`
    * verdict (C4-class pipelines honor it as a consent signal), and
    * the `rel="canonical"` link (the page's OWN dedup key —
    * canonical-preferred URL dedup collapses alias URLs the string
    * canonicalizer cannot). Output: (idCol, html_lang, title,
    * noindex, canonical_url), missing signals NULL (noindex false).
    *
    * Regex-level, double-quoted, name-before-content attribute order
    * only (RE2 ∩ Java so a SQL oracle replays byte-exactly; the
    * bounded snapshot scope the outlink extractor documents). Runs
    * on the COMMENT/SCRIPT/STYLE-STRIPPED page like every other
    * extractor in this family — a noindex meta inside a comment or
    * a script string is not a consent signal and must not drop the
    * page. Pure per-row codegen'd chain, no shuffle. */
  def htmlMeta(df: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val h = stripNonContent(col(htmlCol))
    val langAttr = regexp_extract(h,
      "(?is)<html\\s[^>]*?lang\\s*=\\s*\"([^\"]*)\"", 1)
    val title = cleanFragment(regexp_extract(h,
      "(?is)<title[^>]*>(.*?)</title>", 1))
    val robots = lower(regexp_extract(h,
      "(?is)<meta\\s[^>]*?name\\s*=\\s*\"robots\"[^>]*?" +
        "content\\s*=\\s*\"([^\"]*)\"", 1))
    val canonical = regexp_extract(h,
      "(?is)<link\\s[^>]*?rel\\s*=\\s*\"canonical\"[^>]*?" +
        "href\\s*=\\s*\"([^\"]*)\"", 1)
    df.select(col(idCol),
      when(length(langAttr) > 0, lower(langAttr)).as("html_lang"),
      when(length(title) > 0, title).as("title"),
      robots.contains("noindex").as("noindex"),
      when(length(canonical) > 0, canonical).as("canonical_url"))
  }

  /** The kept prose only: good blocks re-joined in document order
    * with newlines. Output: (idCol, main_text); docs with no good
    * block are ABSENT (nothing extractable — callers union an
    * anti-join if they need explicit empties). */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String,
      stopwords: Seq[String] = DefaultStopwords): DataFrame =
    htmlBlocks(df, idCol, htmlCol, stopwords)
      .filter(col("cls") === "good")
      .groupBy(col(idCol))
      .agg(concat_ws("\n", transform(
        array_sort(collect_list(struct(col("block_id"), col("text")))),
        s => s.getField("text"))).as("main_text"))
}
