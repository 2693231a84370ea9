package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Code-corpus structure operators: the line-level parses a
  * commit/code pipeline runs after license/content triage —
  * unified-diff accounting (commit-message + diff corpora train on
  * the ADDED code, not the patch syntax) and function-level
  * chunking (retrieval/dedup units for code are definitions, not
  * fixed windows). Everything is line arithmetic + per-doc windows:
  * SQL-replayable, no shuffle beyond the doc key. */
object Code {

  /** Unified-diff accounting + added-code extraction. Per doc:
    * (idCol, n_files, n_hunks, n_added, n_removed, added_code) —
    * `+++ `/`--- ` file headers and `@@` hunk markers counted, NOT
    * treated as added/removed lines; `added_code` is the `+` lines
    * in patch order with the prefix stripped (what the trainer
    * actually reads). Docs that contain no diff markers yield
    * zero counts and empty added_code — the operator never guesses
    * whether a doc IS a diff (route upstream).
    *
    * Header disambiguation: hunk-body content can itself render as
    * `--- x` (a removed line whose content starts `-- x`) or
    * `+++ y` (an added `++ y`), so a `--- ` line is a FILE HEADER
    * only when the next line is `+++ `, and a `+++ ` line only when
    * the previous line is `--- ` — real unified diffs always emit
    * the header pair adjacently. The one remaining ambiguity (a
    * removed `-- x` line immediately followed by an added `++ y`
    * line, forging an adjacent header pair) requires full
    * hunk-length bookkeeping from the `@@ -a,b +c,d @@` counts and
    * is out of this line-local operator's scope, documented. */
  def diffStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = df.select(col(idCol), posexplode(
      split(col(textCol), "\n")).as(Seq("line_id", "line")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("line_id"))
    val nextLine = lead(col("line"), 1).over(w)
    val prevLine = lag(col("line"), 1).over(w)
    val withHdr = lines
      .withColumn("is_nf", col("line").startsWith("+++ ") &&
        coalesce(prevLine.startsWith("--- "), lit(false)))
      .withColumn("is_of", col("line").startsWith("--- ") &&
        coalesce(nextLine.startsWith("+++ "), lit(false)))
    val isAdd = col("line").startsWith("+") && !col("is_nf")
    val isDel = col("line").startsWith("-") && !col("is_of")
    val isHunk = col("line").startsWith("@@")
    withHdr.groupBy(col(idCol))
      .agg(
        sum(when(col("is_nf"), 1L).otherwise(0L)).as("n_files"),
        sum(when(isHunk, 1L).otherwise(0L)).as("n_hunks"),
        sum(when(isAdd, 1L).otherwise(0L)).as("n_added"),
        sum(when(isDel, 1L).otherwise(0L)).as("n_removed"),
        concat_ws("\n", transform(
          array_sort(collect_list(when(isAdd,
            struct(col("line_id"), col("line"))))),
          s => substring(s.getField("line"), 2, Int.MaxValue)))
          .as("added_code"))
  }

  /** Import extraction (Python convention): top-level `import X` /
    * `import X as Y` / `import X, Y, Z` (comma lists, each module
    * kept) / `from X import …` lines → the referenced modules, the
    * edge list dependency analysis starts from (module popularity
    * ranks, stdlib/third-party mix, dependency graphs feeding the
    * Graph family). Output one row per referenced module:
    * (idCol, line_id, module) — a comma-list line yields one row
    * per module, all sharing the line_id; dotted module paths kept
    * whole; indented (conditional/function-local) imports are
    * deliberately included, relative `from . import` forms yield no
    * module and are skipped. */
  def imports(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = df.select(col(idCol), posexplode(
      split(col(textCol), "\n")).as(Seq("line_id", "line")))
    val t = trim(col("line"))
    val fromMod = regexp_extract(t,
      "^from ([A-Za-z_][A-Za-z0-9_.]*) import ", 1)
    val mods = when(t.rlike("^import "),
        filter(transform(
          split(regexp_replace(t, "^import ", ""), ","),
          x => regexp_extract(trim(x),
            "^([A-Za-z_][A-Za-z0-9_.]*)", 1)),
          x => length(x) > 0))
      .otherwise(filter(array(fromMod), x => length(x) > 0))
    lines
      .select(col(idCol), col("line_id").cast("long").as("line_id"),
        explode(mods).as("module"))
  }

  /** Python keywords excluded from identifier extraction — the
    * fixed broadcast-literal list (VOCABULARY-sized; never a join). */
  val PythonKeywords: Seq[String] = Seq(
    "False", "None", "True", "and", "as", "assert", "async",
    "await", "break", "class", "continue", "def", "del", "elif",
    "else", "except", "finally", "for", "from", "global", "if",
    "import", "in", "is", "lambda", "nonlocal", "not", "or",
    "pass", "raise", "return", "try", "while", "with", "yield")

  /** Identifier extraction + subtoken splitting — the vocabulary
    * analysis a code-LM tokenizer budget starts from (camelCase /
    * snake_case compounds dominate code text, so raw-identifier
    * frequencies mislead; StarCoder/The-Stack-class studies count
    * SUBTOKENS). Per identifier occurrence one row per subtoken:
    * (idCol, ident, subtoken). The split grammar, declared:
    *   - identifiers are `[A-Za-z_][A-Za-z0-9_]*` runs (keywords in
    *     [[PythonKeywords]] dropped; string/comment contents are NOT
    *     lexed out — line-local extraction, documented);
    *   - boundaries: `_`, lower→Upper (`userName`), and the end of
    *     an acronym run (`HTTPServer` → `HTTP Server`);
    *   - subtokens are lowercased; empty fragments (from `__init__`
    *     edges) drop.
    * Pure per-row regex chain + one bounded explode — no shuffle;
    * aggregation is the caller's. */
  def identifierSubtokens(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val idents = filter(
      // regexp_extract_all needs a capturing group; group 1 is the
      // whole identifier.
      expr(s"regexp_extract_all($textCol, " +
        "'([A-Za-z_][A-Za-z0-9_]*)', 1)"),
      x => !x.isin(PythonKeywords: _*))
    val withIdent = df.select(col(idCol),
      explode(idents).as("ident"))
    val spaced = regexp_replace(
      regexp_replace(col("ident"), "([a-z0-9])([A-Z])", "$1 $2"),
      "([A-Z]+)([A-Z][a-z])", "$1 $2")
    withIdent.select(col(idCol), col("ident"),
      explode(filter(split(lower(spaced), "[_ ]+"),
        x => length(x) > 0)).as("subtoken"))
  }

  /** Comment/docstring accounting for Python-convention sources —
    * the comment-density signal code-quality gates use (a file that
    * is mostly comments is prose in disguise; zero comments on a
    * large file is its own smell). Line classes, in precedence
    * order, all replayable from a per-doc running triple-quote
    * marker count (cum BEFORE the line odd ⇒ inside a docstring):
    *   - `docstring`: inside, or the line carries a triple-quote;
    *   - `comment`: trimmed line starts `#`;
    *   - `blank`: trimmed line empty;
    *   - `code`: everything else.
    * Scope declared: `#` inside string literals and single-quoted
    * `'''` docstrings are not lexed (line-local rules — the
    * [[identifierSubtokens]] contract). Output per doc: (idCol,
    * n_code, n_comment, n_docstring, n_blank, comment_ratio) where
    * the ratio is (comment+docstring)/(code+comment+docstring),
    * NULL when the denominator is zero (all-blank docs have no
    * ratio — the NaN-routing guard every gate in this family
    * carries). One bounded explode + per-doc window + one keyed
    * agg. */
  def commentStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = df.select(col(idCol), posexplode(
      split(col(textCol), "\n")).as(Seq("line_id", "line")))
    val markers =
      ((length(col("line")) -
        length(regexp_replace(col("line"), "\"\"\"", ""))) / 3)
        .cast("long")
    val w = Window.partitionBy(col(idCol)).orderBy(col("line_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(markers).over(w) - markers
    val t = trim(col("line"))
    val cls = when(cumBefore % 2 === 1 || markers > 0, "docstring")
      .when(t.startsWith("#"), "comment")
      .when(length(t) === 0, "blank")
      .otherwise("code")
    val counted = lines.withColumn("cls", cls)
      .groupBy(col(idCol))
      .agg(
        sum(when(col("cls") === "code", 1L).otherwise(0L))
          .as("n_code"),
        sum(when(col("cls") === "comment", 1L).otherwise(0L))
          .as("n_comment"),
        sum(when(col("cls") === "docstring", 1L).otherwise(0L))
          .as("n_docstring"),
        sum(when(col("cls") === "blank", 1L).otherwise(0L))
          .as("n_blank"))
    val denom = col("n_code") + col("n_comment") + col("n_docstring")
    counted.withColumn("comment_ratio",
      when(denom > 0,
        (col("n_comment") + col("n_docstring")).cast("double") /
          denom.cast("double")))
  }

  /** Function-level chunking for indentation languages (the Python
    * `def `/`class `/`async def ` convention): every TOP-LEVEL
    * definition line (no leading whitespace) starts a new chunk,
    * and a run of top-level `@decorator` lines binds to the
    * definition it precedes (the chunk starts at the FIRST
    * decorator, so decorated defs keep their decorators); lines
    * before the first definition form chunk 0 (imports/prelude).
    * Output one row per chunk: (idCol, chunk_id, first_line,
    * n_lines, chunk). A running count over the per-doc line window
    * assigns chunk ids — bounded per doc, never corpus-wide.
    * Brace-language chunking needs a lexer and is out of this
    * operator's scope, documented. */
  def functionChunks(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = df.select(col(idCol), posexplode(
      split(col(textCol), "\n")).as(Seq("line_id", "line")))
    val isDefLine = col("line").rlike("^(async +def|def|class) ")
    val isDecLine = col("line").rlike("^@")
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("line_id"))
    val prevDec = coalesce(lag(isDecLine, 1).over(wOrd), lit(false))
    val isBoundary = (isDefLine || isDecLine) && !prevDec
    val w = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    lines
      .withColumn("chunk_id",
        sum(when(isBoundary, 1L).otherwise(0L)).over(w))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(min(col("line_id")).cast("long").as("first_line"),
        count(lit(1)).as("n_lines"),
        concat_ws("\n", transform(
          array_sort(collect_list(
            struct(col("line_id"), col("line")))),
          s => s.getField("line"))).as("chunk"))
  }
}
