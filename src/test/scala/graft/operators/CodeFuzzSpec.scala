package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The line/URL parsers run over arbitrary crawl bytes — random
  * soup and mutations must never throw, and every emitted row must
  * satisfy its own arithmetic invariants. Deterministic seed. */
class CodeFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)
  private val frags = Array("+++ ", "--- ", "@@ ", "+", "-", " ctx",
    "\n", "def ", "class ", "import ", "from ", " import ", "x=1;",
    "    ", "https://", "http://", "?a=1", "&", "#f", "%%", "é",
    "://", "a.b.c", ":8080", "utm_x=1", "..", "|", "\"", "'")

  private def soup(): String =
    (0 until rnd.nextInt(60)).map(_ =>
      frags(rnd.nextInt(frags.length))).mkString

  private lazy val docs = (1 to 400).map(i => (i.toLong, soup()))
    .toDF("id", "text").localCheckpoint()

  test("diffStats on fuzz input: no exceptions; counts non-negative " +
      "and bounded by the line count") {
    val bad = Code.diffStats(docs, "id", "text")
      .filter(col("n_added") < 0 || col("n_removed") < 0 ||
        col("n_files") < 0 || col("n_hunks") < 0)
      .count()
    assert(bad === 0L)
    assert(Code.diffStats(docs, "id", "text").count() === 400L)
  }

  test("functionChunks on fuzz input: chunks partition the doc — " +
      "per-doc line counts sum to the doc's line count") {
    val got = Code.functionChunks(docs, "id", "text")
      .groupBy(col("id")).agg(sum(col("n_lines")).as("s"))
    val expect = docs.select(col("id"),
      size(split(col("text"), "\n")).cast("long").as("n"))
    assert(got.join(expect, Seq("id"))
      .filter(col("s") =!= col("n")).count() === 0L)
  }

  test("imports / canonicalizeUrl / lineCorrections on fuzz input: " +
      "no exceptions, outputs respect their contracts") {
    assert(Code.imports(docs, "id", "text")
      .filter(col("module").isNull || length(col("module")) === 0)
      .count() === 0L)
    val canon = docs.select(
      Corpus.canonicalizeUrl(col("text")).as("c"))
    // canonical strings, when produced, always carry scheme://host
    assert(canon.filter(col("c").isNotNull &&
      !col("c").contains("://")).count() === 0L)
    val lc = Corpus.lineCorrections(docs, "id", "text")
    assert(lc.filter(col("n_kept") > col("n_lines") ||
      (col("char_keep_ratio").isNotNull &&
        (col("char_keep_ratio") < 0 ||
          col("char_keep_ratio") > 1))).count() === 0L)
  }

  test("sentences on fuzz input: no exceptions; sentences are " +
      "non-empty, trimmed, and rebuild only from doc characters") {
    val s = Corpus.sentences(docs, "id", "text")
    assert(s.filter(length(col("sentence")) === 0 ||
      col("sentence").startsWith(" ") ||
      col("sentence").endsWith(" ")).count() === 0L)
    // ids contiguous from 0 per doc
    val ids = s.groupBy(col("id"))
      .agg(min(col("sent_id")).as("mn"), max(col("sent_id")).as("mx"),
        count(lit(1)).as("c"))
    assert(ids.filter(col("mn") =!= 0 ||
      col("mx") =!= col("c") - 1).count() === 0L)
  }

  test("identifierSubtokens / commentStats on fuzz input: " +
      "subtokens lowercase and non-empty; line classes partition " +
      "the doc") {
    val st = Code.identifierSubtokens(docs, "id", "text")
    assert(st.filter(length(col("subtoken")) === 0 ||
      col("subtoken") =!= lower(col("subtoken"))).count() === 0L)
    val cs = Code.commentStats(docs, "id", "text")
    val expect = docs.select(col("id"),
      size(split(col("text"), "\n")).cast("long").as("n"))
    assert(cs.join(expect, Seq("id"))
      .filter(col("n_code") + col("n_comment") + col("n_docstring") +
        col("n_blank") =!= col("n")).count() === 0L)
  }
}
