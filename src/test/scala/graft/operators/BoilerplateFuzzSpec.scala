package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The Boilerplate family runs over CRAWLED bytes — arbitrary,
  * truncated, mis-nested markup. Every extractor must fail CLOSED on
  * garbage: no exceptions, and every emitted row must satisfy its
  * own invariants (densities in [0,1], classes from the closed set,
  * non-null grid ids). Deterministic seed; random tag soup PLUS
  * char-level mutations of a valid page (the mode that finds walk
  * bugs — a quote flipped inside an attribute, a close tag
  * truncated). */
class BoilerplateFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private val frags = Array("<a href=\"", "\">", "</a>", "<p>",
    "</p>", "<table>", "<tr>", "<td>", "</td>", "</tr>", "</table>",
    "<script>", "</script>", "<!--", "-->", "&amp;", "&nbsp;", "\"",
    "'", "<", ">", "/", "the quick fox ", "A9 ", "\n", " lang=\"",
    "<html", "<meta name=\"robots\" content=\"", "noindex",
    "<link rel=\"canonical\" href=\"", "x=1; ", "<th>", "</th>")

  private def soup(): String =
    (0 until rnd.nextInt(40)).map(_ =>
      frags(rnd.nextInt(frags.length))).mkString

  private val valid = "<html lang=\"en\"><head><title>T &amp; t" +
    "</title><meta name=\"robots\" content=\"noindex\">" +
    "<link rel=\"canonical\" href=\"https://e.com/c\"></head>" +
    "<body><nav><a href=\"/\">Home</a></nav><p>good prose here</p>" +
    "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>" +
    "</body></html>"

  private def mutate(s: String): String = {
    val b = s.toCharArray
    val out = if (rnd.nextBoolean() && b.length > 1)
      b.take(1 + rnd.nextInt(b.length - 1)) else b
    for (_ <- 0 until rnd.nextInt(6) if out.nonEmpty)
      out(rnd.nextInt(out.length)) =
        "<>\"'&/abc"(rnd.nextInt(9))
    new String(out)
  }

  private lazy val docs = {
    val rows = (1 to 150).map(i => (i.toLong, soup())) ++
      (151 to 300).map(i => (i.toLong, mutate(valid)))
    rows.toDF("id", "html").localCheckpoint()
  }

  test("htmlBlocks on fuzz input: no exceptions, densities in " +
      "[0,1], classes from the closed sets") {
    val bad = Boilerplate.htmlBlocks(docs, "id", "html")
      .filter(!col("cls").isin("good", "bad") ||
        !col("cls_raw").isin("good", "bad", "short", "near") ||
        col("link_density") < 0 || col("link_density") > 1 ||
        col("stop_density") < 0 || col("stop_density") > 1 ||
        col("n_chars") <= 0)
      .count()
    assert(bad === 0L)
  }

  test("outlinks/outlinksWithText on fuzz input: no exceptions, " +
      "contiguous per-doc link ids, non-null hrefs") {
    val l1 = Boilerplate.outlinks(docs, "id", "html")
    assert(l1.filter(col("href").isNull || col("link_id") < 0)
      .count() === 0L)
    val l2 = Boilerplate.outlinksWithText(docs, "id", "html")
    assert(l2.filter(col("href").isNull || col("anchor").isNull)
      .count() === 0L)
    // link_id is a contiguous 0-based sequence per doc
    val gaps = l2.groupBy(col("id"))
      .agg(count(lit(1)).as("n"), max(col("link_id")).as("mx"))
      .filter(col("mx") =!= col("n") - 1).count()
    assert(gaps === 0L)
  }

  test("htmlMeta / htmlTables on fuzz input: no exceptions, " +
      "non-null flags and non-negative grid ids") {
    val m = Boilerplate.htmlMeta(docs, "id", "html")
    assert(m.filter(col("noindex").isNull).count() === 0L)
    assert(m.count() === 300L)
    val t = Boilerplate.htmlTables(docs, "id", "html")
    assert(t.filter(col("table_id") < 0 || col("row_id") < 0 ||
      col("col_id") < 0 || col("is_header").isNull ||
      col("cell").isNull).count() === 0L)
  }

  test("mainContent on fuzz input: no exceptions, newline-joined " +
      "good blocks only") {
    val mc = Boilerplate.mainContent(docs, "id", "html")
    assert(mc.filter(col("main_text").isNull).count() === 0L)
  }
}
