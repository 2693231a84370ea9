package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** jusText-class block extraction: chrome dropped, prose kept, the
  * context pass promotes short blocks between good prose, and the
  * assembly preserves document order. */
class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private val prose1 = "the study of data in a system is one of the " +
    "most useful things that a team can do for the quality of this " +
    "work and for the people that depend on it every day in the " +
    "field and it is a habit that pays for itself by the end of " +
    "the first week of careful and honest measurement"
  private val prose2 = "it is not an accident that the best results " +
    "in this area are from teams that care about the data and the " +
    "process and that keep the same standard for every part of it " +
    "from the first sketch of an idea to the last report that is " +
    "sent out at the end of the quarter"

  private val page =
    "<html><head><title>T</title><style>p{}</style>" +
      "<script>bad()</script></head><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      s"<p>$prose1</p>" +
      "<h2>A heading</h2>" +
      s"<p>$prose2</p>" +
      "<div>Share: <a href='/t'>Tweet</a> <a href='/f'>Like</a></div>" +
      "<footer>Copyright <a href='/t'>Terms</a></footer></body></html>"

  test("nav/share/footer chrome is boilerplate, prose is good, and " +
      "a short heading BETWEEN good blocks is promoted by context") {
    val blocks = Boilerplate.htmlBlocks(
      Seq((1L, page)).toDF("id", "html"), "id", "html")
      .orderBy("block_id")
      .select("text", "cls_raw", "cls")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2)))
    val byText = blocks.map(b => b._1 -> b).toMap
    assert(byText("Home About")._3 === "bad")
    assert(byText(prose1)._3 === "good")
    // the heading is 'short' context-free, 'good' after context
    // (previous decided block is the good paragraph)
    assert(byText("A heading")._2 === "short")
    assert(byText("A heading")._3 === "good")
    assert(byText(prose2)._3 === "good")
    assert(byText("Share: Tweet Like")._3 === "bad")
    assert(byText("Copyright Terms")._3 === "bad")
    // script/style content never appears in any block
    assert(!blocks.exists(_._1.contains("bad()")))
    assert(!blocks.exists(_._1.contains("p{}")))
  }

  test("outlinks: double-quoted hrefs in document order, script/" +
      "style/comment links excluded, linkless docs absent") {
    val html1 = "<p>see <a href=\"https://a.com/1\">x</a> then " +
      "<a class=\"z\" href=\"/rel\">y</a></p>" +
      "<script>var a; // <a href=\"https://evil/\">no</a></script>" +
      "<!-- <a href=\"https://gone/\">no</a> -->" +
      "<a href=\"https://b.net/2\">z</a>" +
      "<a href='https://single.quoted/'>out of scope</a>"
    val out = Boilerplate.outlinks(
      Seq((1L, html1), (2L, "<p>no links at all</p>"))
        .toDF("id", "html"), "id", "html")
      .orderBy("id", "link_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq(
      (1L, 0L, "https://a.com/1"),
      (1L, 1L, "/rel"),
      (1L, 2L, "https://b.net/2")))
  }

  test("outlinksWithText: (href, cleaned anchor) pairs stay aligned " +
      "in document order; nested markup in anchors is stripped") {
    val html = "<p><a href=\"https://a.com/\">First &amp; " +
      "<b>bold</b></a> mid <a href=\"/rel\"><img src=\"x\"></a>" +
      "<a href=\"https://b.net/\">last</a></p>"
    val out = Boilerplate.outlinksWithText(
      Seq((1L, html)).toDF("id", "html"), "id", "html")
      .orderBy("link_id")
      .collect().map(r => (r.getLong(1), r.getString(2),
        r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, "https://a.com/", "First & bold"),
      (1L, "/rel", ""),
      (2L, "https://b.net/", "last")))
  }

  test("htmlTables: grid positions align, header rows flagged by " +
      "their first cell tag, script tables excluded, cells cleaned") {
    val html = "<table><tr><th>K</th><th>V</th></tr>" +
      "<tr><td>a &amp; b</td><td><b>2</b></td></tr></table>" +
      "<script>var t='<table><tr><td>no</td></tr></table>'</script>" +
      "<table><tr><td>x</td></tr></table>"
    val out = Boilerplate.htmlTables(
      Seq((1L, html)).toDF("id", "html"), "id", "html")
      .orderBy("table_id", "row_id", "col_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getBoolean(5)))
    assert(out.toSeq === Seq(
      (0L, 0L, 0L, "K", true),
      (0L, 0L, 1L, "V", true),
      (0L, 1L, 0L, "a & b", false),
      (0L, 1L, 1L, "2", false),
      (1L, 0L, 0L, "x", false)))
  }

  test("htmlMeta: lang lowercased, title entity-decoded, noindex " +
      "detected inside the content list, canonical extracted; " +
      "absent signals are null/false") {
    val p1 = "<html LANG=\"EN-us\"><head>" +
      "<title> A &amp; B   C </title>" +
      "<meta name=\"robots\" content=\"NOINDEX, nofollow\">" +
      "<link rel=\"canonical\" href=\"https://ex.com/c\">" +
      "</head><body><p>x</p></body></html>"
    val p2 = "<html><head><title></title>" +
      "<meta name=\"robots\" content=\"index, follow\">" +
      "</head><body>y</body></html>"
    val out = Boilerplate.htmlMeta(
      Seq((1L, p1), (2L, p2)).toDF("id", "html"), "id", "html")
      .orderBy("id")
      .collect().map(r => (Option(r.getString(1)),
        Option(r.getString(2)), r.getBoolean(3),
        Option(r.getString(4))))
    assert(out.toSeq === Seq(
      (Some("en-us"), Some("A & B C"), true, Some("https://ex.com/c")),
      (None, None, false, None)))
    // a noindex inside a comment or script string is NOT consent —
    // htmlMeta runs on the stripped page like the rest of the family
    val p3 = "<html><head><title>ok</title>" +
      "<!-- <meta name=\"robots\" content=\"noindex\"> -->" +
      "<script>d('<meta name=\"robots\" content=\"noindex\">')" +
      "</script></head><body>x</body></html>"
    val m3 = Boilerplate.htmlMeta(
      Seq((3L, p3)).toDF("id", "html"), "id", "html").head
    assert(m3.getBoolean(3) === false)
    assert(m3.getString(2) === "ok")
  }

  test("mainContent assembles only good blocks in document order; " +
      "a doc with no good block is absent") {
    val out = Boilerplate.mainContent(
      Seq((1L, page),
        (2L, "<body><nav><a href='/'>Only</a> chrome</nav></body>"))
        .toDF("id", "html"), "id", "html")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.keySet === Set(1L))
    assert(out(1L) === s"$prose1\nA heading\n$prose2")
  }

  test("entities decode and whitespace collapses in block text and " +
      "in anchor text (densities are ratios of identically cleaned " +
      "strings)") {
    val html = "<body><p>x &amp;&nbsp; y&lt;z&gt; &quot;q&#39; " +
      " \t\n end</p></body>"
    val t = Boilerplate.htmlBlocks(
      Seq((1L, html)).toDF("id", "html"), "id", "html")
      .select("text").head().getString(0)
    assert(t === "x & y<z> \"q' end")
  }

  test("a link-saturated long block is bad regardless of stopword " +
      "density (the link_density rule fires first)") {
    val linky = "<body><div>" + (1 to 30).map(i =>
      s"<a href='/$i'>the of and to in is it on for $i</a>")
      .mkString(" ") + "</div></body>"
    val cls = Boilerplate.htmlBlocks(
      Seq((1L, linky)).toDF("id", "html"), "id", "html")
      .select("cls").head().getString(0)
    assert(cls === "bad")
  }

  test("linearizeTables: header table gets a separator at row 0's " +
      "width, headerless doesn't, ragged rows render at their own " +
      "width, cells rejoin in col order") {
    val html = "<body>" +
      "<table><tr><th>a</th><th>b</th></tr>" +
      "<tr><td>1</td><td>2</td></tr>" +
      "<tr><td>only</td></tr></table>" + // ragged 1-cell row
      "<table><tr><td>x</td><td>y</td></tr></table>" + // no header
      "</body>"
    val out = Boilerplate.linearizeTables(
      Boilerplate.htmlTables(
        Seq((1L, html)).toDF("id", "html"), "id", "html"), "id")
      .orderBy("table_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq === Seq(
      (0L, 3L, 2L,
        "| a | b |\n| --- | --- |\n| 1 | 2 |\n| only |"),
      (1L, 1L, 2L, "| x | y |")))
  }
}
