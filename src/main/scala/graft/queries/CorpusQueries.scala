package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.operators.{Corpus, Dedup, Eval}

/** Corpus-curation suite: the steps between dedup and packing that a
  * training-data pipeline runs corpus-wide — summarization-eval
  * overlap stats (ROUGE), cluster-level dedup policy, source
  * blocklisting, exact length quantiles, and curriculum ordering.
  * Every query has a value-exact DuckDB oracle; the operators live in
  * [[graft.operators.Corpus]] / [[graft.operators.Eval]] /
  * [[graft.operators.Dedup]].
  */
object CorpusQueries {

  /** Snapshotted public-suffix-list fixture for q158 (plain rules
    * only — the longest-match core of the PSL; wildcard/exception
    * rules are documented out of scope in
    * [[graft.operators.Corpus.registrableDomains]]). Shared verbatim
    * with the oracle's VALUES list so both engines match against the
    * identical snapshot. */
  private val PslFixture: Seq[String] = Seq(
    "com", "net", "org", "edu", "gov", "io", "uk", "au", "jp",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "co.jp", "github.io")

  /** Synthetic raw-URL provenance: 8 hosts cycling by doc_id,
    * chosen to exercise every PSL branch — multi-label suffix
    * (co.uk, two hosts collapsing into ONE bbc.co.uk domain),
    * suffix-wins-over-TLD precedence (github.io beats io, so each
    * subdomain IS its own registrable domain), the 1-label default
    * (example.com), and the no-rule fallback (weird.internal →
    * prevailing-rule last label). */
  private val UrlHosts: Seq[String] = Seq(
    "news.bbc.co.uk", "www.bbc.co.uk", "docs.github.io",
    "api.github.io", "example.com", "www.example.com",
    "data.example.com", "weird.internal")

  /** q158: per-registrable-domain (eTLD+1) caps over raw-URL
    * provenance — [[graft.operators.Corpus.urlHost]] +
    * [[graft.operators.Corpus.registrableDomains]] (longest-suffix
    * match against the broadcast PSL snapshot), then the q107
    * per-group cap keyed on etld1 instead of raw host: the
    * C4/RefinedWeb "per domain" is eTLD+1, so news.bbc.co.uk and
    * www.bbc.co.uk share ONE cap budget. The oracle replays host
    * extraction (shared regex), the longest-suffix match (a
    * label-boundary LIKE join over the same VALUES snapshot), the
    * default rule, and the capped row_number — value-exact. */
  def q158DomainCap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hostsArr = array(UrlHosts.map(lit): _*)
    val urls = documents(s, d).select(col("doc_id"),
      concat(lit("https://"),
        element_at(hostsArr, (col("doc_id") % 8 + 1).cast("int")),
        lit("/p/"), col("doc_id").cast("string")).as("url"))
    val out = Corpus.registrableDomains(urls, "url",
      PslFixture.toDF("suffix"))
    graft.operators.Split.capPerGroup(
        out.select(col("doc_id"), col("host"), col("public_suffix"),
          col("etld1")),
        "etld1", "doc_id", n = 3)
      .orderBy(col("doc_id"))
  }

  private val q158Oracle: String = {
    val pslValues = PslFixture.map(sf => s"('$sf')").mkString(", ")
    val hostList = UrlHosts.map(h => s"'$h'").mkString("[", ", ", "]")
    raw"""WITH psl AS (SELECT * FROM (VALUES $pslValues) p(suffix)),
      |u AS (
      |  SELECT doc_id, 'https://' ||
      |    $hostList[CAST(doc_id % 8 + 1 AS INT)] ||
      |    '/p/' || CAST(doc_id AS VARCHAR) AS url
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, lower(regexp_extract(url,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)', 1))
      |    AS host
      |  FROM u),
      |m AS (
      |  SELECT host, MAX(len(string_split(suffix, '.'))) AS mm
      |  FROM (SELECT DISTINCT host FROM h) hh JOIN psl
      |    ON hh.host = psl.suffix OR hh.host LIKE '%.' || psl.suffix
      |  GROUP BY host),
      |fin AS (
      |  SELECT doc_id, host,
      |    string_split(host, '.') AS ls,
      |    COALESCE(mm, 1) AS mm
      |  FROM h LEFT JOIN m USING (host)),
      |dom AS (
      |  SELECT doc_id, host,
      |    array_to_string(ls[len(ls)-mm+1:len(ls)], '.')
      |      AS public_suffix,
      |    CASE WHEN len(ls) > mm THEN
      |      array_to_string(ls[len(ls)-mm:len(ls)], '.') END AS etld1
      |  FROM fin),
      |capped AS (
      |  SELECT doc_id, host, public_suffix, etld1,
      |    row_number() OVER (PARTITION BY etld1 ORDER BY doc_id)
      |      AS group_rank
      |  FROM dom)
      |SELECT doc_id, host, public_suffix, etld1, group_rank
      |FROM capped WHERE group_rank <= 3
      |ORDER BY doc_id""".stripMargin
  }

  /** Stopword list for the q231 density signal, tuned to the
    * synthetic corpus vocabulary (the operator's density thresholds
    * assume the list covers the domain's function-word mass; see
    * [[graft.operators.Boilerplate]] scaladoc). Shared verbatim with
    * the oracle. */
  private val Q231Stops: Seq[String] = Seq(
    "a", "the", "table", "data", "value", "row", "scan", "part",
    "join", "batch")

  /** q231: jusText-class main-content HTML extraction
    * ([[graft.operators.Boilerplate.htmlBlocks]]) — every document
    * wrapped in a realistic page (head chrome, nav links, heading,
    * body paragraph, share bar, footer) and segmented at block tags;
    * per block the link-density / length / stopword-density rules
    * plus the context pass classify nav/share/footer as boilerplate
    * and keep the body prose. The oracle replays segmentation (RE2 ∩
    * Java regex — the script/style strip deliberately avoids
    * backreferences), the entity-decode chain, the integer counts,
    * the IEEE density ratios, and the window context pass —
    * value-exact per block. */
  def q231HtmlMainContent(s: SparkSession, d: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>p{color:red}</style>" +
        "<script>var x=1;</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact</a></nav>" +
        "<h1>Entry "), col("doc_id").cast("string"),
      lit("</h1><p>"), col("text"),
      lit("</p><div>Share: <a href=\"/tw\">Tweet</a> " +
        "<a href=\"/fb\">Like</a></div>" +
        "<footer>Copyright 2026 Example " +
        "<a href=\"/terms\">Terms of use</a></footer></body></html>"))
    val docs = documents(s, d).select(col("doc_id"), html.as("html"))
    graft.operators.Boilerplate.htmlBlocks(docs, "doc_id", "html",
        stopwords = Q231Stops)
      .select(col("doc_id"), col("block_id"),
        md5(col("text")).as("text_md5"), col("n_chars"),
        col("n_words"), col("link_density"), col("stop_density"),
        col("cls_raw"), col("cls"))
      .orderBy(col("doc_id"), col("block_id"))
  }

  /** SQL form of [[graft.operators.Boilerplate]]'s fragment-clean
    * chain (tag strip, 6-entity decode, whitespace collapse). */
  private def cleanSql(x: String): String =
    s"""trim(regexp_replace(replace(replace(replace(replace(
      |replace(replace(regexp_replace($x, '(?s)<[^>]+>', ' ', 'g'),
      |'&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
      |'&quot;', '"'), '&#39;', ''''), '\\s+', ' ', 'g'))"""
      .stripMargin.replace("\n", " ")

  /** The q231 block-classification chain (segmentation → clean →
    * signals → rules → context window) over a caller-supplied
    * `$src(doc_id, html)` CTE — shared by q231 and the composed
    * q242. Ends at `c2(doc_id, block_id, text, …, cls)`. */
  private def blockCtes(src: String): String = {
    val stops = Q231Stops.map(w => s"'$w'").mkString("[", ", ", "]")
    val clean = cleanSql _
    raw"""sp AS (
      |  SELECT doc_id, regexp_split_to_array(
      |    regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g'),
      |    '(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|td|th|tr|table|blockquote|pre|br|hr|section|article|header|footer|nav|aside|main|figure|figcaption|form|fieldset|html|head|title|body)(?:[\s/][^>]*)?>')
      |    AS arr
      |  FROM $src),
      |blk AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(arr)),
      |    i -> {'bid': i - 1, 'rawb': arr[i]})) AS b
      |  FROM sp),
      |cl AS (
      |  SELECT doc_id, b.bid AS block_id, b.rawb AS rawb,
      |    ${clean("b.rawb")} AS text
      |  FROM blk),
      |nz AS (SELECT * FROM cl WHERE len(text) > 0),
      |sig AS (
      |  SELECT doc_id, block_id, text,
      |    len(text) AS n_chars,
      |    len(string_split(lower(text), ' ')) AS n_words,
      |    COALESCE(list_sum(list_transform(
      |      regexp_extract_all(rawb, '(?is)<a[^>]*>(.*?)</a>', 1),
      |      a -> len(${clean("a")}))), 0) AS link_chars,
      |    len(list_filter(string_split(lower(text), ' '),
      |      t -> list_contains($stops, t))) AS n_stop
      |  FROM nz),
      |dens AS (
      |  SELECT doc_id, block_id, text, n_chars, n_words,
      |    least(1.0, CAST(link_chars AS DOUBLE) / n_chars)
      |      AS link_density,
      |    CAST(n_stop AS DOUBLE) / n_words AS stop_density
      |  FROM sig),
      |c1 AS (
      |  SELECT *, CASE
      |    WHEN link_density > 0.2 THEN 'bad'
      |    WHEN n_chars < 70 AND link_density > 0.0 THEN 'bad'
      |    WHEN n_chars < 70 THEN 'short'
      |    WHEN stop_density >= 0.20 THEN
      |      CASE WHEN n_chars > 200 THEN 'good' ELSE 'near' END
      |    WHEN stop_density >= 0.15 THEN 'near'
      |    ELSE 'bad' END AS cls_raw
      |  FROM dens),
      |c2 AS (
      |  SELECT *, CASE WHEN cls_raw IN ('good', 'bad') THEN cls_raw
      |    ELSE COALESCE(last_value(
      |      CASE WHEN cls_raw IN ('good', 'bad') THEN cls_raw END
      |      IGNORE NULLS) OVER (PARTITION BY doc_id
      |      ORDER BY block_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      CURRENT ROW), 'bad') END AS cls
      |  FROM c1)""".stripMargin
  }

  private val q231Oracle: String = {
    raw"""WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>p{color:red}</style>' ||
      |    '<script>var x=1;</script></head><body>' ||
      |    '<nav><a href="/">Home</a> <a href="/about">About</a> ' ||
      |    '<a href="/contact">Contact</a></nav>' ||
      |    '<h1>Entry ' || CAST(doc_id AS VARCHAR) || '</h1><p>' ||
      |    text ||
      |    '</p><div>Share: <a href="/tw">Tweet</a> ' ||
      |    '<a href="/fb">Like</a></div>' ||
      |    '<footer>Copyright 2026 Example ' ||
      |    '<a href="/terms">Terms of use</a></footer></body></html>'
      |    AS html
      |  FROM documents),
      |${blockCtes("h")}
      |SELECT doc_id, block_id, md5(text) AS text_md5, n_chars,
      |  n_words, link_density, stop_density, cls_raw, cls
      |FROM c2 ORDER BY doc_id, block_id""".stripMargin
  }

  /** q232: outlink web-graph construction from raw HTML
    * ([[graft.operators.Boilerplate.outlinks]] →
    * [[graft.operators.Corpus.urlHost]]) — every page carries two
    * absolute cross-host links (hosts a deterministic function of
    * doc_id over the q158 fixture list), one relative link (resolves
    * to the source host), and one link INSIDE a script tag (must not
    * be extracted); edges aggregate to (src_host, dst_host) with
    * link and distinct-document weights — the host graph the Graph
    * family (PageRank/HITS/components) consumes. The oracle replays
    * the script strip, the href regex, host resolution, and the edge
    * aggregation. */
  def q232OutlinkGraph(s: SparkSession, d: String): DataFrame =
    outlinkResolved(s, d)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("src_host"), col("dst_host"))

  /** Shared q232/q234 device: synthetic pages → extracted hrefs →
    * per-link resolved (doc_id, src_host, dst_host). */
  private[queries] def outlinkResolved(s: SparkSession,
      d: String): DataFrame = {
    val hostsArr = array(UrlHosts.map(lit): _*)
    def hostAt(e: org.apache.spark.sql.Column) =
      element_at(hostsArr, (e % 8).cast("int") + 1)
    val html = concat(
      lit("<html><body><p>Doc "), col("doc_id").cast("string"),
      lit(" cites <a href=\"https://"),
      hostAt(col("doc_id") * 3 + 1),
      lit("/x/"), col("doc_id").cast("string"),
      lit("\">one</a> and <a href=\"https://"),
      hostAt(col("doc_id") + 5),
      lit("/y\">two</a> plus <a href=\"/local/"),
      col("doc_id").cast("string"),
      lit("\">self</a>.</p><script>var u=1; // <a " +
        "href=\"https://evil.example/\">x</a></script>" +
        "</body></html>"))
    val docs = documents(s, d).select(col("doc_id"),
      hostAt(col("doc_id")).as("src_host"), html.as("html"))
    graft.operators.Boilerplate
      .outlinks(docs.select(col("doc_id"), col("html")), "doc_id",
        "html")
      .join(docs.select(col("doc_id"), col("src_host")), Seq("doc_id"))
      .withColumn("dst_host",
        coalesce(Corpus.urlHost(col("href")), col("src_host")))
      .select(col("doc_id"), col("src_host"), col("dst_host"))
  }

  /** The h/x/e CTE chain both the q232 oracle and the q234 composed
    * oracle start from: page synthesis, comment/script strip, href
    * extraction, host resolution. Ends at `e(doc_id, src_host,
    * dst_host)`. */
  private[queries] val OutlinkCtes: String = {
    val hostList = UrlHosts.map(h => s"'$h'").mkString("[", ", ", "]")
    raw"""h AS (
      |  SELECT doc_id,
      |    $hostList[CAST(doc_id % 8 AS INT) + 1] AS src_host,
      |    '<html><body><p>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    ' cites <a href="https://' ||
      |    $hostList[CAST((doc_id * 3 + 1) % 8 AS INT) + 1] ||
      |    '/x/' || CAST(doc_id AS VARCHAR) ||
      |    '">one</a> and <a href="https://' ||
      |    $hostList[CAST((doc_id + 5) % 8 AS INT) + 1] ||
      |    '/y">two</a> plus <a href="/local/' ||
      |    CAST(doc_id AS VARCHAR) ||
      |    '">self</a>.</p><script>var u=1; // <a ' ||
      |    'href="https://evil.example/">x</a></script>' ||
      |    '</body></html>' AS html
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, src_host, unnest(regexp_extract_all(
      |    regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g'),
      |    '(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"', 1)) AS href
      |  FROM h),
      |e AS (
      |  SELECT doc_id, src_host,
      |    COALESCE(NULLIF(lower(regexp_extract(href,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)',
      |      1)), ''), src_host) AS dst_host
      |  FROM x)""".stripMargin
  }

  private val q232Oracle: String =
    s"""WITH $OutlinkCtes
      |SELECT src_host, dst_host, COUNT(*) AS n_links,
      |  COUNT(DISTINCT doc_id) AS n_docs
      |FROM e GROUP BY src_host, dst_host
      |ORDER BY src_host, dst_host""".stripMargin

  /** q233: URL canonicalization + exact URL dedup
    * ([[graft.operators.Corpus.canonicalizeUrl]]) — four raw
    * variants per path (case-mangled scheme/host, explicit :443,
    * `utm_*`/`gclid` tracking params, permuted param order, fragment;
    * plus a distinct http://:8080 family whose `ref` param drops and
    * whose non-default port survives) collapse onto canonical keys;
    * the dedup keeps the first doc and counts raw forms. The oracle
    * replays every canonicalization step string-for-string. */
  /** The q233 synthetic raw-URL variant column (shared with q237). */
  private def urlVariantsCol: org.apache.spark.sql.Column = {
    val v = col("doc_id") % 4
    val pid = (col("doc_id") % 50).cast("string")
    when(v === 0, concat(
        lit("HTTPS://WWW.Example.COM/a/"), pid, lit("?b=2&a=1")))
      .when(v === 1, concat(lit("https://www.example.com:443/a/"),
        pid, lit("?a=1&utm_source=feed&b=2#frag")))
      .when(v === 2, concat(lit("https://www.example.com/a/"), pid,
        lit("?utm_campaign=x&b=2&a=1&gclid=99")))
      .otherwise(concat(lit("http://other.net:8080/p/"), pid,
        lit("?ref=rss")))
  }

  def q233UrlCanonicalDedup(s: SparkSession, d: String): DataFrame = {
    documents(s, d).select(col("doc_id"), urlVariantsCol.as("url"))
      .withColumn("canon", Corpus.canonicalizeUrl(col("url")))
      .groupBy(col("canon"))
      .agg(min(col("doc_id")).as("first_doc"),
        count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_raw_forms"))
      .orderBy(col("canon"))
  }

  /** The c/p/k canonicalization-replay chain over a caller-supplied
    * `u(doc_id, url)` CTE — shared by q233 and the composed q237.
    * Ends at `k(doc_id, url, canon)`. */
  private[queries] def canonCtes(src: String): String =
    raw"""c AS (
      |  SELECT doc_id, url,
      |    lower(regexp_extract(url,
      |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(lower(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)',
      |      1)), '\.$$', '') AS host,
      |    regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^:/?#]*:([0-9]+)',
      |      1) AS port,
      |    regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
      |    regexp_extract(regexp_replace(url, '(?s)#.*', ''),
      |      '(?s)\?(.*)', 1) AS qry
      |  FROM $src),
      |p AS (
      |  SELECT doc_id, url, scheme, host, port, path,
      |    array_to_string(list_sort(list_filter(
      |      string_split(qry, '&'),
      |      q -> len(q) > 0 AND NOT starts_with(q, 'utm_')
      |        AND NOT list_contains(
      |          ['gclid', 'fbclid', 'msclkid', 'ref'],
      |          string_split(q, '=')[1]))), '&') AS joined
      |  FROM c),
      |k AS (
      |  SELECT doc_id, url,
      |    CASE WHEN len(host) > 0 THEN scheme || '://' || host ||
      |      CASE WHEN len(port) > 0
      |          AND NOT (scheme = 'http' AND port = '80')
      |          AND NOT (scheme = 'https' AND port = '443')
      |        THEN ':' || port ELSE '' END ||
      |      CASE WHEN len(path) = 0 THEN '/' ELSE path END ||
      |      CASE WHEN len(joined) > 0 THEN '?' || joined
      |        ELSE '' END END AS canon
      |  FROM p)""".stripMargin

  /** The q233 synthetic raw-URL variants as a `u(doc_id, url)` CTE
    * body. */
  private val UrlVariantsCte: String =
    raw"""u AS (
      |  SELECT doc_id, CASE
      |    WHEN doc_id % 4 = 0 THEN 'HTTPS://WWW.Example.COM/a/' ||
      |      CAST(doc_id % 50 AS VARCHAR) || '?b=2&a=1'
      |    WHEN doc_id % 4 = 1 THEN
      |      'https://www.example.com:443/a/' ||
      |      CAST(doc_id % 50 AS VARCHAR) ||
      |      '?a=1&utm_source=feed&b=2#frag'
      |    WHEN doc_id % 4 = 2 THEN 'https://www.example.com/a/' ||
      |      CAST(doc_id % 50 AS VARCHAR) ||
      |      '?utm_campaign=x&b=2&a=1&gclid=99'
      |    ELSE 'http://other.net:8080/p/' ||
      |      CAST(doc_id % 50 AS VARCHAR) || '?ref=rss' END AS url
      |  FROM documents)""".stripMargin

  private val q233Oracle: String =
    s"""WITH $UrlVariantsCte,
      |${canonCtes("u")}
      |SELECT canon, MIN(doc_id) AS first_doc, COUNT(*) AS n_urls,
      |  COUNT(DISTINCT url) AS n_raw_forms
      |FROM k GROUP BY canon ORDER BY canon""".stripMargin

  /** Synthetic page column for q236/q237: lang attribute cycles
    * en/DE/absent, a robots meta is present for half the ids (one
    * noindex, one index), EVEN ids carry a `rel="canonical"` link
    * onto a page/<id%25> key that unifies MORE than the raw URL
    * does, and the title carries an entity so the decode chain is
    * exercised. */
  private def langFragCol = when(col("doc_id") % 3 === 0,
      lit(" lang=\"en\""))
    .when(col("doc_id") % 3 === 1, lit(" lang=\"DE\""))
    .otherwise(lit(""))
  private def robotsFragCol = when(col("doc_id") % 4 === 1,
      lit("<meta name=\"robots\" content=\"noindex, nofollow\">"))
    .when(col("doc_id") % 4 === 2,
      lit("<meta name=\"robots\" content=\"index, follow\">"))
    .otherwise(lit(""))
  private def canonFragCol = when(col("doc_id") % 2 === 0, concat(
      lit("<link rel=\"canonical\" " +
        "href=\"https://www.example.com/page/"),
      (col("doc_id") % 25).cast("string"), lit("\">")))
    .otherwise(lit(""))

  private def metaPageCol: org.apache.spark.sql.Column =
    concat(lit("<html"), langFragCol, lit("><head><title>Doc "),
      col("doc_id").cast("string"), lit(" &amp; notes</title>"),
      robotsFragCol, canonFragCol, lit("</head><body><p>"),
      col("text"), lit("</p></body></html>"))

  private val LangFragSql: String =
    """CASE WHEN doc_id % 3 = 0 THEN ' lang="en"'
      |         WHEN doc_id % 3 = 1 THEN ' lang="DE"'
      |         ELSE '' END""".stripMargin
  private val RobotsFragSql: String =
    """CASE WHEN doc_id % 4 = 1 THEN
      |        '<meta name="robots" content="noindex, nofollow">'
      |      WHEN doc_id % 4 = 2 THEN
      |        '<meta name="robots" content="index, follow">'
      |      ELSE '' END""".stripMargin
  private val CanonFragSql: String =
    """CASE WHEN doc_id % 2 = 0 THEN
      |        '<link rel="canonical" ' ||
      |        'href="https://www.example.com/page/' ||
      |        CAST(doc_id % 25 AS VARCHAR) || '">'
      |      ELSE '' END""".stripMargin

  /** The q236/q237 page synthesis as a `pg(doc_id, html)` CTE. */
  private val MetaPageCte: String =
    s"""pg AS (
      |  SELECT doc_id,
      |    '<html' ||
      |    $LangFragSql ||
      |    '><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    ' &amp; notes</title>' ||
      |    $RobotsFragSql ||
      |    $CanonFragSql ||
      |    '</head><body><p>' || text || '</p></body></html>' AS html
      |  FROM documents)""".stripMargin

  /** The four metadata signal extractions over `pg`, as a
    * `mx(doc_id, l, t, r, cu)` CTE (raw regex captures; empties not
    * yet nulled). */
  private val MetaExtractCte: String =
    raw"""mxs AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g') AS html
      |  FROM pg),
      |mx AS (
      |  SELECT doc_id,
      |    regexp_extract(html,
      |      '(?is)<html\s[^>]*?lang\s*=\s*"([^"]*)"', 1) AS l,
      |    ${cleanSql(raw"""regexp_extract(html,
      |      '(?is)<title[^>]*>(.*?)</title>', 1)""")} AS t,
      |    lower(regexp_extract(html,
      |      '(?is)<meta\s[^>]*?name\s*=\s*"robots"[^>]*?content\s*=\s*"([^"]*)"',
      |      1)) AS r,
      |    regexp_extract(html,
      |      '(?is)<link\s[^>]*?rel\s*=\s*"canonical"[^>]*?href\s*=\s*"([^"]*)"',
      |      1) AS cu
      |  FROM mxs)""".stripMargin

  /** q236: page-metadata extraction
    * ([[graft.operators.Boilerplate.htmlMeta]]) — declared-language
    * attribute (lowercased), cleaned title (entity decode), robots
    * noindex verdict, canonical link; every signal deliberately
    * absent on a slice of ids so the NULL paths are value-checked
    * too. */
  def q236HtmlMeta(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      metaPageCol.as("html"))
    graft.operators.Boilerplate.htmlMeta(docs, "doc_id", "html")
      .orderBy(col("doc_id"))
  }

  private val q236Oracle: String =
    s"""WITH $MetaPageCte,
      |$MetaExtractCte
      |SELECT doc_id,
      |  CASE WHEN len(l) > 0 THEN lower(l) END AS html_lang,
      |  CASE WHEN len(t) > 0 THEN t END AS title,
      |  contains(r, 'noindex') AS noindex,
      |  CASE WHEN len(cu) > 0 THEN cu END AS canonical_url
      |FROM mx ORDER BY doc_id""".stripMargin

  /** q237: canonical-link-PREFERRED URL dedup — the composition web
    * pipelines actually run: the page's own `rel="canonical"` beats
    * string canonicalization when present (EVEN ids collapse onto
    * page/<id%25> keys that unify across distinct raw paths — alias
    * structure no string rule can see), raw URLs fall back to
    * [[graft.operators.Corpus.canonicalizeUrl]]. The oracle chains
    * the page synthesis + extraction CTEs into the q233
    * canonicalization replay. */
  def q237CanonicalPreferredDedup(s: SparkSession,
      d: String): DataFrame = {
    val pages = documents(s, d).select(col("doc_id"),
      urlVariantsCol.as("url"), metaPageCol.as("html"))
    val meta = graft.operators.Boilerplate
      .htmlMeta(pages, "doc_id", "html")
      .select(col("doc_id"), col("canonical_url"))
    pages.join(meta, Seq("doc_id"))
      .withColumn("canon", Corpus.canonicalizeUrl(
        coalesce(col("canonical_url"), col("url"))))
      .groupBy(col("canon"))
      .agg(min(col("doc_id")).as("first_doc"),
        count(lit(1)).as("n_pages"),
        sum(when(col("canonical_url").isNotNull, 1L).otherwise(0L))
          .as("n_via_canonical"))
      .orderBy(col("canon"))
  }

  private val q237Oracle: String =
    s"""WITH $MetaPageCte,
      |$MetaExtractCte,
      |$UrlVariantsCte,
      |eff AS (
      |  SELECT u.doc_id,
      |    COALESCE(NULLIF(mx.cu, ''), u.url) AS url,
      |    CASE WHEN len(mx.cu) > 0 THEN 1 ELSE 0 END AS via_canon
      |  FROM u JOIN mx ON mx.doc_id = u.doc_id),
      |u2 AS (SELECT doc_id, url FROM eff),
      |${canonCtes("u2")}
      |SELECT k.canon, MIN(k.doc_id) AS first_doc,
      |  COUNT(*) AS n_pages,
      |  CAST(SUM(eff.via_canon) AS BIGINT) AS n_via_canonical
      |FROM k JOIN eff ON eff.doc_id = k.doc_id
      |GROUP BY k.canon ORDER BY k.canon""".stripMargin

  /** The q242 page: q236's head signals (lang, robots, canonical)
    * ON TOP OF q231's chrome-heavy body — one page that exercises
    * the whole curation chain. */
  private def curationPageCol: org.apache.spark.sql.Column =
    concat(lit("<html"), langFragCol,
      lit("><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title><style>p{color:red}</style>" +
        "<script>var x=1;</script>"),
      robotsFragCol, canonFragCol,
      lit("</head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/contact\">Contact</a></nav>" +
        "<h1>Entry "), col("doc_id").cast("string"),
      lit("</h1><p>"), col("text"),
      lit("</p><div>Share: <a href=\"/tw\">Tweet</a> " +
        "<a href=\"/fb\">Like</a></div>" +
        "<footer>Copyright 2026 Example " +
        "<a href=\"/terms\">Terms of use</a></footer></body></html>"))

  private val CurationPageCte: String =
    s"""pg AS (
      |  SELECT doc_id,
      |    '<html' ||
      |    $LangFragSql ||
      |    '><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      |    '</title><style>p{color:red}</style>' ||
      |    '<script>var x=1;</script>' ||
      |    $RobotsFragSql ||
      |    $CanonFragSql ||
      |    '</head><body>' ||
      |    '<nav><a href="/">Home</a> <a href="/about">About</a> ' ||
      |    '<a href="/contact">Contact</a></nav>' ||
      |    '<h1>Entry ' || CAST(doc_id AS VARCHAR) || '</h1><p>' ||
      |    text ||
      |    '</p><div>Share: <a href="/tw">Tweet</a> ' ||
      |    '<a href="/fb">Like</a></div>' ||
      |    '<footer>Copyright 2026 Example ' ||
      |    '<a href="/terms">Terms of use</a></footer></body></html>'
      |    AS html
      |  FROM documents)""".stripMargin

  /** q242: the composed END-TO-END WEB CURATION BUILD — what a web
    * pipeline actually materializes from raw crawl HTML, in one
    * query: metadata extraction → robots-noindex consent drop →
    * jusText main-content extraction on the survivors →
    * canonical-link-preferred URL dedup → one corpus row per
    * canonical page (representative doc, page count, main-text
    * digest). Chains the q236 + q231 + q233/q237 machinery; the
    * oracle chains ALL their CTE replays, so the hash match proves
    * the four-stage COMPOSITION, not just the parts. */
  def q242WebCurationBuild(s: SparkSession, d: String): DataFrame = {
    // the synthesized page frame feeds THREE branches (metadata,
    // main content, canonical grouping) — materialize once so the
    // regex-heavy synthesis isn't recomputed per branch
    val pages = documents(s, d).select(col("doc_id"),
      urlVariantsCol.as("url"), curationPageCol.as("html"))
      .localCheckpoint()
    val meta = graft.operators.Boilerplate
      .htmlMeta(pages, "doc_id", "html")
    val kept = pages.join(meta.select(col("doc_id"), col("noindex"),
        col("canonical_url")), Seq("doc_id"))
      .filter(!col("noindex"))
    val main = graft.operators.Boilerplate.mainContent(
      kept.select(col("doc_id"), col("html")), "doc_id", "html",
      Q231Stops)
    val grp = kept
      .withColumn("canon", Corpus.canonicalizeUrl(
        coalesce(col("canonical_url"), col("url"))))
      .groupBy(col("canon"))
      .agg(min(col("doc_id")).as("first_doc"),
        count(lit(1)).as("n_pages"))
    grp
      .join(main.withColumnRenamed("doc_id", "first_doc"),
        Seq("first_doc"), "left")
      .select(col("canon"), col("first_doc"), col("n_pages"),
        md5(coalesce(col("main_text"), lit(""))).as("main_md5"))
      .orderBy(col("canon"))
  }

  private val q242Oracle: String =
    s"""WITH $CurationPageCte,
      |$MetaExtractCte,
      |keep AS (
      |  SELECT pg.doc_id, pg.html FROM pg
      |  JOIN mx ON mx.doc_id = pg.doc_id
      |  WHERE NOT contains(mx.r, 'noindex')),
      |${blockCtes("keep")},
      |mc AS (
      |  SELECT doc_id,
      |    string_agg(text, chr(10) ORDER BY block_id) AS main_text
      |  FROM c2 WHERE cls = 'good' GROUP BY doc_id),
      |$UrlVariantsCte,
      |u2 AS (
      |  SELECT u.doc_id,
      |    COALESCE(NULLIF(mx.cu, ''), u.url) AS url
      |  FROM u JOIN mx ON mx.doc_id = u.doc_id
      |       JOIN keep ON keep.doc_id = u.doc_id),
      |${canonCtes("u2")},
      |grp AS (
      |  SELECT canon, MIN(doc_id) AS first_doc, COUNT(*) AS n_pages
      |  FROM k GROUP BY canon)
      |SELECT g.canon, g.first_doc, g.n_pages,
      |  md5(COALESCE(mc.main_text, '')) AS main_md5
      |FROM grp g LEFT JOIN mc ON mc.doc_id = g.first_doc
      |ORDER BY g.canon""".stripMargin

  /** q243: the CRAWL TRIAGE DATASHEET — one audit row a crawl
    * operator reads before committing a fetch batch to the corpus:
    * page count, noindex count (q236), robots-blocked count (q241,
    * on the FETCH url — the canonical link only redirects dedup,
    * never consent), surviving count, distinct canonical pages among
    * survivors (q233/q237), and the declared-language mix. Fetch
    * urls cycle the robots fixture hosts × paths; pages are the
    * q242 curation synthesis. One aggregation row; the oracle
    * chains the q236 + q241 + q233 replays into the same single
    * GROUP BY (). */
  def q243CrawlDatasheet(s: SparkSession, d: String): DataFrame = {
    val hostsArr = array(RobotsFixture.map(h => lit(h._1)): _*)
    val pathsArr = array(RobotsPaths.map(lit): _*)
    // two consumers (metadata, robots gate) — materialize once
    val pages = documents(s, d).select(col("doc_id"),
      concat(lit("https://"),
        element_at(hostsArr, (col("doc_id") % 3).cast("int") + 1),
        element_at(pathsArr, (col("doc_id") % 4).cast("int") + 1))
        .as("url"),
      curationPageCol.as("html"))
      .localCheckpoint()
    val meta = graft.operators.Boilerplate
      .htmlMeta(pages, "doc_id", "html")
      .select(col("doc_id"), col("html_lang"), col("noindex"),
        col("canonical_url"))
    val rules = Corpus.robotsRules(
      { import s.implicits._
        RobotsFixture.toDF("host", "robots_txt") },
      "host", "robots_txt")
    val gated = Corpus
      .robotsGate(pages.select(col("doc_id"), col("url")), "url",
        rules)
      .select(col("doc_id"), col("allowed"))
    val joined = pages.join(meta, Seq("doc_id"))
      .join(gated, Seq("doc_id"))
      .withColumn("kept", !col("noindex") && col("allowed"))
      .withColumn("canon", Corpus.canonicalizeUrl(
        coalesce(col("canonical_url"), col("url"))))
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    joined.agg(
      count(lit(1)).as("n_pages"),
      cnt(col("noindex")).as("n_noindex"),
      cnt(!col("allowed")).as("n_robots_blocked"),
      cnt(col("kept")).as("n_kept"),
      countDistinct(when(col("kept"), col("canon")))
        .as("n_canonical"),
      cnt(col("html_lang") === "en").as("lang_en"),
      cnt(col("html_lang") === "de").as("lang_de"),
      cnt(col("html_lang").isNull).as("lang_none"))
  }

  // lazy: RobotsFixture/RobotsPaths are declared later in the object
  // (with the q241 family); a strict val here would read them as null
  // during <clinit>
  private lazy val q243Oracle: String = {
    val hostList = RobotsFixture.map(h => s"'${h._1}'")
      .mkString("[", ", ", "]")
    val pathList = RobotsPaths.map(p => s"'$p'")
      .mkString("[", ", ", "]")
    val rbVals = RobotsFixture.map { case (h, t) =>
      s"('$h', '${t.replace("'", "''")
        .replace("\n", "' || chr(10) || '")}')"
    }.mkString(", ")
    s"""WITH $CurationPageCte,
      |$MetaExtractCte,
      |u AS (
      |  SELECT doc_id,
      |    'https://' || $hostList[CAST(doc_id % 3 AS INT) + 1] ||
      |    $pathList[CAST(doc_id % 4 AS INT) + 1] AS url
      |  FROM documents),
      |rb AS (
      |  SELECT * FROM (VALUES $rbVals) r(host, robots_txt)),
      |ln AS (
      |  SELECT host, trim(regexp_replace(uu.l, '#.*', '', 'g')) AS line
      |  FROM rb, LATERAL unnest(string_split(robots_txt, chr(10)))
      |    uu(l)),
      |typed AS (
      |  SELECT host,
      |    CASE WHEN starts_with(lower(line), 'disallow:') THEN 'disallow'
      |      WHEN starts_with(lower(line), 'allow:') THEN 'allow' END
      |      AS rule_type,
      |    trim(substr(line, instr(line, ':') + 1)) AS prefix
      |  FROM ln),
      |rules AS (
      |  SELECT host, rule_type, prefix FROM typed
      |  WHERE rule_type IS NOT NULL AND len(prefix) > 0),
      |uh AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)',
      |      1)) AS host,
      |    regexp_extract(url,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
      |  FROM u),
      |m AS (
      |  SELECT uh.doc_id,
      |    MAX(CASE WHEN r.prefix IS NOT NULL
      |      AND starts_with(uh.path, r.prefix)
      |      AND r.rule_type = 'allow'
      |      THEN len(r.prefix) ELSE -1 END) >=
      |    MAX(CASE WHEN r.prefix IS NOT NULL
      |      AND starts_with(uh.path, r.prefix)
      |      AND r.rule_type = 'disallow'
      |      THEN len(r.prefix) ELSE -1 END) AS allowed
      |  FROM uh LEFT JOIN rules r ON r.host = uh.host
      |  GROUP BY uh.doc_id),
      |eff AS (
      |  SELECT u.doc_id,
      |    COALESCE(NULLIF(mx.cu, ''), u.url) AS url
      |  FROM u JOIN mx ON mx.doc_id = u.doc_id),
      |${canonCtes("eff")},
      |j AS (
      |  SELECT mx.doc_id,
      |    contains(mx.r, 'noindex') AS noindex,
      |    m.allowed AS allowed,
      |    NOT contains(mx.r, 'noindex') AND m.allowed AS kept,
      |    CASE WHEN len(mx.l) > 0 THEN lower(mx.l) END AS html_lang,
      |    k.canon AS canon
      |  FROM mx JOIN m ON m.doc_id = mx.doc_id
      |       JOIN k ON k.doc_id = mx.doc_id)
      |SELECT COUNT(*) AS n_pages,
      |  CAST(SUM(CASE WHEN noindex THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_noindex,
      |  CAST(SUM(CASE WHEN NOT allowed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_robots_blocked,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  COUNT(DISTINCT CASE WHEN kept THEN canon END)
      |    AS n_canonical,
      |  CAST(SUM(CASE WHEN html_lang = 'en' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS lang_en,
      |  CAST(SUM(CASE WHEN html_lang = 'de' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS lang_de,
      |  CAST(SUM(CASE WHEN html_lang IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS lang_none
      |FROM j""".stripMargin
  }

  /** q244: HTML table extraction to structured grid records
    * ([[graft.operators.Boilerplate.htmlTables]]) — every page
    * carries a header-rowed 3×2 table of doc fields, a script
    * containing a FAKE table (must not extract), and a second 1×2
    * table with an entity in a cell; the oracle replays the three
    * nested explodes, the header-tag probe, and the cell clean. */
  /** Shared q244/q258 synthesized table page: a header-rowed
    * 3-row table, a script-embedded decoy table (excluded), and a
    * single-row entity-bearing table. */
  private def tableHtmlCol: org.apache.spark.sql.Column = concat(
    lit("<html><body><p>intro</p><table><tr><th>k</th><th>v</th>" +
      "</tr><tr><td>id</td><td>"), col("doc_id").cast("string"),
    lit("</td></tr><tr><td>len</td><td>"),
    col("n_chars").cast("string"),
    lit("</td></tr></table><script>var t = '<table><tr><td>no" +
      "</td></tr></table>';</script><table class=\"x\"><tr>" +
      "<td>src &amp; kind</td><td>"), col("source"),
    lit("</td></tr></table></body></html>"))

  def q244HtmlTables(s: SparkSession, d: String): DataFrame = {
    graft.operators.Boilerplate.htmlTables(
        documents(s, d).select(col("doc_id"),
          tableHtmlCol.as("html")),
        "doc_id", "html")
      .orderBy(col("doc_id"), col("table_id"), col("row_id"),
        col("col_id"))
  }

  /** The q244 grid chain over the shared synthesized page — ends at
    * `cl(doc_id, table_id, row_id, col_id, cell, is_header)`;
    * shared by q244 and the q258 linearization. */
  private val htmlGridCtes: String =
    s"""h AS (
      |  SELECT doc_id,
      |    '<html><body><p>intro</p><table><tr><th>k</th><th>v</th>' ||
      |    '</tr><tr><td>id</td><td>' || CAST(doc_id AS VARCHAR) ||
      |    '</td></tr><tr><td>len</td><td>' ||
      |    CAST(n_chars AS VARCHAR) ||
      |    '</td></tr></table><script>var t = ''<table><tr><td>no' ||
      |    '</td></tr></table>'';</script><table class="x"><tr>' ||
      |    '<td>src &amp; kind</td><td>' || source ||
      |    '</td></tr></table></body></html>' AS html
      |  FROM documents),
      |st AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(regexp_replace(html,
      |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g') AS shtml
      |  FROM h),
      |tb AS (
      |  SELECT doc_id, t.i - 1 AS table_id, tbls[t.i] AS tbl
      |  FROM (SELECT doc_id, regexp_extract_all(shtml,
      |      '(?is)<table[^>]*>(.*?)</table>', 1) AS tbls FROM st),
      |    LATERAL unnest(generate_series(1, len(tbls))) t(i)),
      |rw AS (
      |  SELECT doc_id, table_id, r.i - 1 AS row_id, rws[r.i] AS rowh
      |  FROM (SELECT doc_id, table_id, regexp_extract_all(tbl,
      |      '(?is)<tr[^>]*>(.*?)</tr>', 1) AS rws FROM tb),
      |    LATERAL unnest(generate_series(1, len(rws))) r(i)),
      |cw AS (
      |  SELECT doc_id, table_id, row_id, rowh,
      |    regexp_extract_all(rowh,
      |      '(?is)<t[dh][^>]*>(.*?)</t[dh]>', 1) AS cells
      |  FROM rw),
      |cl AS (
      |  SELECT doc_id, table_id, row_id, c.i - 1 AS col_id,
      |    ${cleanSql("cells[c.i]")} AS cell,
      |    lower(regexp_extract(rowh, '(?is)<(t[dh])[^>]*>', 1))
      |      = 'th' AS is_header
      |  FROM cw,
      |    LATERAL unnest(generate_series(1, len(cells))) c(i))""".stripMargin

  private val q244Oracle: String =
    s"""WITH $htmlGridCtes
      |SELECT doc_id, table_id, row_id, col_id, cell, is_header
      |FROM cl ORDER BY doc_id, table_id, row_id, col_id""".stripMargin

  /** q258: grid → markdown-table linearization
    * ([[graft.operators.Boilerplate.linearizeTables]] over the q244
    * extraction) — the table-to-text step that puts the GRID's
    * structure back into token form for table-QA/grounding corpora;
    * the header table renders with its `| --- |` separator, the
    * headerless one without. The oracle chains the q244 grid replay
    * into the byte-exact row/table string assembly (newline-bearing
    * markdown rides the verify/JSON path directly — the q207
    * control-char device). */
  def q258LinearizeTables(s: SparkSession, d: String): DataFrame = {
    val grid = graft.operators.Boilerplate.htmlTables(
      documents(s, d).select(col("doc_id"), tableHtmlCol.as("html")),
      "doc_id", "html")
    graft.operators.Boilerplate.linearizeTables(grid, "doc_id")
      .orderBy(col("doc_id"), col("table_id"))
  }

  private val q258Oracle: String =
    s"""WITH $htmlGridCtes,
      |rs AS (
      |  SELECT doc_id, table_id, row_id,
      |    '| ' || string_agg(cell, ' | ' ORDER BY col_id) || ' |'
      |      AS row_md,
      |    COUNT(*) AS row_w,
      |    bool_or(is_header) AS row_hdr
      |  FROM cl GROUP BY doc_id, table_id, row_id),
      |tt AS (
      |  SELECT doc_id, table_id,
      |    COUNT(*) AS n_rows,
      |    MAX(row_w) AS n_cols,
      |    string_agg(CASE WHEN row_id = 0 AND row_hdr THEN
      |        row_md || chr(10) || '| ' ||
      |        repeat('--- | ', CAST(row_w AS INT) - 1) || '--- |'
      |      ELSE row_md END, chr(10) ORDER BY row_id) AS markdown
      |  FROM rs GROUP BY doc_id, table_id)
      |SELECT doc_id, table_id, n_rows, n_cols, markdown
      |FROM tt ORDER BY doc_id, table_id""".stripMargin

  /** Anchor-term vocabulary for q238 (shared with the oracle). */
  private val AnchorTerms1 = Seq("best", "fresh", "weekly",
    "archived", "primary")
  private val AnchorTerms2 = Seq("report", "tables", "index")

  /** q238: anchor-text aggregation per target host
    * ([[graft.operators.Boilerplate.outlinksWithText]]) — the
    * off-page relevance signal: for every host, the top-3 terms the
    * corpus's anchors use when linking TO it (count desc, term asc).
    * Pages carry two absolute links whose hosts and anchor wordings
    * are deterministic functions of doc_id, so term counts vary by
    * host. The oracle replays extraction (two grouped captures over
    * the same pattern, zipped by position), cleaning, host
    * resolution, tokenization, and the ranked window. */
  def q238AnchorText(s: SparkSession, d: String): DataFrame = {
    val hostsArr = array(UrlHosts.map(lit): _*)
    def hostAt(e: org.apache.spark.sql.Column) =
      element_at(hostsArr, (e % 8).cast("int") + 1)
    val t1 = element_at(array(AnchorTerms1.map(lit): _*),
      (col("doc_id") % 5).cast("int") + 1)
    val t2 = element_at(array(AnchorTerms2.map(lit): _*),
      (col("doc_id") % 3).cast("int") + 1)
    val html = concat(
      lit("<p><a href=\"https://"), hostAt(col("doc_id") * 3 + 1),
      lit("/x\">"), t1, lit(" data</a> and <a href=\"https://"),
      hostAt(col("doc_id") + 5), lit("/y\">"), t2,
      lit("</a></p>"))
    val docs = documents(s, d).select(col("doc_id"),
      html.as("html"))
    val links = graft.operators.Boilerplate
      .outlinksWithText(docs, "doc_id", "html")
      .withColumn("dst_host", Corpus.urlHost(col("href")))
    val counts = links
      .select(col("dst_host"), explode(split(col("anchor"), " "))
        .as("term"))
      .groupBy(col("dst_host"), col("term"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("dst_host"))
          .orderBy(col("n").desc, col("term"))))
      .filter(col("rnk") <= 3)
      .orderBy(col("dst_host"), col("rnk"))
  }

  private val q238Oracle: String = {
    val hostList = UrlHosts.map(h => s"'$h'").mkString("[", ", ", "]")
    val tl1 = AnchorTerms1.map(t => s"'$t'").mkString("[", ", ", "]")
    val tl2 = AnchorTerms2.map(t => s"'$t'").mkString("[", ", ", "]")
    raw"""WITH h AS (
      |  SELECT doc_id,
      |    '<p><a href="https://' ||
      |    $hostList[CAST((doc_id * 3 + 1) % 8 AS INT) + 1] ||
      |    '/x">' || $tl1[CAST(doc_id % 5 AS INT) + 1] ||
      |    ' data</a> and <a href="https://' ||
      |    $hostList[CAST((doc_id + 5) % 8 AS INT) + 1] ||
      |    '/y">' || $tl2[CAST(doc_id % 3 AS INT) + 1] ||
      |    '</a></p>' AS html
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id,
      |    regexp_extract_all(html,
      |      '(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>', 1)
      |      AS hr,
      |    regexp_extract_all(html,
      |      '(?is)<a\s[^>]*?href\s*=\s*"([^"]*)"[^>]*>(.*?)</a>', 2)
      |      AS tx
      |  FROM h),
      |lk AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(hr[u.i],
      |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)',
      |      1)) AS dst_host,
      |    trim(regexp_replace(regexp_replace(tx[u.i],
      |      '(?s)<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')) AS anchor
      |  FROM ex, LATERAL unnest(generate_series(1, len(hr))) u(i)),
      |tm AS (
      |  SELECT dst_host, unnest(string_split(anchor, ' ')) AS term
      |  FROM lk),
      |cn AS (
      |  SELECT dst_host, term, COUNT(*) AS n
      |  FROM tm GROUP BY 1, 2),
      |rk AS (
      |  SELECT dst_host, term, n, ROW_NUMBER() OVER (
      |    PARTITION BY dst_host ORDER BY n DESC, term) AS rnk
      |  FROM cn)
      |SELECT dst_host, term, n, rnk FROM rk WHERE rnk <= 3
      |ORDER BY dst_host, rnk""".stripMargin
  }

  /** q239: bipartite fuzzy-key join (Levenshtein ≤ 2) — the
    * entity-resolution primitive (typo'd titles, OCR'd names,
    * slightly-divergent mirrors): probes are part names with their
    * 3rd character dropped, matched against the part catalog via
    * [[graft.operators.Dedup.fuzzyJoin]] — the df-capped q-gram
    * candidate device (the q114 discipline, bipartite). Gram-key
    * cardinality scales with the data for OPEN name spaces; over a
    * FIXED vocabulary (TPC-H's ~92 color words) the gram TYPE count
    * plateaus and per-gram df grows with scale, so the df cap must
    * track the data — which the default `maxDf = AutoDf` now does
    * (r12: the q95 of per-name rarest-gram df, floored at 1000 —
    * see the fuzzyJoin scaladoc), keeping gram blocking live with
    * the cheapest sufficient grams instead of silently re-blocking
    * on the ~40-value length key. The r10 form
    * blocked on the 2-char name prefix — a fixed ~50-value key over
    * TPC-H's color vocabulary, so block sizes grew linearly and the
    * pair count quadratically; that form also missed any dist ≤ 2
    * pair differing in its first two chars. The oracle is now the
    * EXHAUSTIVE probe×catalog truth, so the hash match IS the
    * recall proof for the candidate scheme. */
  def q239FuzzyNameJoin(s: SparkSession, d: String): DataFrame = {
    val parts = part(s, d).select(col("p_partkey"), col("p_name"))
    val probes = parts
      .filter(col("p_partkey") % 10 === 0)
      .select(col("p_partkey").as("probe_key"),
        concat(substring(col("p_name"), 1, 2),
          substring(col("p_name"), 4, 1 << 20)).as("probe_name"))
    graft.operators.Dedup.fuzzyJoin(
        probes, "probe_key", "probe_name",
        parts, "p_partkey", "p_name", maxDist = 2)
      .select(col("lid").as("probe_key"),
        col("rid").as("p_partkey"), col("dist").cast("long")
          .as("dist"))
      .orderBy(col("probe_key"), col("p_partkey"))
  }

  private val q239Oracle: String =
    """WITH probes AS (
      |  SELECT p_partkey AS probe_key,
      |    substr(p_name, 1, 2) || substr(p_name, 4) AS probe_name
      |  FROM part WHERE p_partkey % 10 = 0),
      |cand AS (
      |  SELECT probe_key, p_partkey,
      |    CAST(levenshtein(probe_name, p_name) AS BIGINT) AS dist
      |  FROM probes CROSS JOIN part)
      |SELECT probe_key, p_partkey, dist FROM cand WHERE dist <= 2
      |ORDER BY probe_key, p_partkey""".stripMargin

  /** Fixture docs exercising the content classes the prose corpus
    * cannot: indented/semicolon code, brace-dense one-liner code,
    * TeX-marker math. Shared verbatim with the q240 oracle VALUES. */
  private val ContentTypeFixture: Seq[(Long, String)] = Seq(
    (9400001L, "def main():\n  x = compute(1)\n  return x;\n"),
    (9400002L, "function f(a) { return a * 2; }"),
    (9400003L, "Let $x$ be the root: \\sum_i x_i^2 stays small"),
    (9400004L, "plain prose about the results and the methods used"),
    // Empty text: all three signals NULL, route prose — exercises
    // the split('')→[''] guard (an unguarded line ratio would emit
    // 0.0 in Spark and NaN in the oracle's IEEE 0/0).
    (9400005L, ""))

  /** q240: content-type routing (code / math / prose)
    * ([[graft.operators.Corpus.contentTypeSignals]]) — the triage in
    * front of per-type pipelines; the corpus (all prose) is unioned
    * with [[ContentTypeFixture]] so every route is value-checked.
    * The oracle replays the char-class removals, the line-shape
    * regexes, and the IEEE ratios. */
  def q240ContentType(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(ContentTypeFixture.toDF("doc_id", "text"))
    Corpus.contentTypeSignals(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** The q240 signal+routing chain over a caller-supplied
    * `$src(doc_id, text)` CTE — shared by q240 and the composed
    * q250. Ends at `csig(doc_id, code_char_density, code_line_frac,
    * math_char_density, content_type)`. */
  private def contentSigCtes(src: String): String =
    raw"""csig0 AS (
      |  SELECT doc_id,
      |    CASE WHEN len(text) > 0 THEN
      |      CAST(len(text) - len(regexp_replace(text, '[{}();=]', '',
      |        'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
      |      END AS code_char_density,
      |    CASE WHEN len(text) > 0 THEN
      |      CAST(len(list_filter(string_split(text, chr(10)),
      |        l -> regexp_matches(l, '^(  |' || chr(9) || ')')
      |          OR regexp_matches(l, '[;{}]\s*$$'))) AS DOUBLE) /
      |        CAST(len(string_split(text, chr(10))) AS DOUBLE)
      |      END AS code_line_frac,
      |    CASE WHEN len(text) > 0 THEN
      |      CAST(len(text) - len(regexp_replace(text, '[$$\\^_]', '',
      |        'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
      |      END AS math_char_density
      |  FROM $src),
      |csig AS (
      |  SELECT *, CASE
      |    WHEN code_char_density > 0.03 OR code_line_frac > 0.4
      |      THEN 'code'
      |    WHEN math_char_density > 0.02 THEN 'math'
      |    ELSE 'prose' END AS content_type
      |  FROM csig0)""".stripMargin

  private val q240Oracle: String = {
    val vals = ContentTypeFixture.map { case (id, t) =>
      s"($id, '${t.replace("'", "''")
        .replace("\n", "' || chr(10) || '")}')"
    }.mkString(", ")
    s"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT * FROM (VALUES $vals) v(doc_id, text)),
      |${contentSigCtes("all_docs")}
      |SELECT doc_id, code_char_density, code_line_frac,
      |  math_char_density, content_type
      |FROM csig ORDER BY doc_id""".stripMargin
  }

  /** Robots fixture: a host with an Allow override inside a
    * Disallowed subtree, a host whose only Disallow is EMPTY (no
    * rule — everything allowed), and a blanket `Disallow: /` host.
    * Shared verbatim with the q241 oracle. */
  private val RobotsFixture: Seq[(String, String)] = Seq(
    ("crawl.example.com", "User-agent: *\nDisallow: /private\n" +
      "Allow: /private/public\ndisallow: /tmp/ # temp trees"),
    ("open.example.net", "User-agent: *\nDisallow:"),
    ("closed.example.org", "User-agent: *\nDisallow: /"))

  private val RobotsPaths: Seq[String] = Seq(
    "/private/x", "/private/public/y", "/tmp/z", "/open/w")

  /** q241: robots-consent gate
    * ([[graft.operators.Corpus.robotsRules]] +
    * [[graft.operators.Corpus.robotsGate]]) — Google REP longest-
    * match semantics: Allow wins ties, no matching rule = allowed;
    * the crawl-consent twin of the q236 noindex signal. URLs cycle
    * the three fixture hosts × four paths so every verdict branch
    * (Allow override, empty Disallow, blanket Disallow, no-match)
    * is value-checked. */
  def q241RobotsGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hostsArr = array(RobotsFixture.map(h => lit(h._1)): _*)
    val pathsArr = array(RobotsPaths.map(lit): _*)
    val urls = documents(s, d).select(col("doc_id"),
      concat(lit("https://"),
        element_at(hostsArr, (col("doc_id") % 3).cast("int") + 1),
        element_at(pathsArr, (col("doc_id") % 4).cast("int") + 1))
        .as("url"))
    val rules = Corpus.robotsRules(
      RobotsFixture.toDF("host", "robots_txt"), "host", "robots_txt")
    Corpus.robotsGate(urls, "url", rules)
      .select(col("doc_id"), col("host"), col("path"),
        col("allow_len").cast("long").as("allow_len"),
        col("disallow_len").cast("long").as("disallow_len"),
        col("allowed"))
      .orderBy(col("doc_id"))
  }

  private val q241Oracle: String = {
    val rbVals = RobotsFixture.map { case (h, t) =>
      s"('$h', '${t.replace("'", "''")
        .replace("\n", "' || chr(10) || '")}')"
    }.mkString(", ")
    val hostList = RobotsFixture.map(h => s"'${h._1}'")
      .mkString("[", ", ", "]")
    val pathList = RobotsPaths.map(p => s"'$p'")
      .mkString("[", ", ", "]")
    raw"""WITH rb AS (
      |  SELECT * FROM (VALUES $rbVals) r(host, robots_txt)),
      |ln AS (
      |  SELECT host, trim(regexp_replace(u.l, '#.*', '', 'g')) AS line
      |  FROM rb, LATERAL unnest(string_split(robots_txt, chr(10)))
      |    u(l)),
      |typed AS (
      |  SELECT host,
      |    CASE WHEN starts_with(lower(line), 'disallow:') THEN 'disallow'
      |      WHEN starts_with(lower(line), 'allow:') THEN 'allow' END
      |      AS rule_type,
      |    trim(substr(line, instr(line, ':') + 1)) AS prefix
      |  FROM ln),
      |rules AS (
      |  SELECT host, rule_type, prefix FROM typed
      |  WHERE rule_type IS NOT NULL AND len(prefix) > 0),
      |u AS (
      |  SELECT doc_id,
      |    $hostList[CAST(doc_id % 3 AS INT) + 1] AS host,
      |    $pathList[CAST(doc_id % 4 AS INT) + 1] AS path
      |  FROM documents),
      |m AS (
      |  SELECT u.doc_id, u.host, u.path,
      |    MAX(CASE WHEN r.prefix IS NOT NULL
      |      AND starts_with(u.path, r.prefix)
      |      AND r.rule_type = 'allow'
      |      THEN len(r.prefix) ELSE -1 END) AS allow_len,
      |    MAX(CASE WHEN r.prefix IS NOT NULL
      |      AND starts_with(u.path, r.prefix)
      |      AND r.rule_type = 'disallow'
      |      THEN len(r.prefix) ELSE -1 END) AS disallow_len
      |  FROM u LEFT JOIN rules r ON r.host = u.host
      |  GROUP BY u.doc_id, u.host, u.path)
      |SELECT doc_id, host, path, allow_len, disallow_len,
      |  allow_len >= disallow_len AS allowed
      |FROM m ORDER BY doc_id""".stripMargin
  }

  /** q245: ENTITY RESOLUTION end-to-end — fuzzy name clusters with
    * membership mapped back to rows. The scale-correct shape: the
    * blocked Levenshtein pair join (the q239 device) runs over the
    * DISTINCT-NAME universe (64 names here; always ≪ row count —
    * raw-row pair joins go quadratic in name multiplicity), the
    * clusters come from [[graft.operators.Graph.connectedComponents]]
    * over the name graph (distance ≤ 3 here — the corpus's 64-name
    * vocabulary has a minimum inter-name distance of 3; thresholds
    * are data-tuned in any real ER pass), and rows get their entity
    * by a BROADCAST join on the assignment table. Blocking bounds
    * recall to prefix-sharing names by construction. Names with no
    * fuzzy neighbor are their own entity. The oracle replays the
    * pair join, a recursive
    * min-label closure (string MIN, matching the operator's string
    * labels), and the row rollup. */
  def q245EntityClusters(s: SparkSession, d: String): DataFrame = {
    val parts = part(s, d).select(col("p_partkey"), col("p_name"))
    val names = parts.select(col("p_name")).distinct()
    def side(n: String, l: String) = names.select(
      substring(col("p_name"), 1, 2).as("blk"),
      col("p_name").as(n), length(col("p_name")).as(l))
    val pairs = side("na", "la").join(side("nb", "lb"), Seq("blk"))
      .filter(col("na") < col("nb") &&
        abs(col("la") - col("lb")) <= 3 &&
        levenshtein(col("na"), col("nb")) <= 3)
      .select(col("na").as("src"), col("nb").as("dst"))
    val comp = graft.operators.Graph.connectedComponents(pairs)
    val assigned = names
      .join(comp.withColumnRenamed("node", "p_name"), Seq("p_name"),
        "left")
      .select(col("p_name"),
        coalesce(col("component"), col("p_name")).as("entity"))
    parts.join(broadcast(assigned), Seq("p_name"))
      .groupBy(col("entity"))
      .agg(countDistinct(col("p_name")).as("n_names"),
        count(lit(1)).as("n_parts"),
        min(col("p_partkey")).as("min_partkey"))
      .orderBy(col("entity"))
  }

  private val q245Oracle: String =
    """WITH RECURSIVE names AS (SELECT DISTINCT p_name FROM part),
      |n2 AS (SELECT p_name, substr(p_name, 1, 2) AS blk,
      |  len(p_name) AS ln FROM names),
      |pe AS (
      |  SELECT a.p_name AS src, b.p_name AS dst
      |  FROM n2 a JOIN n2 b ON a.blk = b.blk AND a.p_name < b.p_name
      |    AND abs(a.ln - b.ln) <= 3
      |    AND levenshtein(a.p_name, b.p_name) <= 3),
      |e AS (SELECT src, dst FROM pe UNION SELECT dst, src FROM pe),
      |enodes AS (SELECT DISTINCT src AS node FROM e),
      |r AS (
      |  SELECT node, node AS lab FROM enodes
      |  UNION
      |  SELECT e.dst AS node, r.lab
      |  FROM r JOIN e ON e.src = r.node),
      |cc AS (SELECT node AS p_name, MIN(lab) AS component
      |  FROM r GROUP BY node),
      |asg AS (
      |  SELECT n.p_name, COALESCE(cc.component, n.p_name) AS entity
      |  FROM names n LEFT JOIN cc ON cc.p_name = n.p_name)
      |SELECT a.entity, COUNT(DISTINCT p.p_name) AS n_names,
      |  COUNT(*) AS n_parts, MIN(p.p_partkey) AS min_partkey
      |FROM part p JOIN asg a ON a.p_name = p.p_name
      |GROUP BY a.entity ORDER BY a.entity""".stripMargin

  /** Fixture docs exercising every line rule (the single-line corpus
    * can only exercise the keep path): uppercase nav, numeric-only,
    * social counter, short, and an all-junk doc the char-ratio gate
    * drops. Shared verbatim with the q246 oracle VALUES. */
  private val LineFixture: Seq[(Long, String)] = Seq(
    (9500001L, "HOME ABOUT CONTACT\n" +
      "the quick brown fox jumps over the lazy dog today\n42\n" +
      "3 likes\nanother long and reasonable prose line here"),
    (9500002L, "12.5%\n- - -\nNAV BAR\nok"),
    (9500003L, "a decent single line that clears every rule easily"))

  /** q246: line-level corrections + char-ratio document gate
    * ([[graft.operators.Corpus.lineCorrections]] — the RefinedWeb
    * §G.2 "line-wise filters" step between extraction and dedup).
    * The oracle replays line segmentation, all four drop rules, the
    * ordered rebuild, and the IEEE keep-ratio. */
  def q246LineCorrections(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(LineFixture.toDF("doc_id", "text"))
    Corpus.lineCorrections(docs, "doc_id", "text")
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("char_keep_ratio"), col("doc_kept"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** The q246 line-correction chain over a caller-supplied
    * `$src(doc_id, text)` CTE — shared by q246 and the composed
    * q247. Ends at `lg(doc_id, n_lines, n_kept, char_keep_ratio,
    * clean_text)`. */
  private def lineCtes(src: String): String =
    raw"""lln AS (
      |  SELECT doc_id, u.i - 1 AS line_id, ls[u.i] AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
      |    FROM $src),
      |    LATERAL unnest(generate_series(1, len(ls))) u(i)),
      |lcl AS (SELECT doc_id, line_id, line, trim(line) AS t
      |  FROM lln),
      |lk AS (
      |  SELECT doc_id, line_id, line,
      |    NOT (len(t) < 10
      |      OR regexp_matches(t, '^[0-9 .,%/()-]+$$')
      |      OR regexp_matches(lower(t),
      |        '^[0-9]+ (likes|views|comments|shares)$$')
      |      OR (len(regexp_replace(t, '[^A-Za-z]', '', 'g')) > 0
      |        AND CAST(len(regexp_replace(t, '[^A-Z]', '', 'g'))
      |            AS DOUBLE) /
      |          CAST(len(regexp_replace(t, '[^A-Za-z]', '', 'g'))
      |            AS DOUBLE) > 0.6)) AS keep
      |  FROM lcl),
      |lg AS (
      |  SELECT doc_id, COUNT(*) AS n_lines,
      |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_kept,
      |    CAST(SUM(CASE WHEN keep THEN len(line) ELSE 0 END)
      |      AS DOUBLE) / CAST(SUM(len(line)) AS DOUBLE)
      |      AS char_keep_ratio,
      |    COALESCE(string_agg(CASE WHEN keep THEN line END,
      |      chr(10) ORDER BY line_id), '') AS clean_text
      |  FROM lk GROUP BY doc_id)""".stripMargin

  private val q246Oracle: String = {
    val vals = LineFixture.map { case (id, t) =>
      s"($id, '${t.replace("'", "''")
        .replace("\n", "' || chr(10) || '")}')"
    }.mkString(", ")
    s"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT * FROM (VALUES $vals) v(doc_id, text)),
      |${lineCtes("all_docs")}
      |SELECT doc_id, n_lines, n_kept, char_keep_ratio,
      |  char_keep_ratio >= 0.8 AS doc_kept,
      |  md5(clean_text) AS clean_md5
      |FROM lg ORDER BY doc_id""".stripMargin
  }

  /** q247: the RefinedWeb-style MACRODATA FUNNEL composed in one
    * query — raw crawl HTML → metadata extraction → robots-noindex
    * consent drop → jusText main-content extraction → line-level
    * corrections + char-ratio gate → normalized (q123-key) dedup →
    * one corpus row per surviving canonical text. Five stages, five
    * operators, ONE oracle chaining every replay — the hash match
    * proves the full funnel composition. */
  def q247RefinedBuild(s: SparkSession, d: String): DataFrame = {
    val pages = documents(s, d).select(col("doc_id"),
      curationPageCol.as("html")).localCheckpoint()
    val meta = graft.operators.Boilerplate
      .htmlMeta(pages, "doc_id", "html")
      .select(col("doc_id"), col("noindex"))
    val kept = pages.join(meta, Seq("doc_id"))
      .filter(!col("noindex"))
    val main = graft.operators.Boilerplate.mainContent(
      kept.select(col("doc_id"), col("html")), "doc_id", "html",
      Q231Stops)
    val lc = Corpus.lineCorrections(
        main.select(col("doc_id"), col("main_text").as("text")),
        "doc_id", "text")
      .filter(col("doc_kept"))
    lc.groupBy(graft.functions.TextFunctions
        .dedupKey(col("clean_text")).as("dkey"))
      .agg(min(col("doc_id")).as("rep_doc"),
        count(lit(1)).as("n_members"))
      .select(md5(col("dkey")).as("key_md5"), col("rep_doc"),
        col("n_members"))
      .orderBy(col("rep_doc"))
  }

  private val q247Oracle: String =
    s"""WITH $CurationPageCte,
      |$MetaExtractCte,
      |keep AS (
      |  SELECT pg.doc_id, pg.html FROM pg
      |  JOIN mx ON mx.doc_id = pg.doc_id
      |  WHERE NOT contains(mx.r, 'noindex')),
      |${blockCtes("keep")},
      |mc AS (
      |  SELECT doc_id,
      |    string_agg(text, chr(10) ORDER BY block_id) AS main_text
      |  FROM c2 WHERE cls = 'good' GROUP BY doc_id),
      |lt AS (SELECT doc_id, main_text AS text FROM mc),
      |${lineCtes("lt")},
      |surv AS (
      |  SELECT doc_id, clean_text FROM lg
      |  WHERE char_keep_ratio >= 0.8),
      |dd AS (
      |  SELECT trim(regexp_replace(nfc_normalize(lower(clean_text)),
      |      '\\s+', ' ', 'g')) AS dkey,
      |    MIN(doc_id) AS rep_doc, COUNT(*) AS n_members
      |  FROM surv GROUP BY 1)
      |SELECT md5(dkey) AS key_md5, rep_doc, n_members
      |FROM dd ORDER BY rep_doc""".stripMargin

  /** Fixture docs carrying every license-detection branch (the prose
    * corpus is untagged): SPDX MIT/Apache/GPL/BSD tags in three
    * comment styles, the three phrase probes. Shared verbatim with
    * the q248 oracle VALUES. */
  private val LicenseFixture: Seq[(Long, String)] = Seq(
    (9600001L, "// SPDX-License-Identifier: MIT\nint main() {}"),
    (9600002L, "# SPDX-License-Identifier: Apache-2.0\nsetup here"),
    (9600003L, "/* SPDX-License-Identifier: GPL-3.0-only */ body"),
    (9600004L, "Permission is hereby granted, free of charge, to " +
      "any person obtaining a copy of this software"),
    (9600005L, "Licensed under the Apache License, Version 2.0 " +
      "(the License); you may not use this file"),
    (9600006L, "This program is free software under the GNU " +
      "General Public License as published"),
    (9600007L, "SPDX-License-Identifier: BSD-3-Clause"),
    // Compound SPDX expressions: captured WHOLE, never permissive —
    // a first-token-only capture would truncate 9600008 to 'MIT'
    // and wrongly gate a GPL-encumbered conjunction permissive.
    (9600008L, "# SPDX-License-Identifier: MIT AND GPL-3.0-only"),
    (9600009L, "// SPDX-License-Identifier: GPL-2.0-only WITH " +
      "Classpath-exception-2.0"),
    (9600010L, "/* SPDX-License-Identifier: (MIT OR Apache-2.0) */"),
    // Lowercase single id: permissive matching is case-insensitive.
    (9600011L, "# SPDX-License-Identifier: mit"))

  /** q248: license tagging + permissive gate
    * ([[graft.operators.Corpus.licenseTags]] — the The-Stack-class
    * compliance step in front of any code-corpus ship). SPDX wins,
    * phrase probes tag with `-phrase` provenance, unknown stays
    * NULL and is never permissive. */
  def q248LicenseTags(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(LicenseFixture.toDF("doc_id", "text"))
    Corpus.licenseTags(docs, "doc_id", "text")
      .select(col("doc_id"), col("license"), col("permissive"))
      .orderBy(col("doc_id"))
  }

  private val q248Oracle: String = {
    val vals = LicenseFixture.map { case (id, t) =>
      s"($id, '${t.replace("'", "''")
        .replace("\n", "' || chr(10) || '")}')"
    }.mkString(", ")
    s"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT * FROM (VALUES $vals) v(doc_id, text)),
      |${licenseCtes("all_docs")}
      |SELECT doc_id, license, permissive
      |FROM lic ORDER BY doc_id""".stripMargin
  }

  /** The q248 license chain over a caller-supplied
    * `$src(doc_id, text)` CTE — shared by q248 and the composed
    * q250. Ends at `lic(doc_id, license, permissive)`. */
  private def licenseCtes(src: String): String = {
    val permUpper = Corpus.PermissiveLicenses
      .map(l => s"'${l.toUpperCase}'").mkString("[", ", ", "]")
    // The SPDX capture replays the operator's compound-expression
    // grammar (token (AND|OR|WITH token)*, parens in the char class)
    // so 'MIT AND GPL-3.0-only' can never truncate to its permissive
    // head; permissive requires a SINGLE-token tag (no whitespace)
    // and matches case-insensitively, exactly like the operator.
    raw"""licx AS (
      |  SELECT doc_id,
      |    regexp_extract(text,
      |      '(?i)SPDX-License-Identifier:[ \t]*([A-Za-z0-9.+()-]+' ||
      |      '(?:[ \t]+(?:AND|OR|WITH)[ \t]+[A-Za-z0-9.+()-]+)*)',
      |      1) AS spdx,
      |    lower(text) AS low
      |  FROM $src),
      |licl AS (
      |  SELECT doc_id, CASE
      |    WHEN len(spdx) > 0 THEN spdx
      |    WHEN contains(low, 'permission is hereby granted')
      |      THEN 'MIT-phrase'
      |    WHEN contains(low, 'apache license')
      |        AND contains(low, 'version 2.0')
      |      THEN 'Apache-2.0-phrase'
      |    WHEN contains(low, 'gnu general public license')
      |      THEN 'GPL-phrase' END AS license
      |  FROM licx),
      |lic AS (
      |  SELECT doc_id, license,
      |    COALESCE(NOT regexp_matches(license, '[ \t]')
      |      AND (list_contains($permUpper, upper(license))
      |        OR starts_with(upper(license), 'BSD-')), false)
      |      AS permissive
      |  FROM licl)""".stripMargin
  }

  /** q249: notebook→script materialization
    * ([[graft.operators.Notebooks.script]]) — every doc becomes a
    * synthetic nbformat-4 notebook (markdown title, two code cells
    * with real `\n` escapes in the source-line arrays, a markdown
    * tail); the query parses with Spark's native from_json, keeps
    * code cells in document order, and digests the assembled
    * script. The oracle replays the JSON walk with DuckDB's json
    * functions (json_each + typed-list cast), proving the two
    * engines decode the SAME escapes and assemble the SAME bytes. */
  /** The synthetic nbformat-4 notebook JSON (shared q249/q250). */
  private def nbJsonCol: org.apache.spark.sql.Column = concat(
    lit("""{"nbformat":4,"cells":[""" +
      """{"cell_type":"markdown","source":["# Doc """),
    col("doc_id").cast("string"),
    lit(""""]},{"cell_type":"code","source":["x = """),
    col("doc_id").cast("string"),
    lit("""\n","print(x)"]},""" +
      """{"cell_type":"code","source":["y = """),
    col("n_chars").cast("string"),
    lit("""\n","x + y"]},""" +
      """{"cell_type":"markdown","source":["the end"]}]}"""))

  def q249NotebookScript(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"),
      nbJsonCol.as("nb"))
    graft.operators.Notebooks.script(docs, "doc_id", "nb")
      .select(col("doc_id"), col("n_code"), col("n_markdown"),
        md5(col("script")).as("script_md5"))
      .orderBy(col("doc_id"))
  }

  /** SQL expression synthesizing the q249/q250 notebook JSON. */
  private val NbJsonSql: String =
    raw"""'{"nbformat":4,"cells":[' ||
      |    '{"cell_type":"markdown","source":["# Doc ' ||
      |    CAST(doc_id AS VARCHAR) ||
      |    '"]},{"cell_type":"code","source":["x = ' ||
      |    CAST(doc_id AS VARCHAR) ||
      |    '\n","print(x)"]},' ||
      |    '{"cell_type":"code","source":["y = ' ||
      |    CAST(n_chars AS VARCHAR) ||
      |    '\n","x + y"]},' ||
      |    '{"cell_type":"markdown","source":["the end"]}]}'"""
      .stripMargin

  /** The q249 JSON-walk chain over a caller-supplied
    * `$src(doc_id, nb)` CTE — shared by q249 and the composed q250.
    * Ends at `nbg(doc_id, n_code, n_markdown, script)`. */
  private def nbCellCtes(src: String): String =
    raw"""nbce AS (
      |  SELECT doc_id, CAST(ci.i - 1 AS BIGINT) AS cell_id,
      |    json_extract_string(nb,
      |      '$$.cells[' || (ci.i - 1) || '].cell_type') AS cell_type,
      |    array_to_string(list_transform(generate_series(1,
      |      CAST(json_array_length(nb,
      |        '$$.cells[' || (ci.i - 1) || '].source') AS INT)),
      |      j -> json_extract_string(nb, '$$.cells[' ||
      |        (ci.i - 1) || '].source[' || (j - 1) || ']')), '')
      |        AS src
      |  FROM $src, LATERAL unnest(generate_series(1,
      |    CAST(json_array_length(nb, '$$.cells') AS INT))) ci(i)),
      |nbg AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN cell_type = 'code' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_code,
      |    CAST(SUM(CASE WHEN cell_type = 'markdown' THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_markdown,
      |    COALESCE(string_agg(
      |      CASE WHEN cell_type = 'code' THEN src END,
      |      chr(10) || chr(10) ORDER BY cell_id), '') AS script
      |  FROM nbce GROUP BY doc_id)""".stripMargin

  private val q249Oracle: String =
    s"""WITH u AS (
      |  SELECT doc_id, $NbJsonSql AS nb
      |  FROM documents),
      |${nbCellCtes("u")}
      |SELECT doc_id, n_code, n_markdown, md5(script) AS script_md5
      |FROM nbg ORDER BY doc_id""".stripMargin

  /** q250: the composed CODE-CORPUS BUILD — the code-side flagship
    * mirroring q242/q247's web funnels: a mixed feed (a third
    * notebooks, a third license-headered code files cycling
    * MIT/Apache/GPL/untagged, a third prose) flows through notebook→
    * script materialization (q249), content-type routing (q240 —
    * prose drops), and the license gate (q248 — known-nonpermissive
    * drops, unknown survives with NULL provenance); survivors emit
    * with their text digest. One oracle chains the nbformat walk,
    * the signal routing, and the license chain — the three-stage
    * COMPOSITION is what the hash match proves. */
  /** The shared q250/q261 mixed code feed: a third notebooks
    * (materialized to scripts), a third license-headered code files
    * cycling MIT/Apache/GPL/untagged, a third prose; checkpointed
    * once for its multiple consumers. */
  private def codeFeed(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"),
      col("n_chars"))
    val nbs = graft.operators.Notebooks.script(
        base.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), nbJsonCol.as("nb")),
        "doc_id", "nb")
      .select(col("doc_id"), col("script").as("text"))
    val header = when(col("doc_id") % 4 === 0,
        lit("// SPDX-License-Identifier: MIT\n"))
      .when(col("doc_id") % 4 === 1,
        lit("# SPDX-License-Identifier: Apache-2.0\n"))
      .when(col("doc_id") % 4 === 2,
        lit("/* SPDX-License-Identifier: GPL-3.0-only */\n"))
      .otherwise(lit(""))
    val files = base.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), concat(header, lit("x = "),
        col("doc_id").cast("string"), lit(";\nprint(x);"))
        .as("text"))
    val prose = base.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), col("text"))
    nbs.unionByName(files).unionByName(prose).localCheckpoint()
  }

  def q250CodeCorpusBuild(s: SparkSession, d: String): DataFrame = {
    val un = codeFeed(s, d)
    val routed = un.join(
      Corpus.contentTypeSignals(un, "doc_id", "text")
        .select(col("doc_id"), col("content_type")), Seq("doc_id"))
    Corpus.licenseTags(routed, "doc_id", "text")
      .filter(col("content_type") === "code" &&
        (col("permissive") || col("license").isNull))
      .select(col("doc_id"), col("license"), col("permissive"),
        md5(col("text")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  /** The q250/q261 oracle feed chain — ends at `un(doc_id, text)`. */
  private lazy val codeFeedCtes: String =
    s"""base AS (
      |  SELECT doc_id, text, n_chars FROM documents),
      |nbu AS (
      |  SELECT doc_id, $NbJsonSql AS nb
      |  FROM base WHERE doc_id % 3 = 0),
      |${nbCellCtes("nbu")},
      |files AS (
      |  SELECT doc_id, CASE
      |    WHEN doc_id % 4 = 0
      |      THEN '// SPDX-License-Identifier: MIT' || chr(10)
      |    WHEN doc_id % 4 = 1
      |      THEN '# SPDX-License-Identifier: Apache-2.0' || chr(10)
      |    WHEN doc_id % 4 = 2
      |      THEN '/* SPDX-License-Identifier: GPL-3.0-only */' ||
      |        chr(10)
      |    ELSE '' END ||
      |    'x = ' || CAST(doc_id AS VARCHAR) || ';' || chr(10) ||
      |    'print(x);' AS text
      |  FROM base WHERE doc_id % 3 = 1),
      |un AS (
      |  SELECT doc_id, script AS text FROM nbg
      |  UNION ALL SELECT doc_id, text FROM files
      |  UNION ALL SELECT doc_id, text FROM base
      |    WHERE doc_id % 3 = 2)""".stripMargin
  // NB: helper CTE strings are re-scanned by the OUTER oracle's
  // stripMargin, so no embedded line may begin with whitespace+'|'
  // (e.g. a leading '||' concat) — keep '||' at end-of-line.

  private val q250Oracle: String =
    s"""WITH $codeFeedCtes,
      |${contentSigCtes("un")},
      |${licenseCtes("un")}
      |SELECT un.doc_id, lic.license, lic.permissive,
      |  md5(un.text) AS text_md5
      |FROM un
      |JOIN csig ON csig.doc_id = un.doc_id
      |JOIN lic ON lic.doc_id = un.doc_id
      |WHERE csig.content_type = 'code'
      |  AND (lic.permissive OR lic.license IS NULL)
      |ORDER BY un.doc_id""".stripMargin

  /** q251: unified-diff accounting + added-code extraction
    * ([[graft.operators.Code.diffStats]] — commit-data corpora train
    * on the ADDED code, not patch syntax). Every doc becomes a
    * synthetic patch (one or two file blocks by parity, hunk
    * headers, context/removed/added lines); file headers and hunk
    * markers must count as structure, never as +/- lines. */
  def q251DiffStats(s: SparkSession, d: String): DataFrame = {
    val pid = (col("doc_id") % 7).cast("string")
    // Odd docs carry FORGED header-lookalikes: a `+++ ` line whose
    // predecessor is not `--- ` (an added `++ ` line) and a `--- `
    // line with no `+++ ` successor (a removed `-- ` line) — the
    // adjacency disambiguation the operator exists for, so an
    // unconditional-header oracle would misclassify both.
    val second = when(col("doc_id") % 2 === 0, concat(
        lit("\n--- a/README.md\n+++ b/README.md\n@@ -1 +1 @@\n" +
          "-old doc\n+new doc for "), col("doc_id").cast("string")))
      .otherwise(lit("\n+++ forged add ++ line\n--- forged del -- line"))
    val diff = concat(
      lit("--- a/src/"), pid, lit(".py\n+++ b/src/"), pid,
      lit(".py\n@@ -1,2 +1,3 @@\n context line stays\n-old_value = "),
      col("doc_id").cast("string"), lit("\n+new_value = "),
      col("doc_id").cast("string"), lit("\n+print(new_value)"),
      second)
    graft.operators.Code.diffStats(
        documents(s, d).select(col("doc_id"), diff.as("text")),
        "doc_id", "text")
      .select(col("doc_id"), col("n_files"), col("n_hunks"),
        col("n_added"), col("n_removed"),
        md5(col("added_code")).as("added_md5"))
      .orderBy(col("doc_id"))
  }

  private val q251Oracle: String =
    raw"""WITH u AS (
      |  SELECT doc_id,
      |    '--- a/src/' || CAST(doc_id % 7 AS VARCHAR) || '.py' ||
      |    chr(10) || '+++ b/src/' || CAST(doc_id % 7 AS VARCHAR) ||
      |    '.py' || chr(10) || '@@ -1,2 +1,3 @@' || chr(10) ||
      |    ' context line stays' || chr(10) ||
      |    '-old_value = ' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |    '+new_value = ' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |    '+print(new_value)' ||
      |    CASE WHEN doc_id % 2 = 0 THEN
      |      chr(10) || '--- a/README.md' || chr(10) ||
      |      '+++ b/README.md' || chr(10) || '@@ -1 +1 @@' ||
      |      chr(10) || '-old doc' || chr(10) ||
      |      '+new doc for ' || CAST(doc_id AS VARCHAR)
      |    ELSE chr(10) || '+++ forged add ++ line' || chr(10) ||
      |      '--- forged del -- line' END AS text
      |  FROM documents),
      |ln AS (
      |  SELECT doc_id, u2.i - 1 AS line_id, ls[u2.i] AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
      |    FROM u),
      |    LATERAL unnest(generate_series(1, len(ls))) u2(i)),
      |cl0 AS (
      |  SELECT doc_id, line_id, line,
      |    starts_with(line, '+++ ') AND COALESCE(
      |      starts_with(lag(line) OVER w, '--- '), false) AS is_nf,
      |    starts_with(line, '--- ') AND COALESCE(
      |      starts_with(lead(line) OVER w, '+++ '), false) AS is_of,
      |    starts_with(line, '@@') AS is_hunk
      |  FROM ln
      |  WINDOW w AS (PARTITION BY doc_id ORDER BY line_id)),
      |cl AS (
      |  SELECT doc_id, line_id, line, is_nf, is_of, is_hunk,
      |    starts_with(line, '+') AND NOT is_nf AS is_add,
      |    starts_with(line, '-') AND NOT is_of AS is_del
      |  FROM cl0),
      |g AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN is_nf THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_files,
      |    CAST(SUM(CASE WHEN is_hunk THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_hunks,
      |    CAST(SUM(CASE WHEN is_add THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_added,
      |    CAST(SUM(CASE WHEN is_del THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_removed,
      |    COALESCE(string_agg(CASE WHEN is_add THEN substr(line, 2)
      |      END, chr(10) ORDER BY line_id), '') AS added_code
      |  FROM cl GROUP BY doc_id)
      |SELECT doc_id, n_files, n_hunks, n_added, n_removed,
      |  md5(added_code) AS added_md5
      |FROM g ORDER BY doc_id""".stripMargin

  /** q252: function-level code chunking
    * ([[graft.operators.Code.functionChunks]] — the retrieval/dedup
    * unit for code is the definition, not a fixed window). Every doc
    * becomes a python-ish file (prelude, a top-level def, a class
    * with an INDENTED inner def that must NOT split); the oracle
    * replays the running boundary count and the per-chunk rebuild. */
  def q252FunctionChunks(s: SparkSession, d: String): DataFrame = {
    // The decorated ASYNC def exercises the full boundary grammar:
    // the chunk must start at the FIRST decorator (a def-only oracle
    // regex would glue decorators to the previous chunk and miss the
    // async-def boundary entirely); the indented def still never
    // splits.
    val src = concat(
      lit("import os\n\ndef f"), (col("doc_id") % 5).cast("string"),
      lit("(x):\n    return x + "), col("doc_id").cast("string"),
      lit("\n\n@cached\n@wraps\nasync def g"),
      (col("doc_id") % 4).cast("string"),
      lit("():\n    await h()\n\nclass C"),
      (col("doc_id") % 3).cast("string"),
      lit(":\n    def m(self):\n        pass"))
    graft.operators.Code.functionChunks(
        documents(s, d).select(col("doc_id"), src.as("text")),
        "doc_id", "text")
      .select(col("doc_id"), col("chunk_id"), col("first_line"),
        col("n_lines"), md5(col("chunk")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private val q252Oracle: String =
    raw"""WITH u AS (
      |  SELECT doc_id,
      |    'import os' || chr(10) || chr(10) ||
      |    'def f' || CAST(doc_id % 5 AS VARCHAR) || '(x):' ||
      |    chr(10) || '    return x + ' ||
      |    CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
      |    '@cached' || chr(10) || '@wraps' || chr(10) ||
      |    'async def g' || CAST(doc_id % 4 AS VARCHAR) || '():' ||
      |    chr(10) || '    await h()' || chr(10) || chr(10) ||
      |    'class C' || CAST(doc_id % 3 AS VARCHAR) || ':' ||
      |    chr(10) || '    def m(self):' || chr(10) ||
      |    '        pass' AS text
      |  FROM documents),
      |ln AS (
      |  SELECT doc_id, u2.i - 1 AS line_id, ls[u2.i] AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
      |    FROM u),
      |    LATERAL unnest(generate_series(1, len(ls))) u2(i)),
      |bd AS (
      |  SELECT doc_id, line_id, line,
      |    (regexp_matches(line, '^(async +def|def|class) ')
      |       OR regexp_matches(line, '^@'))
      |      AND NOT COALESCE(regexp_matches(
      |        lag(line) OVER (PARTITION BY doc_id ORDER BY line_id),
      |        '^@'), false) AS is_boundary
      |  FROM ln),
      |ck AS (
      |  SELECT doc_id, line_id, line,
      |    SUM(CASE WHEN is_boundary
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
      |      ORDER BY line_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |      CURRENT ROW) AS chunk_id
      |  FROM bd),
      |g AS (
      |  SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |    CAST(MIN(line_id) AS BIGINT) AS first_line,
      |    COUNT(*) AS n_lines,
      |    string_agg(line, chr(10) ORDER BY line_id) AS chunk
      |  FROM ck GROUP BY doc_id, chunk_id)
      |SELECT doc_id, chunk_id, first_line, n_lines,
      |  md5(chunk) AS chunk_md5
      |FROM g ORDER BY doc_id, chunk_id""".stripMargin

  /** q253: module-dependency stats from import extraction
    * ([[graft.operators.Code.imports]]) — the popularity table
    * dependency analysis starts from. Files cycle four import
    * shapes (plain, aliased, from-import, dotted) plus a non-import
    * body; per module: referencing docs and total references. */
  /** Shared q253/q255 synthesized import source: the four line
    * shapes (plain, aliased, from-import, dotted) plus a COMMA LIST
    * with an in-list alias (`import math, functools as ft` — two
    * modules from one line, the form a first-module-only oracle
    * regex would half-miss) and a function-local import. */
  private def importSrcCol: org.apache.spark.sql.Column = {
    val imp1 = element_at(array(
      lit("import os"), lit("import sys as system"),
      lit("from json import loads"),
      lit("import collections.abc")),
      (col("doc_id") % 4).cast("int") + 1)
    val imp2 = element_at(array(
      lit("import math, functools as ft"),
      lit("from re import compile ")),
      (col("doc_id") % 2).cast("int") + 1)
    concat(imp1, lit("\n"), imp2,
      lit("\n\ndef f(x):\n    import json\n    return x"))
  }

  /** Import-extraction replay over a caller-supplied
    * `$src(doc_id, text)` CTE — ends at `f(doc_id, module)`, one row
    * per module REFERENCE (comma lists expanded like the operator —
    * split the `import ` remainder on commas, head identifier of
    * each part). Shared by q253/q255/q261. */
  private def importExtractCtes(src: String): String =
    raw"""iln AS (
      |  SELECT doc_id, trim(ls[u2.i]) AS t
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
      |    FROM $src),
      |    LATERAL unnest(generate_series(1, len(ls))) u2(i)),
      |im0 AS (
      |  SELECT doc_id,
      |    CASE WHEN regexp_matches(t, '^import ')
      |      THEN list_transform(
      |        string_split(regexp_replace(t, '^import ', ''), ','),
      |        x -> regexp_extract(trim(x),
      |          '^([A-Za-z_][A-Za-z0-9_.]*)', 1))
      |      ELSE [regexp_extract(t,
      |        '^from ([A-Za-z_][A-Za-z0-9_.]*) import ', 1)]
      |    END AS mods
      |  FROM iln),
      |f AS (
      |  SELECT doc_id, u3.module
      |  FROM im0, LATERAL unnest(list_filter(mods, x -> len(x) > 0))
      |    u3(module))""".stripMargin

  /** The q253/q255 oracle CTE chain over the shared synthesized
    * source. */
  private val importCtes: String =
    raw"""u AS (
      |  SELECT doc_id,
      |    ['import os', 'import sys as system',
      |     'from json import loads', 'import collections.abc']
      |      [CAST(doc_id % 4 AS INT) + 1] || chr(10) ||
      |    ['import math, functools as ft', 'from re import compile ']
      |      [CAST(doc_id % 2 AS INT) + 1] || chr(10) || chr(10) ||
      |    'def f(x):' || chr(10) || '    import json' || chr(10) ||
      |    '    return x' AS text
      |  FROM documents),
      |""".stripMargin + importExtractCtes("u")

  def q253ImportStats(s: SparkSession, d: String): DataFrame = {
    val src = importSrcCol
    graft.operators.Code.imports(
        documents(s, d).select(col("doc_id"), src.as("text")),
        "doc_id", "text")
      .groupBy(col("module"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_refs"))
      .orderBy(col("module"))
  }

  private val q253Oracle: String =
    s"""WITH $importCtes
      |SELECT module, COUNT(DISTINCT doc_id) AS n_docs,
      |  COUNT(*) AS n_refs
      |FROM f GROUP BY module ORDER BY module""".stripMargin

  /** q254: markdown link/image extraction
    * ([[graft.operators.Chunker.markdownLinks]]) — every doc becomes
    * a markdown page with two cross-host links (the q158 host
    * fixture), one image reference, and a literal bracket pair that
    * must NOT extract; host resolution reuses
    * [[graft.operators.Corpus.urlHost]] (relative targets NULL). */
  def q254MarkdownLinks(s: SparkSession, d: String): DataFrame = {
    val hostsArr = array(UrlHosts.map(lit): _*)
    def hostAt(e: org.apache.spark.sql.Column) =
      element_at(hostsArr, (e % 8).cast("int") + 1)
    val md = concat(
      lit("# Doc "), col("doc_id").cast("string"),
      lit("\n\nSee [the spec](https://"),
      hostAt(col("doc_id") * 3 + 1),
      lit("/spec) and [notes](https://"), hostAt(col("doc_id") + 5),
      lit("/n/"), col("doc_id").cast("string"),
      lit(") plus ![chart](img/"), (col("doc_id") % 9).cast("string"),
      lit(".png) but not [broken brackets or (loose parens."))
    graft.operators.Chunker.markdownLinks(
        documents(s, d).select(col("doc_id"), md.as("md")),
        "doc_id", "md")
      .withColumn("target_host", Corpus.urlHost(col("target")))
      .orderBy(col("doc_id"), col("link_id"))
  }

  private val q254Oracle: String = {
    val hostList = UrlHosts.map(h => s"'$h'").mkString("[", ", ", "]")
    raw"""WITH u AS (
      |  SELECT doc_id,
      |    '# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10)
      |    || 'See [the spec](https://' ||
      |    $hostList[CAST((doc_id * 3 + 1) % 8 AS INT) + 1] ||
      |    '/spec) and [notes](https://' ||
      |    $hostList[CAST((doc_id + 5) % 8 AS INT) + 1] ||
      |    '/n/' || CAST(doc_id AS VARCHAR) ||
      |    ') plus ![chart](img/' ||
      |    CAST(doc_id % 9 AS VARCHAR) ||
      |    '.png) but not [broken brackets or (loose parens.' AS md
      |  FROM documents),
      |ex AS (
      |  SELECT doc_id,
      |    regexp_extract_all(md,
      |      '(!?)\[([^\]]*)\]\(([^)\s]*)\)', 1) AS bang,
      |    regexp_extract_all(md,
      |      '(!?)\[([^\]]*)\]\(([^)\s]*)\)', 2) AS anch,
      |    regexp_extract_all(md,
      |      '(!?)\[([^\]]*)\]\(([^)\s]*)\)', 3) AS tgt
      |  FROM u),
      |lk AS (
      |  SELECT doc_id, CAST(ci.i - 1 AS BIGINT) AS link_id,
      |    bang[ci.i] = '!' AS is_image,
      |    anch[ci.i] AS anchor, tgt[ci.i] AS target
      |  FROM ex, LATERAL unnest(generate_series(1, len(bang)))
      |    ci(i))
      |SELECT doc_id, link_id, is_image, anchor, target,
      |  CASE WHEN len(lower(regexp_extract(target,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)',
      |    1))) > 0 THEN lower(regexp_extract(target,
      |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)',
      |    1)) END AS target_host
      |FROM lk ORDER BY doc_id, link_id""".stripMargin
  }

  /** q255: module co-occurrence ("imported together") — the
    * dependency-graph construction over q253's import extraction:
    * distinct modules per doc pair within the doc (m1 < m2), edges
    * weighted by co-importing docs. Pair work is Σ C(imports/doc, 2)
    * — bounded by per-doc import counts, never corpus². */
  def q255ImportCooccurrence(s: SparkSession,
      d: String): DataFrame = {
    val src = importSrcCol
    val mods = graft.operators.Code.imports(
        documents(s, d).select(col("doc_id"), src.as("text")),
        "doc_id", "text")
      .select(col("doc_id"), col("module")).distinct()
    mods.select(col("doc_id"), col("module").as("m1"))
      .join(mods.select(col("doc_id"), col("module").as("m2")),
        Seq("doc_id"))
      .filter(col("m1") < col("m2"))
      .groupBy(col("m1"), col("m2"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("m1"), col("m2"))
  }

  private val q255Oracle: String =
    s"""WITH $importCtes,
      |fd AS (SELECT DISTINCT doc_id, module FROM f)
      |SELECT a.module AS m1, b.module AS m2, COUNT(*) AS n_docs
      |FROM fd a JOIN fd b
      |  ON a.doc_id = b.doc_id AND a.module < b.module
      |GROUP BY a.module, b.module ORDER BY m1, m2""".stripMargin

  /** q256: identifier extraction + subtoken splitting
    * ([[graft.operators.Code.identifierSubtokens]]) — the
    * code-vocabulary analysis a code-LM tokenizer budget starts
    * from. The synthesized source exercises every split class:
    * snake_case with a numeric tail, lowerCamel, an ACRONYM run
    * (`getHTTPResponse` → get/http/response), SCREAMING_SNAKE, and
    * keyword exclusion (`def`/`return` never count). */
  def q256IdentifierSubtokens(s: SparkSession,
      d: String): DataFrame = {
    val src = concat(
      lit("def loadUserData_"), (col("doc_id") % 5).cast("string"),
      lit("(x):\n    userName = getHTTPResponse(x)\n" +
        "    MAX_RETRY_COUNT = "), col("doc_id").cast("string"),
      lit("\n    return userName"))
    graft.operators.Code.identifierSubtokens(
        documents(s, d).select(col("doc_id"), src.as("text")),
        "doc_id", "text")
      .groupBy(col("subtoken"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_refs"))
      .orderBy(col("subtoken"))
  }

  private val q256Oracle: String = {
    val kw = graft.operators.Code.PythonKeywords
      .map(k => s"'$k'").mkString("[", ", ", "]")
    raw"""WITH u AS (
      |  SELECT doc_id,
      |    'def loadUserData_' || CAST(doc_id % 5 AS VARCHAR) ||
      |    '(x):' || chr(10) ||
      |    '    userName = getHTTPResponse(x)' || chr(10) ||
      |    '    MAX_RETRY_COUNT = ' || CAST(doc_id AS VARCHAR) ||
      |    chr(10) || '    return userName' AS text
      |  FROM documents),
      |ids AS (
      |  SELECT doc_id, u2.ident
      |  FROM u, LATERAL unnest(list_filter(
      |    regexp_extract_all(text, '([A-Za-z_][A-Za-z0-9_]*)', 1),
      |    x -> NOT list_contains($kw, x))) u2(ident)),
      |sp AS (
      |  SELECT doc_id, lower(regexp_replace(regexp_replace(ident,
      |    '([a-z0-9])([A-Z])', '\1 \2', 'g'),
      |    '([A-Z]+)([A-Z][a-z])', '\1 \2', 'g')) AS spaced
      |  FROM ids),
      |st AS (
      |  SELECT doc_id, u3.subtoken
      |  FROM sp, LATERAL unnest(list_filter(
      |    string_split_regex(spaced, '[_ ]+'), x -> len(x) > 0))
      |    u3(subtoken))
      |SELECT subtoken, COUNT(DISTINCT doc_id) AS n_docs,
      |  COUNT(*) AS n_refs
      |FROM st GROUP BY subtoken ORDER BY subtoken""".stripMargin
  }

  /** q257: comment/docstring accounting
    * ([[graft.operators.Code.commentStats]]) — the comment-density
    * quality signal for code corpora. The synthesized file
    * exercises a multi-line module docstring (open marker line,
    * interior line, bare close), a `#` comment, a blank line, code
    * with a TRAILING `#` (still code — line-local rules, declared),
    * and a one-line indented docstring (two markers, stays closed). */
  def q257CommentStats(s: SparkSession, d: String): DataFrame = {
    val q3 = "\"\"\""
    val src = concat(
      lit(q3 + "Doc "), col("doc_id").cast("string"),
      lit(" utilities.\ninterior line\n" + q3 +
        "\n# setup comment\nimport os\n\ndef f(x):  # trailing\n" +
        "    " + q3 + "inner docstring" + q3 + "\n    return x + "),
      col("doc_id").cast("string"))
    graft.operators.Code.commentStats(
        documents(s, d).select(col("doc_id"), src.as("text")),
        "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Comment/docstring-accounting replay over a caller-supplied
    * `$src(doc_id, text)` CTE — ends at `cg(doc_id, n_code,
    * n_comment, n_docstring, n_blank)`. Shared by q257/q261. */
  private def commentCtes(src: String): String = {
    val q3 = "\"\"\"" // three double-quotes (can't sit in a Scala
                      // triple-quoted literal directly)
    raw"""cln AS (
      |  SELECT doc_id, u9.i - 1 AS line_id, ls[u9.i] AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
      |    FROM $src),
      |    LATERAL unnest(generate_series(1, len(ls))) u9(i)),
      |cmk AS (
      |  SELECT doc_id, line_id, line,
      |    (len(line) - len(replace(line, '$q3', ''))) // 3
      |      AS markers
      |  FROM cln),
      |ccm AS (
      |  SELECT *, SUM(markers) OVER (PARTITION BY doc_id
      |    ORDER BY line_id ROWS BETWEEN UNBOUNDED PRECEDING AND
      |    CURRENT ROW) - markers AS cum_before
      |  FROM cmk),
      |ccls AS (
      |  SELECT doc_id, CASE
      |    WHEN cum_before % 2 = 1 OR markers > 0 THEN 'docstring'
      |    WHEN starts_with(trim(line), '#') THEN 'comment'
      |    WHEN len(trim(line)) = 0 THEN 'blank'
      |    ELSE 'code' END AS cls
      |  FROM ccm),
      |cg AS (
      |  SELECT doc_id,
      |    CAST(SUM(CASE WHEN cls = 'code' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_code,
      |    CAST(SUM(CASE WHEN cls = 'comment' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_comment,
      |    CAST(SUM(CASE WHEN cls = 'docstring' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_docstring,
      |    CAST(SUM(CASE WHEN cls = 'blank' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_blank
      |  FROM ccls GROUP BY doc_id)""".stripMargin
  }

  private val q257Oracle: String = {
    val q3 = "\"\"\""
    raw"""WITH u AS (
      |  SELECT doc_id,
      |    '${q3}Doc ' || CAST(doc_id AS VARCHAR) || ' utilities.' ||
      |    chr(10) || 'interior line' || chr(10) || '$q3' ||
      |    chr(10) || '# setup comment' || chr(10) || 'import os' ||
      |    chr(10) || chr(10) || 'def f(x):  # trailing' || chr(10)
      |    || '    ${q3}inner docstring$q3' || chr(10) ||
      |    '    return x + ' || CAST(doc_id AS VARCHAR) AS text
      |  FROM documents),
      |${commentCtes("u")}
      |SELECT doc_id, n_code, n_comment, n_docstring, n_blank,
      |  CASE WHEN n_code + n_comment + n_docstring > 0 THEN
      |    CAST(n_comment + n_docstring AS DOUBLE) /
      |    CAST(n_code + n_comment + n_docstring AS DOUBLE)
      |  END AS comment_ratio
      |FROM cg ORDER BY doc_id""".stripMargin
  }

  /** q259: vocabulary-coverage report
    * ([[graft.operators.Corpus.vocabCoverage]]) — per-doc OOV rate
    * under the corpus-trained top-500 word vocabulary: the
    * tokenizer-budget planning number and the foreign-doc outlier
    * signal. The oracle replays the count ranking (count desc,
    * token asc), the top-K cut, and every per-doc counter. */
  def q259VocabCoverage(s: SparkSession, d: String): DataFrame =
    Corpus.vocabCoverage(
      documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text", vocabSize = 500)
      .orderBy(col("doc_id"))

  /** Vocabulary-coverage replay over the documents table (top-500
    * vocab) — ends at `g(doc_id, n_tokens, n_oov, n_types,
    * n_oov_types)`. Shared by q259 and the composed q266 so the
    * ranking/probe arithmetic lives in ONE place. */
  private val coverageCtes: String =
    raw"""tk AS (
      |  SELECT doc_id, u2.tok
      |  FROM documents, LATERAL unnest(list_filter(
      |    string_split_regex(lower(text), '\s+'),
      |    t -> len(t) > 0)) u2(tok)),
      |vc AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
      |vr AS (
      |  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok)
      |    AS vrank
      |  FROM vc),
      |vocab AS (SELECT tok FROM vr WHERE vrank <= 500),
      |j AS (
      |  SELECT tk.doc_id, tk.tok, vocab.tok IS NOT NULL AS iv
      |  FROM tk LEFT JOIN vocab ON tk.tok = vocab.tok),
      |g AS (
      |  SELECT doc_id,
      |    COUNT(*) AS n_tokens,
      |    CAST(SUM(CASE WHEN NOT iv THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_oov,
      |    COUNT(DISTINCT tok) AS n_types,
      |    COUNT(DISTINCT CASE WHEN NOT iv THEN tok END)
      |      AS n_oov_types
      |  FROM j GROUP BY doc_id)""".stripMargin

  private val q259Oracle: String =
    s"""WITH $coverageCtes
      |SELECT d.doc_id,
      |  COALESCE(n_tokens, 0) AS n_tokens,
      |  COALESCE(n_oov, 0) AS n_oov,
      |  COALESCE(n_types, 0) AS n_types,
      |  COALESCE(n_oov_types, 0) AS n_oov_types,
      |  CASE WHEN COALESCE(n_tokens, 0) > 0 THEN
      |    CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |  END AS oov_rate
      |FROM documents d LEFT JOIN g ON g.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q266: the composed INFERENCE-SERVING MANIFEST — what a
    * teacher-scoring/embedding fleet actually reads: the q259
    * vocabulary-coverage frame gates out foreign-doc outliers
    * (OOV rate > 0.5 under the corpus top-500 vocab), survivors
    * flow into q264's length-bucketed batching (desc token count,
    * 32/batch), and each batch reports its padding waste. The
    * oracle chains the coverage replay into the rank/batch
    * arithmetic — the gate→batch COMPOSITION is what the hash match
    * proves. */
  def q266ServingManifest(s: SparkSession, d: String): DataFrame = {
    val cov = Corpus.vocabCoverage(
      documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text", vocabSize = 500)
    val keep = cov.filter(col("oov_rate").isNotNull &&
      col("oov_rate") <= 0.5)
    graft.operators.Packing.lengthBucketedBatches(
        keep.select(col("doc_id"), col("n_tokens")),
        "doc_id", "n_tokens", batchSize = 32)
      .orderBy(col("batch_id"))
  }

  private val q266Oracle: String =
    s"""WITH $coverageCtes,
      |keep AS (
      |  SELECT doc_id, n_tokens FROM g
      |  WHERE CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |    <= 0.5),
      |${Tables.lengthBatchCtes("keep", 32)}
      |${Tables.lengthBatchSelect}""".stripMargin

  /** q267: cross-source exact-content overlap matrix
    * ([[graft.operators.Dedup.crossSourceOverlap]]) — the
    * provenance audit run before mixture weights are chosen. A
    * deterministic mirror feed (every 10th doc re-emitted under
    * source 'mirror') plants cross-source duplicates so every
    * matrix cell is value-checked. */
  def q267SourceOverlap(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"),
      col("source"))
    val mirrors = base.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id") + 9000000L, col("text"),
        lit("mirror").as("source"))
      .toDF("doc_id", "text", "source")
    graft.operators.Dedup.crossSourceOverlap(
        base.unionByName(mirrors), "text", "source")
      .orderBy(col("source_a"), col("source_b"))
  }

  private val q267Oracle: String =
    """WITH un AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 9000000, text, 'mirror' FROM documents
      |  WHERE doc_id % 10 = 0),
      |k AS (SELECT DISTINCT md5(text) AS kk, source FROM un)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  COUNT(*) AS n_shared_keys
      |FROM k a JOIN k b
      |  ON a.kk = b.kk AND a.source < b.source
      |GROUP BY a.source, b.source
      |ORDER BY source_a, source_b""".stripMargin

  /** q268: Unicode script-mix signals
    * ([[graft.operators.Corpus.scriptMix]]) — the routing layer
    * beneath LID; corpus docs plus a fixture covering every family,
    * a mixed-script (spoofing-shaped) doc, a digits-only doc, and
    * an empty doc. */
  private val ScriptFixture: Seq[(Long, String)] = Seq(
    (9800001L, "Чисто русский текст без примесей"),
    (9800002L, "Ελληνικό κείμενο εδώ"),
    (9800003L, "نص عربي بسيط"),
    (9800004L, "日本語のテキストとハングル한글"),
    (9800005L, "pаypаl lоgin pаge"), // cyrillic а/о in latin words
    (9800006L, "1234567890"),
    (9800007L, ""))

  def q268ScriptMix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(ScriptFixture.toDF("doc_id", "text"))
    Corpus.scriptMix(docs, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  private val q268Oracle: String = {
    val vals = ScriptFixture.map { case (id, t) =>
      s"($id, '${t.replace("'", "''")}')"
    }.mkString(", ")
    val fams = Seq(
      "latin" -> raw"\p{Latin}",
      "cyrillic" -> raw"\p{Cyrillic}",
      "greek" -> raw"\p{Greek}",
      "arabic" -> raw"\p{Arabic}",
      "cjk" -> raw"[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]",
      "digit" -> "[0-9]")
    val ratios = fams.map { case (f, cls) =>
      s"""CASE WHEN len(text) > 0 THEN
        |      CAST(len(text) - len(regexp_replace(text, '$cls',
        |        '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE)
        |      END AS ${f}_ratio""".stripMargin
    }.mkString(",\n    ")
    val letters = fams.map(_._1).filter(_ != "digit")
    val mx = letters.map(f => s"${f}_ratio").mkString(
      "greatest(", ", ", ")")
    val dominant = letters.map(f =>
      s"WHEN ${f}_ratio = $mx THEN '$f'").mkString(
      "CASE ", " ", "END")
    val nScripts = letters.map(f =>
      s"CASE WHEN ${f}_ratio > 0.05 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT * FROM (VALUES $vals) v(doc_id, text)),
      |r AS (
      |  SELECT doc_id,
      |    $ratios
      |  FROM all_docs)
      |SELECT doc_id, latin_ratio, cyrillic_ratio, greek_ratio,
      |  arabic_ratio, cjk_ratio, digit_ratio,
      |  CASE WHEN $mx > 0 THEN $dominant END AS dominant_script,
      |  CAST($nScripts AS BIGINT) AS n_scripts,
      |  COALESCE(($nScripts) >= 2, false) AS mixed_script
      |FROM r ORDER BY doc_id""".stripMargin
  }

  /** q269: exact-dup cluster-size histogram + dedup savings
    * ([[graft.operators.Dedup.dedupSavingsHistogram]]) — the
    * before/after a dedup pass is justified with; the q267 mirror
    * feed plants deterministic size-2 clusters. */
  def q269DedupSavings(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val mirrors = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 9000000L).as("doc_id"), col("text"))
    graft.operators.Dedup.dedupSavingsHistogram(
        base.unionByName(mirrors), "doc_id", "text")
      .orderBy(col("cluster_size"))
  }

  private val q269Oracle: String =
    """WITH un AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 9000000, text FROM documents
      |  WHERE doc_id % 10 = 0),
      |cl AS (
      |  SELECT md5(text) AS kk, COUNT(*) AS cluster_size,
      |    CAST(SUM(len(text)) AS BIGINT) AS total_chars,
      |    CAST(arg_min(len(text), doc_id) AS BIGINT)
      |      AS survivor_chars
      |  FROM un GROUP BY md5(text))
      |SELECT cluster_size, COUNT(*) AS n_clusters,
      |  COUNT(*) * cluster_size AS n_docs,
      |  CAST(SUM(total_chars - survivor_chars) AS BIGINT)
      |    AS chars_saved
      |FROM cl GROUP BY cluster_size
      |ORDER BY cluster_size""".stripMargin

  /** q261: the composed CODE-CORPUS DATASHEET — the one-row audit a
    * code-corpus ship publishes (the q243/q150 device for the code
    * family): the q250 mixed feed flows through content-type
    * routing, the license chain, comment/docstring accounting, and
    * import extraction, and ONE aggregate row reports route mix,
    * license posture, comment density mass, and import surface.
    * The oracle chains FIVE established replays (nbformat walk →
    * routing signals → license chain → comment parity → import
    * expansion) — the composition is what the hash match proves. */
  def q261CodeDatasheet(s: SparkSession, d: String): DataFrame = {
    val un = codeFeed(s, d)
    val routed = Corpus.contentTypeSignals(un, "doc_id", "text")
      .select(col("doc_id"), col("content_type"))
    val lic = Corpus.licenseTags(un, "doc_id", "text")
      .select(col("doc_id"), col("license"), col("permissive"))
    val cst = graft.operators.Code.commentStats(un, "doc_id", "text")
      .select(col("doc_id"), col("n_code"), col("n_comment"),
        col("n_docstring"))
    val impAgg = graft.operators.Code.imports(un, "doc_id", "text")
      .agg(count(lit(1)).as("n_import_refs"),
        countDistinct(col("module")).as("n_modules"))
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    un.select(col("doc_id"))
      .join(routed, Seq("doc_id"))
      .join(lic, Seq("doc_id"))
      .join(cst, Seq("doc_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        cnt(col("content_type") === "code").as("n_code_docs"),
        cnt(col("content_type") === "math").as("n_math_docs"),
        cnt(col("content_type") === "prose").as("n_prose_docs"),
        cnt(col("permissive")).as("n_permissive"),
        cnt(col("license").isNotNull && !col("permissive"))
          .as("n_restricted"),
        cnt(col("license").isNull).as("n_unknown"),
        sum(col("n_code")).as("code_lines"),
        (sum(col("n_comment")) + sum(col("n_docstring")))
          .as("comment_lines"))
      .crossJoin(impAgg)
  }

  private val q261Oracle: String =
    s"""WITH $codeFeedCtes,
      |${contentSigCtes("un")},
      |${licenseCtes("un")},
      |${commentCtes("un")},
      |${importExtractCtes("un")},
      |ia AS (
      |  SELECT COUNT(*) AS n_import_refs,
      |    COUNT(DISTINCT module) AS n_modules
      |  FROM f),
      |da AS (
      |  SELECT COUNT(*) AS n_docs,
      |    CAST(SUM(CASE WHEN content_type = 'code' THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_code_docs,
      |    CAST(SUM(CASE WHEN content_type = 'math' THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_math_docs,
      |    CAST(SUM(CASE WHEN content_type = 'prose' THEN 1 ELSE 0
      |      END) AS BIGINT) AS n_prose_docs,
      |    CAST(SUM(CASE WHEN permissive THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_permissive,
      |    CAST(SUM(CASE WHEN license IS NOT NULL
      |      AND NOT permissive THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_restricted,
      |    CAST(SUM(CASE WHEN license IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_unknown,
      |    CAST(SUM(n_code) AS BIGINT) AS code_lines,
      |    CAST(SUM(n_comment) + SUM(n_docstring) AS BIGINT)
      |      AS comment_lines
      |  FROM un
      |  JOIN csig USING (doc_id)
      |  JOIN lic USING (doc_id)
      |  JOIN cg USING (doc_id))
      |SELECT da.n_docs, da.n_code_docs, da.n_math_docs,
      |  da.n_prose_docs, da.n_permissive, da.n_restricted,
      |  da.n_unknown, da.code_lines, da.comment_lines,
      |  ia.n_import_refs, ia.n_modules
      |FROM da CROSS JOIN ia""".stripMargin

  /** Fixture rows for q262 — the segmentation edge cases: multi-
    * terminator runs, an unterminated tail, a terminator-only doc
    * (zero sentences), and an empty doc. */
  private val SentenceFixture: Seq[(Long, String)] = Seq(
    (9700001L, "One. Two!! Three? tail with no dot"),
    (9700002L, "..."),
    (9700003L, ""),
    (9700004L, "  spaced.   out  "))

  /** q262: rule-based sentence segmentation
    * ([[graft.operators.Corpus.sentences]]) — the unit beneath the
    * paragraph/line operators; corpus docs plus the edge fixture,
    * every sentence byte-checked. */
  def q262Sentences(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d).select(col("doc_id"), col("text"))
      .unionByName(SentenceFixture.toDF("doc_id", "text"))
    Corpus.sentences(docs, "doc_id", "text")
      .orderBy(col("doc_id"), col("sent_id"))
  }

  private val q262Oracle: String = {
    val vals = SentenceFixture.map { case (id, t) =>
      s"($id, '${t.replace("'", "''")}')"
    }.mkString(", ")
    raw"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT * FROM (VALUES $vals) v(doc_id, text)),
      |sx AS (
      |  SELECT doc_id, list_filter(list_transform(
      |    regexp_extract_all(text, '([^.!?]+[.!?]+|[^.!?]+$$)', 1),
      |    s -> trim(s)), s -> len(s) > 0) AS sents
      |  FROM all_docs),
      |e AS (
      |  SELECT doc_id, CAST(u2.i - 1 AS BIGINT) AS sent_id,
      |    sents[u2.i] AS sentence
      |  FROM sx, LATERAL unnest(generate_series(1, len(sents)))
      |    u2(i))
      |SELECT doc_id, sent_id, sentence FROM e
      |ORDER BY doc_id, sent_id""".stripMargin
  }

  /** q263: Heaps'-law vocabulary growth
    * ([[graft.operators.Corpus.vocabGrowth]]) — distinct types vs
    * tokens at 10 corpus prefixes in doc_id order; the oracle
    * replays the rank, the first-occurrence collapse, and both
    * checkpoint joins. */
  def q263VocabGrowth(s: SparkSession, d: String): DataFrame =
    Corpus.vocabGrowth(
      documents(s, d).select(col("doc_id"), col("text")),
      "doc_id", "text", checkpoints = 10)
      .orderBy(col("checkpoint"))

  /** The q263/q289 shared vocab-growth oracle chain, ending at
    * `growth(checkpoint, n_docs, n_tokens, n_types)`. */
  private val VocabGrowthCtes: String =
    raw"""rk AS (
      |  SELECT doc_id, text,
      |    row_number() OVER (ORDER BY doc_id) AS rnk
      |  FROM documents),
      |tk AS (
      |  SELECT rnk, u2.tok
      |  FROM rk, LATERAL unnest(list_filter(
      |    string_split_regex(lower(text), '\s+'),
      |    t -> len(t) > 0)) u2(tok)),
      |fr AS (SELECT tok, MIN(rnk) AS first_rnk FROM tk
      |  GROUP BY tok),
      |dt AS (SELECT rnk, COUNT(*) AS n_toks FROM tk GROUP BY rnk),
      |nn AS (SELECT COUNT(*) AS n FROM documents),
      |cp AS (
      |  SELECT g.i AS checkpoint,
      |    CAST(floor(g.i * n / 10) AS BIGINT) AS cutoff
      |  FROM nn, LATERAL unnest(generate_series(1, 10)) g(i)),
      |ty AS (
      |  SELECT checkpoint, COUNT(*) AS n_types
      |  FROM fr JOIN cp ON first_rnk <= cutoff
      |  GROUP BY checkpoint),
      |tt AS (
      |  SELECT checkpoint, SUM(n_toks) AS n_tokens
      |  FROM dt JOIN cp ON rnk <= cutoff
      |  GROUP BY checkpoint),
      |growth AS (
      |  SELECT cp.checkpoint, cp.cutoff AS n_docs,
      |    CAST(COALESCE(tt.n_tokens, 0) AS BIGINT) AS n_tokens,
      |    CAST(COALESCE(ty.n_types, 0) AS BIGINT) AS n_types
      |  FROM cp
      |  LEFT JOIN ty ON ty.checkpoint = cp.checkpoint
      |  LEFT JOIN tt ON tt.checkpoint = cp.checkpoint)""".stripMargin

  private val q263Oracle: String =
    s"""WITH $VocabGrowthCtes
      |SELECT checkpoint, n_docs, n_tokens, n_types
      |FROM growth ORDER BY checkpoint""".stripMargin

  /** q289: Heaps'-law exponent fit
    * ([[graft.operators.PowerLaw.logLogFit]] over the q263 growth
    * curve) — OLS of ln V = ln K + β·ln n over the 10 corpus
    * prefixes; β (≈0.4–0.6 for natural text) is the
    * vocabulary-scaling forecast a tokenizer budget is sized
    * against. Oracle = the q263 chain + the shared OLS tail. */
  def q289HeapsFit(s: SparkSession, d: String): DataFrame =
    graft.operators.PowerLaw.logLogFit(
      Corpus.vocabGrowth(
        documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", checkpoints = 10),
      "n_tokens", "n_types")

  private val q289Oracle: String =
    s"""WITH $VocabGrowthCtes,
      |pts AS (
      |  SELECT floor(ln(CAST(n_tokens AS DOUBLE)) * 1e9) / 1e9 AS x,
      |    floor(ln(CAST(n_types AS DOUBLE)) * 1e9) / 1e9 AS y
      |  FROM growth WHERE n_tokens > 0 AND n_types > 0),
      |${Tables.olsLogLogTailSql("pts", "n_points")}""".stripMargin

  /** q180: ROUGE-1/2 of the lead-30-token extractive baseline against
    * the full document ([[Eval.rougeStats]]) — the lead-k baseline
    * every summarization eval is benchmarked over. Pure map stage:
    * all counts are in-row array folds. */
  def q180RougeEval(s: SparkSession, d: String): DataFrame = {
    val tk = split(trim(col("text")), "\\s+")
    // fan out the base scan: n-gram eval metrics are expression-
    // dense and a single-file table would serialize them on one core
    val pairs = graft.queries.Tables
      .fanOutForCompute(documents(s, d))
      .select(col("doc_id"),
        concat_ws(" ", slice(tk, 1, 30)).as("cand"),
        col("text").as("ref"))
    Eval.rougeStats(pairs, "cand", "ref")
      .select(col("doc_id"),
        col("m1"), col("c1"), col("r1"),
        col("p1"), col("rec1"), col("f1"),
        col("m2"), col("c2"), col("r2"),
        col("p2"), col("rec2"), col("f2"))
      .orderBy(col("doc_id"))
  }

  /** q181: near-dup dedup with the KEEP-LONGEST cluster policy
    * ([[Dedup.nearDupDedupBy]] on n_chars) — same LSH → Jaccard →
    * components pipeline as q120, but each cluster's survivor is its
    * longest member (ties → min id) instead of the minimum id; the
    * oracle replays the full pipeline (shared CTEs with q120) plus
    * the per-cluster argmax window. */
  def q181ClusterKeepLongest(s: SparkSession, d: String): DataFrame =
    Dedup.nearDupDedupBy(
        documents(s, d).select(col("doc_id"), col("text"),
          col("n_chars")),
        "doc_id", "text", "n_chars",
        threshold = 0.5, shingleN = 3, numHashes = 16, bands = 4,
        maxDf = 50)
      .select(col("doc_id"), col("cluster"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** q182: source-blocklist hygiene pass ([[Corpus.blocklistFilter]]
    * — broadcast left-anti, the corpus never shuffles) + per-language
    * survival stats. */
  def q182Blocklist(s: SparkSession, d: String): DataFrame = {
    val blocked = s.createDataFrame(
      BlockedSources.map(Tuple1(_))).toDF("source")
    Corpus.blocklistFilter(documents(s, d), "source", blocked)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("kept_docs"),
        sum(col("n_chars")).cast("long").as("kept_chars"))
      .orderBy(col("lang"))
  }

  private val BlockedSources = Seq("src3", "src7", "src11", "src15")

  /** q183: exact per-language token-length quantiles
    * ([[Corpus.exactQuantiles]] — histogram-based, no per-group
    * sort), checked against DuckDB's independent `quantile_cont`.
    * All four fractions are exact binary fractions, so the type-7
    * interpolation is bit-identical on any engine. */
  def q183LengthQuantiles(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("lang"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("tl"))
    Corpus.exactQuantiles(docs, "lang", "tl",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
        "p875" -> 0.875))
      .orderBy(col("lang"))
  }

  /** q184: sequence-length curriculum with 5-bucket round-robin
    * interleave ([[Corpus.curriculumInterleave]] on n_chars asc).
    * The oracle computes the same order with real window functions
    * (row_number + ntile + the interleave row_number) — proving the
    * engine's closed-form NTILE arithmetic and two-pass global rank
    * against the reference window semantics. */
  def q184Curriculum(s: SparkSession, d: String): DataFrame =
    Corpus.curriculumInterleave(
        documents(s, d).select(col("doc_id"), col("n_chars")),
        "n_chars", "doc_id", buckets = 5)
      .select(col("doc_id"), col("n_chars"), col("rnk"),
        col("bucket"), col("pos"), col("training_pos"))
      .orderBy(col("training_pos"))

  /** q185: top-30 bigram collocations by PMI with a min-count-5
    * floor ([[Corpus.pmiCollocations]]) — the phrase-induction pass
    * a tokenizer/vocab pipeline mines before merging multi-word
    * units. ln is 9-decimal-truncated (the q171/q172 device) so both
    * engines rank identically. */
  def q185PmiCollocations(s: SparkSession, d: String): DataFrame =
    Corpus.pmiCollocations(documents(s, d), "text",
      minCount = 5, k = 30)

  /** q187: language-ID confusion matrix — the marker-n-gram LID
    * heuristic ([[graft.functions.TextFunctions.langIdHeuristic]],
    * previously facade-only) evaluated against the corpus's true
    * `lang` labels: (lang, guess, n) counts. The oracle replays the
    * marker counting (literal replace length-diffs), the argmax
    * tie-break (score DESC, lang DESC — array_max struct order), and
    * the aggregation. zh has no marker list, so its row lands on the
    * tie-break guess — the confusion matrix SHOWS the heuristic's
    * coverage hole, which is the point of an eval query. */
  def q187LangidConfusion(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"),
        graft.functions.TextFunctions.langIdHeuristic(col("text"))
          .as("guess"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guess"))

  /** q189: Flesch reading-ease over the corpus
    * ([[Corpus.readabilityStats]]) — declared-heuristic counts +
    * trunc9 score, the readability quality gate. */
  def q189Readability(s: SparkSession, d: String): DataFrame =
    Corpus.readabilityStats(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** q199: C4-style badwords document gate
    * ([[Corpus.badwordsFilter]]) — documents containing any blocked
    * token (lowercased, \s+ split) dropped; the broadcast list +
    * semi-join + anti-join shape is the 100 TB form of the LDNOOBW
    * filter every public web corpus applies. */
  def q199BadwordsFilter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bad = Seq("dup", "corrupt", "spam").toDF("word")
    Corpus.badwordsFilter(documents(s, d), "doc_id", "text", bad)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val q199Oracle: String =
    raw"""WITH bad AS (
      |  SELECT * FROM (VALUES ('dup'), ('corrupt'), ('spam'))
      |    b(word)),
      |toks AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
      |  FROM documents),
      |m AS (
      |  SELECT DISTINCT doc_id FROM toks
      |  JOIN bad ON toks.tok = bad.word)
      |SELECT doc_id, lang, n_chars FROM documents
      |WHERE doc_id NOT IN (SELECT doc_id FROM m)
      |ORDER BY doc_id""".stripMargin

  /** q201: skip-gram pairs with unigram^0.75 negative sampling
    * ([[graft.operators.SkipGram.pairsWithNegatives]]) over the
    * doc_id < 50 slice — every positive pair and every hash-drawn
    * negative replayed token-exactly by the oracle's interval
    * lookup. */
  def q201SkipgramNegatives(s: SparkSession, d: String): DataFrame =
    graft.operators.SkipGram.pairsWithNegatives(
        documents(s, d).filter(col("doc_id") < 50), "doc_id", "text",
        window = 1, negatives = 2)
      .select(col("doc"), col("pos").cast("long").as("pos"),
        col("off").cast("long").as("off"), col("center"),
        col("context"), col("neg_idx").cast("long").as("neg_idx"),
        col("negative"))
      .orderBy(col("doc"), col("pos"), col("off"), col("neg_idx"))

  private val q201Oracle: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 50),
      |tl AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |    x -> len(x) > 0) AS t
      |  FROM docs),
      |toks AS (
      |  SELECT doc_id AS doc, generate_subscripts(t, 1) - 1 AS pos,
      |    unnest(t) AS w
      |  FROM tl),
      |targets AS (
      |  SELECT doc, pos, w AS center, off, pos + off AS tpos
      |  FROM toks CROSS JOIN (SELECT unnest([-1, 1]) AS off)),
      |pairs AS (
      |  SELECT t.doc, t.pos, t.off, t.center, k.w AS context
      |  FROM targets t
      |  JOIN toks k ON k.doc = t.doc AND k.pos = t.tpos),
      |vw AS (
      |  SELECT w, CAST(floor(sqrt(sqrt(
      |      CAST(cnt AS DOUBLE) * cnt * cnt)) * 1000) AS BIGINT)
      |    AS wgt
      |  FROM (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY 1)),
      |cum AS (
      |  SELECT w, wgt, SUM(wgt) OVER (ORDER BY w
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw1
      |  FROM vw),
      |cum2 AS (SELECT w, cw1 - wgt AS cw0, cw1 FROM cum),
      |tot AS (SELECT MAX(cw1) AS total FROM cum),
      |draws AS (
      |  SELECT doc, pos, off, center, context, neg_idx,
      |    ('0x' || substr(md5('neg:' || doc || ':' || pos || ':' ||
      |      off || ':' || neg_idx), 1, 15))::UBIGINT::BIGINT % total
      |      AS u
      |  FROM pairs
      |  CROSS JOIN (SELECT unnest([0, 1]) AS neg_idx)
      |  CROSS JOIN tot)
      |SELECT d.doc, d.pos, d.off, d.center, d.context, d.neg_idx,
      |  c.w AS negative
      |FROM draws d JOIN cum2 c ON d.u >= c.cw0 AND d.u < c.cw1
      |ORDER BY doc, pos, off, neg_idx""".stripMargin

  /** q202: T5 span corruption
    * ([[graft.operators.SpanCorruption.corrupt]]) over the
    * doc_id < 100 slice — noiseRate 0.15, spanLen 3 (the T5
    * defaults); the oracle replays every hash decision, island,
    * sentinel number, and both rebuilt strings. */
  def q202SpanCorruption(s: SparkSession, d: String): DataFrame =
    graft.operators.SpanCorruption.corrupt(
      documents(s, d).filter(col("doc_id") < 100), "doc_id", "text")

  private val q202Oracle: String =
    """WITH docs AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 100),
      |tl AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '),
      |    x -> len(x) > 0) AS t
      |  FROM docs),
      |toks AS (
      |  SELECT doc_id AS doc, generate_subscripts(t, 1) - 1 AS pos,
      |    unnest(t) AS w
      |  FROM tl),
      |n AS (
      |  SELECT doc, pos, w,
      |    ('0x' || substr(md5('span:' || doc || ':' || (pos // 3)),
      |      1, 8))::UBIGINT::BIGINT % 1000 < 150 AS noise
      |  FROM toks),
      |r AS (
      |  SELECT *, SUM(CASE WHEN noise THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY doc ORDER BY pos) AS nseq
      |  FROM n),
      |i AS (
      |  SELECT *, CASE WHEN noise THEN pos - nseq END AS island
      |  FROM r),
      |kk AS (
      |  SELECT *, CASE WHEN noise THEN DENSE_RANK()
      |    OVER (PARTITION BY doc ORDER BY island NULLS LAST) - 1 END
      |    AS k
      |  FROM i),
      |f AS (
      |  SELECT *, noise AND ROW_NUMBER()
      |    OVER (PARTITION BY doc, island ORDER BY pos) = 1 AS first
      |  FROM kk),
      |p AS (
      |  SELECT doc, pos, noise, island,
      |    CASE WHEN NOT noise THEN w
      |      WHEN first THEN '<extra_id_' || k || '>' END AS inp,
      |    CASE WHEN noise THEN
      |      CASE WHEN first THEN '<extra_id_' || k || '> ' || w
      |        ELSE w END END AS tgt
      |  FROM f)
      |SELECT doc AS doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(CASE WHEN noise THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_masked,
      |  COUNT(DISTINCT island) AS n_spans,
      |  COALESCE(string_agg(inp, ' ' ORDER BY pos)
      |    FILTER (WHERE inp IS NOT NULL), '') AS input_text,
      |  COALESCE(string_agg(tgt, ' ' ORDER BY pos)
      |    FILTER (WHERE tgt IS NOT NULL), '') AS target_text
      |FROM p GROUP BY doc ORDER BY doc""".stripMargin

  /** q209: content-defined chunking ([[graft.operators.Cdc.chunks]])
    * — gear rolling hash, divisor 64, size bounds [16, 256]; the
    * oracle replays every per-position window hash and the
    * sequential accept/force fold, then every chunk span and md5. */
  def q209CdcChunks(s: SparkSession, d: String): DataFrame =
    graft.operators.Cdc.chunks(documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** CDC CTE chain shared by q209 and q218, ending in a `chunks`
    * CTE with one row per (doc, chunk). */
  private val cdcCtes: String =
    """d AS (
      |  SELECT doc_id, text AS t, CAST(len(text) AS INT) AS n
      |  FROM documents WHERE len(text) > 0),
      |b AS (
      |  SELECT doc_id, t, n,
      |    list_reduce(
      |      list_prepend(
      |        [struct_pack(h := CAST(0 AS BIGINT), last := 0,
      |          bs := CAST([] AS INT[]))],
      |        list_transform(generate_series(1, n), x ->
      |          CAST(NULL AS STRUCT(h BIGINT, last INTEGER,
      |            bs INTEGER[])[]))),
      |      (acc, x) -> list_append(acc, CASE
      |        WHEN len(acc) - acc[len(acc)].last >= 256
      |          OR (len(acc) - acc[len(acc)].last >= 16
      |            AND (acc[len(acc)].h * 2 +
      |              ord(substr(t, len(acc), 1))) % 1048576 % 64 = 0)
      |        THEN struct_pack(
      |          h := (acc[len(acc)].h * 2 +
      |            ord(substr(t, len(acc), 1))) % 1048576,
      |          last := len(acc),
      |          bs := list_append(acc[len(acc)].bs, len(acc)))
      |        ELSE struct_pack(
      |          h := (acc[len(acc)].h * 2 +
      |            ord(substr(t, len(acc), 1))) % 1048576,
      |          last := acc[len(acc)].last,
      |          bs := acc[len(acc)].bs) END)) AS res
      |  FROM d),
      |bb AS (
      |  SELECT doc_id, t, n,
      |    CASE WHEN res[n + 1].last = n AND len(res[n + 1].bs) > 0
      |      THEN res[n + 1].bs
      |      ELSE list_append(res[n + 1].bs, n) END AS bs
      |  FROM b),
      |sp AS (
      |  SELECT doc_id, t, bs,
      |    list_prepend(0, bs[1:len(bs) - 1]) AS starts
      |  FROM bb),
      |chunks AS (
      |  SELECT doc_id, CAST(gi - 1 AS BIGINT) AS chunk_idx,
      |    CAST(starts[gi] AS BIGINT) AS start,
      |    CAST(bs[gi] - starts[gi] AS BIGINT) AS chunk_len,
      |    md5(substr(t, starts[gi] + 1, bs[gi] - starts[gi]))
      |      AS chunk_md5
      |  FROM sp, LATERAL unnest(generate_series(1, len(bs)))
      |    AS g(gi))""".stripMargin

  private lazy val q209Oracle: String =
    s"""WITH $cdcCtes
       |SELECT doc_id, chunk_idx, start, chunk_len, chunk_md5
       |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin

  private lazy val q218Oracle: String =
    s"""WITH $cdcCtes,
       |ch AS (
       |  SELECT doc_id AS doc, chunk_md5,
       |    MAX(chunk_len) AS chunk_len
       |  FROM chunks GROUP BY 1, 2),
       |cool AS (
       |  SELECT doc, chunk_md5, chunk_len FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY chunk_md5) AS df
       |    FROM ch) x
       |  WHERE df <= 50)
       |SELECT a.doc AS id_a, b.doc AS id_b,
       |  COUNT(*) AS shared_chunks,
       |  CAST(SUM(a.chunk_len) AS BIGINT) AS shared_chars
       |FROM cool a JOIN cool b ON a.chunk_md5 = b.chunk_md5
       |  AND a.doc < b.doc
       |GROUP BY 1, 2 HAVING COUNT(*) >= 2
       |ORDER BY id_a, id_b""".stripMargin

  /** q213: reciprocal-rank fusion of three incompatible quality
    * scorers — Flesch reading-ease, type-token ratio, and word
    * count ([[graft.operators.Corpus.rrfFusion]]); every rank and
    * the fused sum replay exactly (fixed IEEE addition chain). */
  def q213QualityFusion(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val toks = filter(split(col("text"), " "),
      x => length(x) > 0)
    val scored = Corpus.readabilityStats(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"),
        (size(array_distinct(toks)).cast("double") / size(toks))
          .as("ttr"),
        size(toks).cast("double").as("wlen")), "doc_id")
    Corpus.rrfFusion(scored, "doc_id",
        Seq("flesch", "ttr", "wlen"))
      .orderBy(col("doc_id"))
  }

  private val q213Oracle: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
      |      AS BIGINT) AS words,
      |    GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT)) AS sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS syllables,
      |    list_filter(string_split(text, ' '), x -> len(x) > 0)
      |      AS t
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CASE WHEN words > 0 THEN
      |      floor((CAST(206.835 AS DOUBLE) -
      |        CAST(1.015 AS DOUBLE) *
      |          (CAST(words AS DOUBLE) / sentences) -
      |        CAST(84.6 AS DOUBLE) *
      |          (CAST(syllables AS DOUBLE) / words)) * 1e9) / 1e9
      |    END AS flesch,
      |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
      |    CAST(len(t) AS DOUBLE) AS wlen
      |  FROM c),
      |rk AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY flesch DESC NULLS LAST,
      |      doc_id) AS rank_flesch,
      |    ROW_NUMBER() OVER (ORDER BY ttr DESC NULLS LAST, doc_id)
      |      AS rank_ttr,
      |    ROW_NUMBER() OVER (ORDER BY wlen DESC NULLS LAST, doc_id)
      |      AS rank_wlen
      |  FROM sc)
      |SELECT doc_id, rank_flesch, rank_ttr, rank_wlen,
      |  1.0 / (60.0 + rank_flesch) + 1.0 / (60.0 + rank_ttr) +
      |    1.0 / (60.0 + rank_wlen) AS fused
      |FROM rk ORDER BY doc_id""".stripMargin

  /** q222: fused-quality curriculum — the q213 RRF quality score
    * drives [[Corpus.curriculumInterleave]] (cleanest first, 5
    * difficulty buckets round-robined): the composed
    * "score → order → interleave" pipeline a curriculum-training
    * run materializes. The oracle chains the q213 rank CTEs into
    * q184's window replay of the interleave. */
  def q222QualityCurriculum(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val toks = filter(split(col("text"), " "),
      x => length(x) > 0)
    val scored = Corpus.readabilityStats(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"),
        (size(array_distinct(toks)).cast("double") / size(toks))
          .as("ttr"),
        size(toks).cast("double").as("wlen")), "doc_id")
    val fused = Corpus.rrfFusion(scored, "doc_id",
        Seq("flesch", "ttr", "wlen"))
      .withColumn("neg_fused", -col("fused"))
    Corpus.curriculumInterleave(
        fused.select(col("doc_id"), col("neg_fused"), col("fused")),
        "neg_fused", "doc_id", buckets = 5)
      .select(col("doc_id"), col("fused"), col("rnk"),
        col("bucket"), col("pos"), col("training_pos"))
      .orderBy(col("training_pos"))
  }

  private val q222Oracle: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
      |      AS BIGINT) AS words,
      |    GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT)) AS sentences,
      |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT) AS syllables,
      |    list_filter(string_split(text, ' '), x -> len(x) > 0)
      |      AS t
      |  FROM documents),
      |sc AS (
      |  SELECT doc_id,
      |    CASE WHEN words > 0 THEN
      |      floor((CAST(206.835 AS DOUBLE) -
      |        CAST(1.015 AS DOUBLE) *
      |          (CAST(words AS DOUBLE) / sentences) -
      |        CAST(84.6 AS DOUBLE) *
      |          (CAST(syllables AS DOUBLE) / words)) * 1e9) / 1e9
      |    END AS flesch,
      |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
      |    CAST(len(t) AS DOUBLE) AS wlen
      |  FROM c),
      |rk AS (
      |  SELECT doc_id,
      |    ROW_NUMBER() OVER (ORDER BY flesch DESC NULLS LAST,
      |      doc_id) AS rank_flesch,
      |    ROW_NUMBER() OVER (ORDER BY ttr DESC NULLS LAST, doc_id)
      |      AS rank_ttr,
      |    ROW_NUMBER() OVER (ORDER BY wlen DESC NULLS LAST, doc_id)
      |      AS rank_wlen
      |  FROM sc),
      |f AS (
      |  SELECT doc_id,
      |    1.0 / (60.0 + rank_flesch) + 1.0 / (60.0 + rank_ttr) +
      |      1.0 / (60.0 + rank_wlen) AS fused
      |  FROM rk),
      |t2 AS (
      |  SELECT doc_id, fused,
      |    row_number() OVER (ORDER BY fused DESC, doc_id) AS rnk,
      |    ntile(5) OVER (ORDER BY fused DESC, doc_id) AS bucket
      |  FROM f),
      |p2 AS (
      |  SELECT doc_id, fused, rnk, bucket,
      |    row_number() OVER (PARTITION BY bucket ORDER BY rnk)
      |      AS pos
      |  FROM t2)
      |SELECT doc_id, fused, rnk, bucket, pos,
      |  row_number() OVER (ORDER BY pos, bucket) AS training_pos
      |FROM p2 ORDER BY training_pos""".stripMargin

  /** q214: exactly-3-per-(lang, source) deterministic sample
    * ([[graft.operators.Split.sampleKPerGroup]]) — the fixed-COUNT
    * eval-set builder the rate-based q80 sampler cannot express. */
  def q214SampleKPerGroup(s: SparkSession, d: String): DataFrame =
    graft.operators.Split.sampleKPerGroup(documents(s, d),
        Seq("lang", "source"), "doc_id", 3)
      .orderBy(col("doc_id"))

  private val q214Oracle: String =
    """SELECT doc_id, text, lang, source, n_chars FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source
      |    ORDER BY md5('samplek:' || CAST(doc_id AS VARCHAR)),
      |      doc_id) AS r
      |  FROM documents) x
      |WHERE r <= 3 ORDER BY doc_id""".stripMargin

  /** q215: EXACT Jaccard-threshold similarity join via prefix
    * filtering ([[graft.operators.Dedup.jaccardPrefixJoin]],
    * AllPairs/PPJoin) at τ=0.9 over the doc_id < 200 slice — the
    * no-false-negative complement of the LSH/banding dedup paths;
    * the oracle replays the df-ranked vocabulary, every prefix,
    * the length filter, and the exact verify. */
  def q215JaccardPrefixJoin(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.jaccardPrefixJoin(
        documents(s, d).filter(col("doc_id") < 200), "doc_id",
        "text", tau = 0.9)
      .orderBy(col("id_a"), col("id_b"))

  private val q215Oracle: String =
    """WITH toks AS (
      |  SELECT doc_id AS doc,
      |    unnest(list_distinct(list_filter(string_split(text, ' '),
      |      x -> len(x) > 0))) AS tok
      |  FROM documents WHERE doc_id < 200),
      |rk AS (
      |  SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*), tok)
      |    AS rank
      |  FROM toks GROUP BY tok),
      |d2 AS (
      |  SELECT doc, ra, sz,
      |    CAST(sz - ceil(0.9 * sz) + 1 AS INT) AS plen
      |  FROM (
      |    SELECT doc, list_sort(list(rank)) AS ra, COUNT(*) AS sz
      |    FROM toks JOIN rk USING (tok) GROUP BY doc) dd),
      |pfx AS (
      |  SELECT doc, sz, unnest(ra[1:plen]) AS rank FROM d2),
      |cand AS (
      |  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
      |  FROM pfx a JOIN pfx b ON a.rank = b.rank AND a.doc < b.doc
      |    AND b.sz >= ceil(0.9 * a.sz)
      |    AND a.sz >= ceil(0.9 * b.sz)),
      |v AS (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(x.ra, y.ra)) AS BIGINT) AS inter,
      |    CAST(x.sz AS BIGINT) AS sz_a, CAST(y.sz AS BIGINT) AS sz_b
      |  FROM cand c
      |  JOIN d2 x ON x.doc = c.id_a
      |  JOIN d2 y ON y.doc = c.id_b)
      |SELECT id_a, id_b, inter, sz_a, sz_b,
      |  CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) AS jaccard
      |FROM v
      |WHERE CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) >= 0.9
      |ORDER BY id_a, id_b""".stripMargin

  /** q218: chunk-hash near-dup pairs over the CDC chunks
    * ([[graft.operators.Cdc.sharedChunkPairs]]) — the dedup join
    * content-defined chunking exists to feed; hot chunk hashes
    * dropped before the pair join (the shingle-index skew guard). */
  def q218ChunkDedupPairs(s: SparkSession, d: String): DataFrame =
    graft.operators.Cdc.sharedChunkPairs(documents(s, d), "doc_id",
        "text")
      .orderBy(col("id_a"), col("id_b"))

  /** q219: token-distribution drift between the English slice and
    * the rest of the corpus
    * ([[graft.operators.Corpus.distributionDrift]]) — add-one
    * smoothed unigram KL both ways + the bounded JS divergence, all
    * terms ln9/t9-truncated into exact decimal sums. */
  def q219DistributionDrift(s: SparkSession, d: String): DataFrame =
    Corpus.distributionDrift(documents(s, d), "text",
      col("lang") === "en")

  private val q219Oracle: String =
    """WITH toks AS (
      |  SELECT lang = 'en' AS a,
      |    unnest(list_filter(string_split(text, ' '),
      |      x -> len(x) > 0)) AS tok
      |  FROM documents),
      |ca AS (SELECT tok, COUNT(*) AS ca FROM toks WHERE a
      |  GROUP BY 1),
      |cb AS (SELECT tok, COUNT(*) AS cb FROM toks WHERE NOT a
      |  GROUP BY 1),
      |j AS (
      |  SELECT COALESCE(ca.ca, 0) AS ca, COALESCE(cb.cb, 0) AS cb
      |  FROM ca FULL OUTER JOIN cb USING (tok)),
      |t AS (
      |  SELECT COUNT(*) AS v, CAST(SUM(ca) AS BIGINT) AS na,
      |    CAST(SUM(cb) AS BIGINT) AS nb
      |  FROM j),
      |pq AS (
      |  SELECT v, na, nb,
      |    CAST(ca + 1 AS DOUBLE) / (na + v) AS p,
      |    CAST(cb + 1 AS DOUBLE) / (nb + v) AS q
      |  FROM j CROSS JOIN t),
      |mm AS (SELECT *, (p + q) / 2 AS m FROM pq)
      |SELECT MAX(v) AS vocab_union, MAX(na) AS tokens_a,
      |  MAX(nb) AS tokens_b,
      |  CAST(SUM(CAST(floor(p * (floor(ln(p) * 1e9) / 1e9 -
      |    floor(ln(q) * 1e9) / 1e9) * 1e9) / 1e9
      |    AS DECIMAL(18,15))) AS DOUBLE) AS kl_ab,
      |  CAST(SUM(CAST(floor(q * (floor(ln(q) * 1e9) / 1e9 -
      |    floor(ln(p) * 1e9) / 1e9) * 1e9) / 1e9
      |    AS DECIMAL(18,15))) AS DOUBLE) AS kl_ba,
      |  CAST(SUM(CAST(floor(p * (floor(ln(p) * 1e9) / 1e9 -
      |    floor(ln(m) * 1e9) / 1e9) * 1e9) / 1e9
      |    AS DECIMAL(18,15))) AS DOUBLE) / 2 +
      |  CAST(SUM(CAST(floor(q * (floor(ln(q) * 1e9) / 1e9 -
      |    floor(ln(m) * 1e9) / 1e9) * 1e9) / 1e9
      |    AS DECIMAL(18,15))) AS DOUBLE) / 2 AS js
      |FROM mm""".stripMargin

  /** q228: token frequency-of-frequencies spectrum — the
    * Good-Turing N_c table (how many types occur exactly c times)
    * plus each count's corpus-mass share; the companion statistic
    * to the q172 Zipf slope, and the input every smoothing
    * estimator (Good-Turing, Kneser-Ney discounts) is fitted on.
    * Two bounded aggregations after the token scan. */
  def q228FreqSpectrum(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(explode(filter(split(col("text"), " "),
        x => length(x) > 0)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = tf.agg(sum(col("c")).as("tot"))
    tf.groupBy(col("c"))
      .agg(count(lit(1)).as("n_types"))
      .crossJoin(broadcast(tot))
      .select(col("c"), col("n_types"),
        ((col("c") * col("n_types")).cast("double") / col("tot"))
          .as("mass_share"))
      .orderBy(col("c"))
  }

  private val q228Oracle: String =
    """WITH tf AS (
      |  SELECT tok, COUNT(*) AS c FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '),
      |      x -> len(x) > 0)) AS tok
      |    FROM documents) t
      |  GROUP BY tok),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM tf)
      |SELECT c, COUNT(*) AS n_types,
      |  CAST(c * COUNT(*) AS DOUBLE) / ANY_VALUE(tot.tot)
      |    AS mass_share
      |FROM tf CROSS JOIN tot
      |GROUP BY c ORDER BY c""".stripMargin

  /** q291: greedy max-coverage source selection
    * ([[graft.operators.CoveragePlanner.greedySourceCoverage]]) —
    * the data-acquisition plan: the 5 sources that add the most NEW
    * 3-gram shingles, in pick order, with marginal gain and
    * cumulative coverage. The oracle unrolls all five greedy rounds
    * (anti-membership + argmax + covered-set union) exactly. */
  def q291SourceCoverage(s: SparkSession, d: String): DataFrame =
    graft.operators.CoveragePlanner.greedySourceCoverage(
        documents(s, d).select(col("text"), col("source")),
        "text", "source", shingleN = 3, picks = 5)
      .orderBy(col("round"))

  /** The greedy-coverage oracle CTE chain for `picks` rounds
    * (prs/tot/g_r/w_r/c_r) — shared by q291 and the composed q300. */
  private def coverageCtes(picks: Int): String = {
    val rounds = (1 to picks).map { r =>
      val cond = if (r == 1) "TRUE" else {
        val prevWs = (1 until r)
          .map(i => s"SELECT source FROM w$i").mkString(" UNION ALL ")
        s"""p.shingle NOT IN (SELECT shingle FROM c${r - 1})
          |      AND p.source NOT IN ($prevWs)""".stripMargin
      }
      val cover = if (r == 1)
        "SELECT DISTINCT shingle FROM prs JOIN w1 USING (source)"
      else
        s"""SELECT shingle FROM c${r - 1}
          |  UNION
          |  SELECT shingle FROM prs JOIN w$r USING (source)""".stripMargin
      s"""g$r AS (
        |  SELECT p.source, COUNT(*) AS gain FROM prs p
        |  WHERE $cond GROUP BY 1),
        |w$r AS MATERIALIZED (
        |  SELECT CAST($r AS BIGINT) AS round, source,
        |    CAST(gain AS BIGINT) AS gain
        |  FROM g$r ORDER BY gain DESC, source LIMIT 1),
        |c$r AS MATERIALIZED (
        |  $cover)""".stripMargin
    }.mkString(",\n")
    s"""prs AS MATERIALIZED (
      |  SELECT DISTINCT source, s AS shingle FROM (
      |    SELECT source, unnest(list_transform(
      |      generate_series(1, len(string_split(text, ' ')) - 2),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i + 1] || ' ' ||
      |           string_split(text, ' ')[i + 2])) AS s
      |    FROM documents
      |    WHERE len(string_split(text, ' ')) >= 3)),
      |tot AS (SELECT CAST(COUNT(DISTINCT shingle) AS BIGINT)
      |    AS total FROM prs),
      |$rounds""".stripMargin
  }

  /** Per-round final rows over [[coverageCtes]]. */
  private def coverageFinals(picks: Int): String =
    (1 to picks).map { r =>
      s"""SELECT w$r.round, w$r.source, w$r.gain,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c$r) AS cum_covered,
        |  CAST((SELECT COUNT(*) FROM c$r) AS DOUBLE) /
        |    CAST(tot.total AS DOUBLE) AS cum_frac
        |FROM w$r CROSS JOIN tot""".stripMargin
    }.mkString("\nUNION ALL\n")

  private val q291Oracle: String =
    s"""WITH ${coverageCtes(5)}
      |${coverageFinals(5)}
      |ORDER BY round""".stripMargin

  /** q300: the DATA-ACQUISITION DATASHEET — the session's composed
    * flagship: the top-3 greedy coverage picks (q291's device) drive
    * per-source Zipf slope fits (q288's device, grouped) through a
    * plain join — no driver branching anywhere; the hash match
    * proves the COMPOSITION end to end. Per picked source: pick
    * order, marginal new-shingle gain, cumulative coverage fraction,
    * and the source's rank–frequency health (slope ≈ −1, r²). */
  def q300AcquisitionDatasheet(s: SparkSession, d: String)
      : DataFrame = {
    val picks = graft.operators.CoveragePlanner.greedySourceCoverage(
      documents(s, d).select(col("text"), col("source")),
      "text", "source", shingleN = 3, picks = 3)
    val counts = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
    val fits = graft.operators.PowerLaw.zipfFitByGroup(counts,
      "source", "t", "c", topR = 50)
    picks.join(fits, Seq("source"))
      .select(col("round"), col("source"), col("gain"),
        col("cum_frac"), col("n_ranks"), col("slope"), col("r2"))
      .orderBy(col("round"))
  }

  private val q300Oracle: String =
    s"""WITH ${coverageCtes(3)},
      |wall AS (
      |  ${coverageFinals(3)}),
      |tokq AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |cq AS (SELECT source, t, COUNT(*) AS c FROM tokq
      |  GROUP BY 1, 2),
      |topq AS (
      |  SELECT source, t, c, ROW_NUMBER() OVER (PARTITION BY source
      |    ORDER BY c DESC, t) AS rank
      |  FROM cq),
      |ptsq AS (
      |  SELECT source,
      |    floor(ln(CAST(rank AS DOUBLE)) * 1e9) / 1e9 AS x,
      |    floor(ln(CAST(c AS DOUBLE)) * 1e9) / 1e9 AS y
      |  FROM topq WHERE rank <= 50),
      |stq AS (
      |  SELECT source, COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(floor(x * x * 1e9) / 1e9 AS DECIMAL(38,9)))
      |      AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(floor(x * y * 1e9) / 1e9 AS DECIMAL(38,9)))
      |      AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(floor(y * y * 1e9) / 1e9 AS DECIMAL(38,9)))
      |      AS DOUBLE) AS syy
      |  FROM ptsq GROUP BY source)
      |SELECT wall.round, wall.source, wall.gain, wall.cum_frac,
      |  CAST(stq.n AS BIGINT) AS n_ranks,
      |  (stq.n * stq.sxy - stq.sx * stq.sy) /
      |    (stq.n * stq.sxx - stq.sx * stq.sx) AS slope,
      |  ((stq.n * stq.sxy - stq.sx * stq.sy) *
      |    (stq.n * stq.sxy - stq.sx * stq.sy)) /
      |  ((stq.n * stq.sxx - stq.sx * stq.sx) *
      |    (stq.n * stq.syy - stq.sy * stq.sy)) AS r2
      |FROM wall JOIN stq ON wall.source = stq.source
      |ORDER BY wall.round""".stripMargin

  /** q322: fuzzy-blocking liveness diagnostic
    * ([[graft.operators.Dedup.fuzzyBlockingStats]]) over the part
    * catalog — the ops row published next to every q114/q239-class
    * entity-resolution job: the distinct-name universe, the
    * AutoDf-resolved stop-gram cap (q95 of per-name rarest-gram df,
    * floored at 1000 — r12), and the residual share that tells an
    * operator whether gram blocking is still live or silently
    * degenerating into length-key blocking. The oracle replays the
    * gram explosion, the per-gram df, the per-name min-df quantile,
    * the floor, and the two residual routes (short names ∪
    * every-gram-dropped names) — so the hash match value-checks the
    * cap-resolution machinery itself. */
  def q322BlockingStats(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup.fuzzyBlockingStats(part(s, d), "p_name")

  private val q322Oracle: String =
    """WITH names AS (
      |  SELECT DISTINCT p_name AS name FROM part
      |  WHERE p_name IS NOT NULL),
      |g0 AS (
      |  SELECT name, unnest(list_distinct(list_transform(
      |    generate_series(1, greatest(len(name) - 2, 1)),
      |    i -> substr(name, i, 3)))) AS g
      |  FROM names),
      |gdf AS (SELECT g, COUNT(*) AS df FROM g0 GROUP BY 1),
      |mindf AS (SELECT name, MIN(df) AS m
      |  FROM g0 JOIN gdf USING (g) GROUP BY 1),
      |nn AS (SELECT COUNT(*) AS n FROM names),
      |dm AS (SELECT m, COUNT(*) AS c FROM mindf GROUP BY 1),
      |cum AS (SELECT m, SUM(c) OVER (ORDER BY m
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
      |  FROM dm),
      |cap AS (
      |  SELECT GREATEST(1000, (SELECT MIN(m) FROM cum, nn
      |    WHERE cm >= CEIL(0.95 * n))) AS df_cap),
      |kept AS (
      |  SELECT DISTINCT g0.name FROM g0 JOIN gdf USING (g), cap
      |  WHERE gdf.df <= cap.df_cap),
      |resid AS (
      |  SELECT name FROM names WHERE len(name) < 9
      |  UNION ALL
      |  SELECT name FROM names WHERE len(name) >= 9
      |    AND name NOT IN (SELECT name FROM kept))
      |SELECT (SELECT COUNT(*) FROM names) AS n_names,
      |  CAST(cap.df_cap AS INT) AS df_cap,
      |  (SELECT COUNT(*) FROM resid) AS n_residual,
      |  CAST((SELECT COUNT(*) FROM resid) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM names) AS residual_share
      |FROM cap""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q322_blocking_stats" -> (q322BlockingStats _),
    "q228_freq_spectrum" -> (q228FreqSpectrum _),
    "q209_cdc_chunks" -> (q209CdcChunks _),
    "q219_distribution_drift" -> (q219DistributionDrift _),
    "q218_chunk_dedup_pairs" -> (q218ChunkDedupPairs _),
    "q213_quality_fusion" -> (q213QualityFusion _),
    "q214_sample_k_per_group" -> (q214SampleKPerGroup _),
    "q222_quality_curriculum" -> (q222QualityCurriculum _),
    "q215_jaccard_prefix_join" -> (q215JaccardPrefixJoin _),
    "q180_rouge_eval" -> (q180RougeEval _),
    "q181_cluster_keep_longest" -> (q181ClusterKeepLongest _),
    "q182_blocklist" -> (q182Blocklist _),
    "q183_length_quantiles" -> (q183LengthQuantiles _),
    "q184_curriculum" -> (q184Curriculum _),
    "q185_pmi_collocations" -> (q185PmiCollocations _),
    "q187_langid_confusion" -> (q187LangidConfusion _),
    "q158_domain_cap" -> (q158DomainCap _),
    "q231_html_main_content" -> (q231HtmlMainContent _),
    "q232_outlink_graph" -> (q232OutlinkGraph _),
    "q233_url_canonical_dedup" -> (q233UrlCanonicalDedup _),
    "q236_html_meta" -> (q236HtmlMeta _),
    "q237_canonical_preferred_dedup" -> (q237CanonicalPreferredDedup _),
    "q238_anchor_text" -> (q238AnchorText _),
    "q239_fuzzy_name_join" -> (q239FuzzyNameJoin _),
    "q240_content_type" -> (q240ContentType _),
    "q241_robots_gate" -> (q241RobotsGate _),
    "q242_web_curation_build" -> (q242WebCurationBuild _),
    "q243_crawl_datasheet" -> (q243CrawlDatasheet _),
    "q244_html_tables" -> (q244HtmlTables _),
    "q245_entity_clusters" -> (q245EntityClusters _),
    "q246_line_corrections" -> (q246LineCorrections _),
    "q247_refined_build" -> (q247RefinedBuild _),
    "q248_license_tags" -> (q248LicenseTags _),
    "q249_notebook_script" -> (q249NotebookScript _),
    "q250_code_corpus_build" -> (q250CodeCorpusBuild _),
    "q251_diff_stats" -> (q251DiffStats _),
    "q252_function_chunks" -> (q252FunctionChunks _),
    "q253_import_stats" -> (q253ImportStats _),
    "q254_markdown_links" -> (q254MarkdownLinks _),
    "q255_import_cooccurrence" -> (q255ImportCooccurrence _),
    "q256_identifier_subtokens" -> (q256IdentifierSubtokens _),
    "q257_comment_stats" -> (q257CommentStats _),
    "q258_linearize_tables" -> (q258LinearizeTables _),
    "q259_vocab_coverage" -> (q259VocabCoverage _),
    "q261_code_datasheet" -> (q261CodeDatasheet _),
    "q262_sentences" -> (q262Sentences _),
    "q263_vocab_growth" -> (q263VocabGrowth _),
    "q289_heaps_fit" -> (q289HeapsFit _),
    "q291_source_coverage" -> (q291SourceCoverage _),
    "q300_acquisition_datasheet" -> (q300AcquisitionDatasheet _),
    "q266_serving_manifest" -> (q266ServingManifest _),
    "q267_source_overlap" -> (q267SourceOverlap _),
    "q268_script_mix" -> (q268ScriptMix _),
    "q269_dedup_savings" -> (q269DedupSavings _),
    "q189_readability" -> (q189Readability _),
    "q199_badwords_filter" -> (q199BadwordsFilter _),
    "q201_skipgram_negatives" -> (q201SkipgramNegatives _),
    "q202_span_corruption" -> (q202SpanCorruption _),
  )

  val oracle: Map[String, String] = Map(
    "q158_domain_cap" -> q158Oracle,
    "q231_html_main_content" -> q231Oracle,
    "q232_outlink_graph" -> q232Oracle,
    "q233_url_canonical_dedup" -> q233Oracle,
    "q236_html_meta" -> q236Oracle,
    "q237_canonical_preferred_dedup" -> q237Oracle,
    "q238_anchor_text" -> q238Oracle,
    "q239_fuzzy_name_join" -> q239Oracle,
    "q322_blocking_stats" -> q322Oracle,
    "q240_content_type" -> q240Oracle,
    "q241_robots_gate" -> q241Oracle,
    "q242_web_curation_build" -> q242Oracle,
    "q243_crawl_datasheet" -> q243Oracle,
    "q244_html_tables" -> q244Oracle,
    "q245_entity_clusters" -> q245Oracle,
    "q246_line_corrections" -> q246Oracle,
    "q247_refined_build" -> q247Oracle,
    "q248_license_tags" -> q248Oracle,
    "q249_notebook_script" -> q249Oracle,
    "q250_code_corpus_build" -> q250Oracle,
    "q251_diff_stats" -> q251Oracle,
    "q252_function_chunks" -> q252Oracle,
    "q253_import_stats" -> q253Oracle,
    "q254_markdown_links" -> q254Oracle,
    "q255_import_cooccurrence" -> q255Oracle,
    "q256_identifier_subtokens" -> q256Oracle,
    "q257_comment_stats" -> q257Oracle,
    "q258_linearize_tables" -> q258Oracle,
    "q259_vocab_coverage" -> q259Oracle,
    "q261_code_datasheet" -> q261Oracle,
    "q262_sentences" -> q262Oracle,
    "q263_vocab_growth" -> q263Oracle,
    "q289_heaps_fit" -> q289Oracle,
    "q291_source_coverage" -> q291Oracle,
    "q300_acquisition_datasheet" -> q300Oracle,
    "q266_serving_manifest" -> q266Oracle,
    "q267_source_overlap" -> q267Oracle,
    "q268_script_mix" -> q268Oracle,
    "q269_dedup_savings" -> q269Oracle,
    "q209_cdc_chunks" -> q209Oracle,
    "q228_freq_spectrum" -> q228Oracle,
    "q219_distribution_drift" -> q219Oracle,
    "q218_chunk_dedup_pairs" -> q218Oracle,
    "q213_quality_fusion" -> q213Oracle,
    "q214_sample_k_per_group" -> q214Oracle,
    "q222_quality_curriculum" -> q222Oracle,
    "q215_jaccard_prefix_join" -> q215Oracle,
    "q180_rouge_eval" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    (regexp_split_to_array(trim(text), '\s+'))[1:30] AS ct,
        |    regexp_split_to_array(trim(text), '\s+') AS rt
        |  FROM documents),
        |cg AS (SELECT doc_id, n, array_to_string(ct[i:i+n-1], chr(1))
        |    AS g
        |  FROM tok, range(1, 3) rn(n),
        |    LATERAL unnest(generate_series(1, len(ct) - n + 1))
        |      AS gi(i)),
        |rg AS (SELECT doc_id, n, array_to_string(rt[i:i+n-1], chr(1))
        |    AS g
        |  FROM tok, range(1, 3) rn(n),
        |    LATERAL unnest(generate_series(1, len(rt) - n + 1))
        |      AS gi(i)),
        |cc AS (SELECT doc_id, n, g, COUNT(*) AS c
        |  FROM cg GROUP BY 1, 2, 3),
        |rc AS (SELECT doc_id, n, g, COUNT(*) AS r
        |  FROM rg GROUP BY 1, 2, 3),
        |mm AS (SELECT cc.doc_id, cc.n,
        |    CAST(SUM(LEAST(cc.c, rc.r)) AS BIGINT) AS m
        |  FROM cc JOIN rc ON rc.doc_id = cc.doc_id
        |    AND rc.n = cc.n AND rc.g = cc.g
        |  GROUP BY 1, 2),
        |stats AS (
        |  SELECT tok.doc_id, rn.n,
        |    GREATEST(len(tok.ct) - rn.n + 1, 0) AS c,
        |    GREATEST(len(tok.rt) - rn.n + 1, 0) AS r,
        |    COALESCE(mm.m, 0) AS m
        |  FROM tok CROSS JOIN range(1, 3) rn(n)
        |  LEFT JOIN mm ON mm.doc_id = tok.doc_id AND mm.n = rn.n),
        |wide AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN n = 1 THEN m END) AS m1,
        |    MAX(CASE WHEN n = 1 THEN c END) AS c1,
        |    MAX(CASE WHEN n = 1 THEN r END) AS r1,
        |    MAX(CASE WHEN n = 2 THEN m END) AS m2,
        |    MAX(CASE WHEN n = 2 THEN c END) AS c2,
        |    MAX(CASE WHEN n = 2 THEN r END) AS r2
        |  FROM stats GROUP BY doc_id),
        |pr AS (
        |  SELECT doc_id, m1, c1, r1, m2, c2, r2,
        |    CASE WHEN c1 > 0 THEN CAST(m1 AS DOUBLE) / c1 END AS p1,
        |    CASE WHEN r1 > 0 THEN CAST(m1 AS DOUBLE) / r1 END AS rec1,
        |    CASE WHEN c2 > 0 THEN CAST(m2 AS DOUBLE) / c2 END AS p2,
        |    CASE WHEN r2 > 0 THEN CAST(m2 AS DOUBLE) / r2 END AS rec2
        |  FROM wide)
        |SELECT doc_id, m1, c1, r1, p1, rec1,
        |  CASE WHEN p1 + rec1 > 0
        |    THEN 2.0 * p1 * rec1 / (p1 + rec1) END AS f1,
        |  m2, c2, r2, p2, rec2,
        |  CASE WHEN p2 + rec2 > 0
        |    THEN 2.0 * p2 * rec2 / (p2 + rec2) END AS f2
        |FROM pr ORDER BY doc_id""".stripMargin,
    "q181_cluster_keep_longest" ->
      s"""WITH RECURSIVE ${TextQueries.NearDupCtes},
        |cl AS (
        |  SELECT d.doc_id, d.n_chars,
        |    LEAST(d.doc_id, COALESCE(c.mn, d.doc_id)) AS cluster
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |rk AS (
        |  SELECT doc_id, cluster, n_chars,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM cl)
        |SELECT doc_id, cluster, n_chars FROM rk
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q182_blocklist" ->
      """SELECT lang, COUNT(*) AS kept_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |FROM documents
        |WHERE source NOT IN ('src3', 'src7', 'src11', 'src15')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q183_length_quantiles" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT) AS tl
        |  FROM documents)
        |SELECT lang, COUNT(*) AS n,
        |  quantile_cont(tl, 0.25) AS p25,
        |  quantile_cont(tl, 0.5) AS p50,
        |  quantile_cont(tl, 0.75) AS p75,
        |  quantile_cont(tl, 0.875) AS p875
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "q189_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
        |      AS BIGINT) AS words,
        |    GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT)) AS sentences,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS BIGINT) AS syllables
        |  FROM documents)
        |SELECT doc_id, words, sentences, syllables,
        |  CASE WHEN words > 0 THEN
        |    floor((CAST(206.835 AS DOUBLE) -
        |      CAST(1.015 AS DOUBLE) *
        |        (CAST(words AS DOUBLE) / sentences) -
        |      CAST(84.6 AS DOUBLE) *
        |        (CAST(syllables AS DOUBLE) / words)) * 1e9) / 1e9
        |  END AS flesch
        |FROM c ORDER BY doc_id""".stripMargin,
    "q187_langid_confusion" ->
      """WITH p AS (
        |  SELECT doc_id, lang, ' ' || text || ' ' AS t
        |  FROM documents),
        |scores AS (
        |  SELECT doc_id, lang, g.guess,
        |    CAST(CASE g.guess
        |      WHEN 'en' THEN
        |        (len(t) - len(replace(t, ' the ', ''))) / 5 +
        |        (len(t) - len(replace(t, ' and ', ''))) / 5 +
        |        (len(t) - len(replace(t, ' of ', ''))) / 4 +
        |        (len(t) - len(replace(t, ' is ', ''))) / 4
        |      WHEN 'es' THEN
        |        (len(t) - len(replace(t, ' el ', ''))) / 4 +
        |        (len(t) - len(replace(t, ' la ', ''))) / 4 +
        |        (len(t) - len(replace(t, ' de ', ''))) / 4 +
        |        (len(t) - len(replace(t, ' que ', ''))) / 5
        |      WHEN 'de' THEN
        |        (len(t) - len(replace(t, ' der ', ''))) / 5 +
        |        (len(t) - len(replace(t, ' und ', ''))) / 5 +
        |        (len(t) - len(replace(t, ' die ', ''))) / 5 +
        |        (len(t) - len(replace(t, ' ist ', ''))) / 5
        |      WHEN 'fr' THEN
        |        (len(t) - len(replace(t, ' le ', ''))) / 4 +
        |        (len(t) - len(replace(t, ' la ', ''))) / 4 +
        |        (len(t) - len(replace(t, ' et ', ''))) / 4 +
        |        (len(t) - len(replace(t, ' est ', ''))) / 5
        |    END AS INT) AS score
        |  FROM p, (VALUES ('en'), ('es'), ('de'), ('fr'))
        |    AS g(guess)),
        |pick AS (
        |  SELECT doc_id, lang, guess,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, guess DESC) AS rn
        |  FROM scores)
        |SELECT lang, guess, COUNT(*) AS n FROM pick
        |WHERE rn = 1 GROUP BY lang, guess
        |ORDER BY lang, guess""".stripMargin,
    "q185_pmi_collocations" ->
      """WITH tk AS (
        |  SELECT list_filter(regexp_split_to_array(trim(text), ' +'),
        |    t -> len(t) > 0) AS tks
        |  FROM documents),
        |uni AS (SELECT unnest(tks) AS w FROM tk),
        |uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        |n AS (SELECT COUNT(*) AS nn FROM uni),
        |bi AS (SELECT tks[i] AS a, tks[i+1] AS b
        |  FROM tk, LATERAL unnest(generate_series(1, len(tks) - 1))
        |    AS g(i)
        |  WHERE len(tks) >= 2),
        |bc AS (SELECT a, b, COUNT(*) AS cab FROM bi GROUP BY a, b),
        |nb AS (SELECT COUNT(*) AS nbb FROM bi)
        |SELECT s.a, s.b, s.cab, ua.c AS ca, ub.c AS cb,
        |  floor(ln((CAST(s.cab AS DOUBLE) * nn * nn) /
        |    (CAST(nbb AS DOUBLE) * ua.c * ub.c)) * 1e9) / 1e9 AS pmi
        |FROM bc s
        |JOIN uc ua ON ua.w = s.a
        |JOIN uc ub ON ub.w = s.b
        |CROSS JOIN n CROSS JOIN nb
        |WHERE s.cab >= 5
        |ORDER BY pmi DESC, a, b LIMIT 30""".stripMargin,
    "q184_curriculum" ->
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rnk,
        |    ntile(5) OVER (ORDER BY n_chars, doc_id) AS bucket
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_chars, rnk, bucket,
        |    row_number() OVER (PARTITION BY bucket ORDER BY rnk)
        |      AS pos
        |  FROM t)
        |SELECT doc_id, n_chars, rnk, bucket, pos,
        |  row_number() OVER (ORDER BY pos, bucket) AS training_pos
        |FROM p ORDER BY training_pos""".stripMargin,
    "q199_badwords_filter" -> q199Oracle,
    "q201_skipgram_negatives" -> q201Oracle,
    "q202_span_corruption" -> q202Oracle,
  )
}
