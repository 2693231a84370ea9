package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** [[Corpus]] — curation operators pinned against the reference
  * window-function semantics they replace: globalRank vs a
  * single-partition row_number, curriculumInterleave vs the real
  * ntile + interleave windows, exactQuantiles vs Spark's exact
  * percentile, and the blocklist join's broadcast-anti plan shape. */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("globalRank equals the single-partition window row_number " +
      "under any input partitioning") {
    val df = (1 to 500).map(i => (((i * 7919) % 271).toLong, i.toLong))
      .toDF("score", "id")
    val expected = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("score"), col("id")))
          .cast("long"))
      .collect().map(_.toSeq).toSet
    val got = Corpus.globalRank(df.repartition(13),
        Seq(col("score"), col("id")))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
  }

  test("quantileCalibrate maps within-source ranks onto the global " +
      "distribution and fills empty buckets from the left") {
    // source a: scores 1..4 ; source b: scores 101..104.
    // Calibrated values must come from the GLOBAL distribution, and
    // equal ranks across sources must calibrate identically.
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L),
      (5L, "b", 101L), (6L, "b", 102L), (7L, "b", 103L), (8L, "b", 104L)
    ).toDF("id", "src", "sc")
    val out = Corpus.quantileCalibrate(df, "id", "src", "sc", buckets = 4)
      .select("id", "src", "src_pct", "bucket", "calibrated")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    // within-source pcts: 0, 1/3, 2/3, 1 -> buckets 0,1,2,3
    assert(out.map(_._4).toSeq === Seq(0L, 1L, 2L, 3L, 0L, 1L, 2L, 3L))
    // same rank in a and b -> identical calibrated value
    for (i <- 0 until 4)
      assert(out(i)._5 === out(i + 4)._5, s"rank $i")
    // calibrated values are global bucket maxima: global pcts are
    // k/7 for k=0..7 -> buckets 0,0,1,1,2,2,3,3 over sorted scores
    // 1,2,3,4,101,102,103,104 -> maxima 2,4,102,104
    assert(out.take(4).map(_._5).toSeq === Seq(2L, 4L, 102L, 104L))
    // partition invariance
    val again = Corpus.quantileCalibrate(df.repartition(5), "id",
        "src", "sc", buckets = 4)
      .select("id", "calibrated").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(again === out.map(t => (t._1, t._5)).toSeq)
  }

  test("quantileCalibrate fills globally-empty buckets from the " +
      "previous bucket") {
    // 5 global rows over 10 buckets -> global pcts 0,.25,.5,.75,1
    // land in buckets 0,2,5,7,9; buckets 1,3,4,6,8 are EMPTY.
    // Source a has 4 rows -> within-source pcts 0,1/3,2/3,1 ->
    // buckets 0,3,6,9: rows 2 and 3 look up empty buckets and must
    // inherit the previous filled bucket's max (2 and 3).
    val df = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L), (4L, "a", 4L),
      (5L, "b", 100L)).toDF("id", "src", "sc")
    val out = Corpus.quantileCalibrate(df, "id", "src", "sc",
        buckets = 10)
      .select("id", "bucket", "calibrated").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set(
      (1L, 0L, 1L), (2L, 3L, 2L), (3L, 6L, 3L), (4L, 9L, 100L),
      (5L, 0L, 1L)))
  }

  test("curriculumInterleave closed-form arithmetic matches the " +
      "window replay across ragged n / k combinations") {
    for (n <- Seq(3, 17, 101); k <- Seq(1, 4, 5)) {
      val df = (1 to n).map(i => (i.toLong, ((i * 31) % 47).toLong))
        .toDF("id", "score")
      val w = Window.orderBy(col("score"), col("id"))
      val expected = df
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("bucket", ntile(k).over(w).cast("long"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("bucket")).orderBy(col("rnk")))
          .cast("long"))
        .withColumn("training_pos", row_number().over(
          Window.orderBy(col("pos"), col("bucket"))).cast("long"))
        .select("id", "rnk", "bucket", "pos", "training_pos")
        .collect().map(_.toSeq).toSet
      val got = Corpus.curriculumInterleave(df, "score", "id", k)
        .select("id", "rnk", "bucket", "pos", "training_pos")
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"n=$n k=$k")
    }
  }

  test("curriculumInterleave order is a bijection onto 1..n that " +
      "cycles all buckets in every difficulty window") {
    val df = (1 to 23).map(i => (i.toLong, i.toLong))
      .toDF("id", "score")
    val rows = Corpus.curriculumInterleave(df, "score", "id", 5)
      .orderBy("training_pos").collect()
    assert(rows.map(_.getAs[Long]("training_pos")).toSeq ===
      (1L to 23L))
    assert(rows.take(5).map(_.getAs[Long]("bucket")).toSet ===
      Set(1L, 2L, 3L, 4L, 5L))
  }

  test("exactQuantiles (histogram form) equals Spark's exact " +
      "percentile") {
    val df = (1 to 400).map(i =>
      (s"g${i % 3}", ((i * 97) % 53 + 1).toLong)).toDF("g", "v")
    val got = Corpus.exactQuantiles(df, "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
          "p875" -> 0.875))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Seq(r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))))).toMap
    val expected = df.groupBy("g").agg(count(lit(1)).as("n"),
        expr("percentile(v, array(cast(0.25 as double), " +
          "cast(0.5 as double), cast(0.75 as double), " +
          "cast(0.875 as double)))").as("qs"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(got.keySet === expected.keySet)
    for ((g, (n, qs)) <- expected) {
      assert(got(g)._1 === n, s"n for $g")
      assert(got(g)._2 === qs, s"quantiles for $g")
    }
  }

  test("pmiCollocations: hand-worked PMI values, min-count floor, " +
      "and collocation-over-chance ordering") {
    val docs = (Seq.fill(8)("alpha beta") ++ Seq.fill(8)("gamma delta")
      ++ Seq.fill(4)("alpha delta")).toDF("text")
    // unigrams: alpha 12, beta 8, gamma 8, delta 12 (N = 40);
    // bigrams: (alpha,beta) 8, (gamma,delta) 8, (alpha,delta) 4
    // (Nb = 20)
    val rows = Corpus.pmiCollocations(docs, "text", minCount = 4,
      k = 10).collect()
    def f9(v: Double) = math.floor(v * 1e9) / 1e9
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))).toMap
    assert(byPair(("alpha", "beta")) ===
      ((8L, 12L, 8L, f9(math.log(8.0 * 40 * 40 / (20.0 * 12 * 8))))))
    assert(byPair(("alpha", "delta")) ===
      ((4L, 12L, 12L, f9(math.log(4.0 * 40 * 40 / (20.0 * 12 * 12))))))
    // the two always-adjacent pairs outrank the split pair; a<g
    // tie-break puts alpha-beta first
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("alpha", "beta"), ("gamma", "delta"), ("alpha", "delta")))
  }

  test("pmiCollocations: hapax pairs are excluded by the min-count " +
      "floor") {
    val docs = (Seq.fill(6)("x y") ++ Seq("rare pair"))
      .toDF("text")
    val pairs = Corpus.pmiCollocations(docs, "text", minCount = 2,
        k = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("x", "y")))
  }

  test("readabilityStats: hand-worked counts and Flesch score") {
    val df = Seq(
      (1L, "The cat sat. The dog ran!"),
      (2L, "zzz")).toDF("doc_id", "text")
    val out = Corpus.readabilityStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("words") === 6L)
    assert(r1.getAs[Long]("sentences") === 2L)
    assert(r1.getAs[Long]("syllables") === 6L)
    val expected = math.floor(
      (206.835 - 1.015 * (6.0 / 2) - 84.6 * (6.0 / 6)) * 1e9) / 1e9
    assert(r1.getAs[Double]("flesch") === expected)
    // no sentence punctuation → floor at 1; no vowels → 0 syllables
    val r2 = out(1)
    assert(r2.getAs[Long]("sentences") === 1L)
    assert(r2.getAs[Long]("syllables") === 0L)
  }

  test("blocklistFilter drops exactly the blocked keys via a " +
      "broadcast left-anti join") {
    val df = (1 to 100).map(i => (i.toLong, s"src${i % 10}"))
      .toDF("id", "source")
    val blocked = Seq("src1", "src3").toDF("s")
    val out = Corpus.blocklistFilter(df, "source", blocked)
    assert(out.count() === 80)
    assert(out.filter(col("source").isin("src1", "src3")).count()
      === 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan)
  }

  test("badwordsFilter drops docs containing a blocked token " +
      "(case-insensitive, token-exact), keeps substring look-alikes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "this has BadWord inside"),
      (3L, "badwordish is not a match"), // substring, not a token
      (4L, "ends with badword")).toDF("doc_id", "text")
    val bad = Seq("badword").toDF("word")
    val kept = Corpus.badwordsFilter(docs, "doc_id", "text", bad)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
    // blocklist side broadcasts; the doc side never shuffles tokens
    val plan = Corpus.badwordsFilter(docs, "doc_id", "text", bad)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("distributionDrift: identical distributions give ~zero " +
      "divergence, disjoint vocabularies give large; js is " +
      "symmetric and bounded by ln 2") {
    import spark.implicits._
    def drift(docs: Seq[(Boolean, String)]) =
      Corpus.distributionDrift(docs.toDF("a", "text"), "text",
        col("a")).head()
    val same = drift(Seq(
      (true, "x y z x y"), (false, "x y z x y"),
      (true, "x y z x y"), (false, "x y z x y")))
    assert(math.abs(same.getDouble(3)) < 1e-6, s"kl_ab ${same}")
    assert(math.abs(same.getDouble(5)) < 1e-6)
    // counts large enough that add-one smoothing stops dominating
    val sideA = ("aa bb cc aa bb aa " * 40).trim
    val sideB = ("dd ee ff dd ee dd " * 40).trim
    val far = drift(Seq((true, sideA), (false, sideB)))
    assert(far.getDouble(5) > 0.5, s"js ${far.getDouble(5)}")
    assert(far.getDouble(5) <= math.log(2.0) + 1e-9)
    // symmetry of js under slice swap
    val swapped = drift(Seq((false, sideA), (true, sideB)))
    assert(math.abs(far.getDouble(5) - swapped.getDouble(5)) < 1e-12)
    // kl directions swap
    assert(math.abs(far.getDouble(3) - swapped.getDouble(4)) < 1e-12)
    // an empty side is signaled, not silently compared against pure
    // smoothing mass: the KL/JS columns come back NULL
    val oneSided = Corpus.distributionDrift(
      Seq((true, "x y z")).toDF("a", "text"), "text", col("a")).head()
    assert(oneSided.getLong(2) === 0L) // tokens_b
    assert(oneSided.isNullAt(3) && oneSided.isNullAt(4) &&
      oneSided.isNullAt(5))
  }

  test("urlHost strips scheme/userinfo/port/path/trailing dot and " +
      "lowercases; no scheme://host shape -> null") {
    val got = Seq(
      "https://News.BBC.co.uk/p/1?q=2#f",
      "http://user:pw@example.com:8080/x",
      "ftp://host.example.org.",
      "not a url", "relative/path", "mailto:a@b.c")
      .toDF("url").select(Corpus.urlHost(col("url")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(Some("news.bbc.co.uk"),
      Some("example.com"), Some("host.example.org"), None, None,
      None))
  }

  test("registrableDomains: longest-suffix wins, PSL default rule " +
      "applies, a bare public suffix has no registrable domain, and " +
      "unparseable URLs pass through with nulls") {
    val psl = Seq("com", "uk", "co.uk", "github.io", "io")
      .toDF("suffix")
    val urls = Seq(
      (1L, "https://news.bbc.co.uk/x"),   // co.uk beats uk
      (2L, "https://bbc.co.uk"),          // etld1 == host
      (3L, "https://co.uk"),              // bare suffix -> null etld1
      (4L, "https://docs.github.io"),     // github.io beats io
      (5L, "https://weird.internal/y"),   // no rule -> last label
      (6L, "://broken")                   // no host -> all null
    ).toDF("id", "url")
    val out = Corpus.registrableDomains(urls, "url", psl)
      .select("id", "host", "public_suffix", "etld1")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), Option(r.getString(3))))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, Some("news.bbc.co.uk"), Some("co.uk"),
        Some("bbc.co.uk")),
      (2L, Some("bbc.co.uk"), Some("co.uk"), Some("bbc.co.uk")),
      (3L, Some("co.uk"), Some("co.uk"), None),
      (4L, Some("docs.github.io"), Some("github.io"),
        Some("docs.github.io")),
      (5L, Some("weird.internal"), Some("internal"),
        Some("weird.internal")),
      (6L, None, None, None)))
  }

  test("canonicalizeUrl: case/port/fragment/tracking-param/param-" +
      "order normalization, non-default port kept, no-scheme null") {
    val got = Seq(
      "HTTPS://WWW.Example.COM/a/1?b=2&a=1",
      "https://www.example.com:443/a/1?a=1&utm_source=f&b=2#frag",
      "https://www.example.com/a/1?utm_campaign=x&b=2&a=1&gclid=9",
      "http://u:p@Other.net:8080/p/2?ref=rss",
      "http://host.example.org.:80",
      "https://keep.net:8443/x?z=1&y=2",
      "relative/only")
      .toDF("url").select(Corpus.canonicalizeUrl(col("url")))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === Seq(
      Some("https://www.example.com/a/1?a=1&b=2"),
      Some("https://www.example.com/a/1?a=1&b=2"),
      Some("https://www.example.com/a/1?a=1&b=2"),
      Some("http://other.net:8080/p/2"),
      Some("http://host.example.org/"),
      Some("https://keep.net:8443/x?y=2&z=1"),
      None))
  }

  test("contentTypeSignals routes indented/brace code, TeX math, " +
      "and prose; signals are exact ratios") {
    val df = Seq(
      (1L, "def f():\n  x = g(1)\n  return x;"),
      (2L, "Let $x$ be \\sum_i x_i^2 of the set"),
      (3L, "plain words about plain things here"))
      .toDF("id", "text")
    val out = Corpus.contentTypeSignals(df, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out === Map(1L -> "code", 2L -> "math", 3L -> "prose"))
    // empty text: null densities, prose route (NOT code — a raw NaN
    // ratio would satisfy NaN > cut under Spark's NaN ordering)
    val e = Corpus.contentTypeSignals(
      Seq((9L, "")).toDF("id", "text"), "id", "text").head
    assert(e.isNullAt(1) && e.isNullAt(2) && e.isNullAt(3) &&
      e.getString(4) === "prose")
  }

  test("vocabCoverage: top-K by (count desc, token asc), per-doc " +
      "OOV counters, token-less docs keep a zero row w/ NULL rate") {
    val docs = Seq((1L, "a a b c"), (2L, "A d"), (3L, ""))
      .toDF("id", "text")
    val out = Corpus.vocabCoverage(docs, "id", "text", vocabSize = 2)
      .orderBy("id").collect()
    // counts: a=3 (case-folded), b=1, c=1, d=1 -> vocab {a, b}
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getLong(4), r1.getDouble(5)) === (4L, 1L, 3L, 1L, 0.25))
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3),
      r2.getLong(4), r2.getDouble(5)) === (2L, 1L, 2L, 1L, 0.5))
    val r3 = out(2) // empty text: zero counters, no 0/0 rate
    assert((r3.getLong(1), r3.getLong(2), r3.getLong(3),
      r3.getLong(4)) === (0L, 0L, 0L, 0L) && r3.isNullAt(5))
  }

  test("scriptMix: per-family ratios, mixed-script spoofing " +
      "flagged, digits-only and empty docs have no dominant") {
    val out = Corpus.scriptMix(Seq(
      (1L, "pаypаl site"),  // 2 cyrillic 'а' among latin
      (2L, "Ωμέγα κείμενο"),
      (3L, "12345"),
      (4L, "")).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L) // 11 chars: 8 latin, 2 cyrillic, 1 space
    assert(r1.getDouble(1) === 8.0 / 11.0 &&
      r1.getDouble(2) === 2.0 / 11.0)
    assert(r1.getString(7) === "latin" && r1.getLong(8) === 2L &&
      r1.getBoolean(9), "spoofing-shaped doc must flag mixed")
    val r2 = out(2L)
    assert(r2.getString(7) === "greek" && !r2.getBoolean(9))
    val r3 = out(3L) // digits only: ratios 0, no dominant
    assert(r3.getDouble(6) === 1.0 && r3.isNullAt(7) &&
      r3.getLong(8) === 0L)
    val r4 = out(4L) // empty: all NULL
    assert(r4.isNullAt(1) && r4.isNullAt(7) && !r4.getBoolean(9))
  }

  test("sentences: terminator runs bind to their sentence, " +
      "unterminated tail kept, terminator-only and empty docs " +
      "yield nothing, ids contiguous after trims") {
    val out = Corpus.sentences(Seq(
      (1L, "One. Two!! Three? tail no dot"),
      (2L, "..."), (3L, ""), (4L, "  spaced.   out  "))
      .toDF("id", "text"), "id", "text")
      .orderBy("id", "sent_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2)))
    assert(out.toSeq === Seq(
      (1L, 0L, "One."), (1L, 1L, "Two!!"), (1L, 2L, "Three?"),
      (1L, 3L, "tail no dot"),
      (4L, 0L, "spaced."), (4L, 1L, "out")))
  }

  test("vocabGrowth: monotone types/tokens, exact counts at every " +
      "prefix, ragged final checkpoint lands on n") {
    // 4 docs in id order; vocab introduced: d1 {a b}, d2 {a c},
    // d3 {d}, d4 {} (empty)
    val docs = Seq((10L, "a b"), (20L, "a c a"), (30L, "d"),
      (40L, "")).toDF("id", "text")
    val out = Corpus.vocabGrowth(docs, "id", "text",
        checkpoints = 4)
      .orderBy("checkpoint")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 2L),  // after d1: 2 tokens, {a,b}
      (2L, 2L, 5L, 3L),  // +d2: 5 tokens, {a,b,c}
      (3L, 3L, 6L, 4L),  // +d3
      (4L, 4L, 6L, 4L))) // +empty d4: unchanged
    // more checkpoints than docs: zero-cutoff prefixes still report
    // their (zeroed) rows — all K rows present, the 1..K contract
    val wide = Corpus.vocabGrowth(docs, "id", "text",
        checkpoints = 8)
      .orderBy("checkpoint").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(wide.length === 8)
    assert(wide(0) === ((1L, 0L, 0L, 0L)), s"got ${wide.toSeq}")
    assert(wide(7) === ((8L, 4L, 6L, 4L)))
  }

  test("vocabCoverage / vocabGrowth are partition-invariant (the " +
      "rank and first-occurrence logic cannot depend on layout)") {
    val docs = (1L to 60L).map(i =>
      (i, (0L to i % 7).map(j => s"w${(i * j) % 11}").mkString(" ")))
      .toDF("id", "text")
    def cov(df: org.apache.spark.sql.DataFrame) =
      Corpus.vocabCoverage(df, "id", "text", vocabSize = 5)
        .orderBy("id").collect().toSeq
    def gro(df: org.apache.spark.sql.DataFrame) =
      Corpus.vocabGrowth(df, "id", "text", checkpoints = 6)
        .orderBy("checkpoint").collect().toSeq
    assert(cov(docs) === cov(docs.repartition(7)))
    assert(gro(docs) === gro(docs.repartition(7)))
  }

  test("robotsGate: longest match wins, Allow beats Disallow on " +
      "ties, empty Disallow is no rule, unknown host allowed") {
    val rules = Corpus.robotsRules(Seq(
      ("a.com", "User-agent: *\ndisallow: /p # lowercase+comment\n" +
        "Allow: /p/ok\nDISALLOW: /p/ok"),  // tie at /p/ok -> allow
      ("b.net", "User-agent: *\nDisallow:"))
      .toDF("host", "txt"), "host", "txt")
    val urls = Seq(
      (1L, "https://a.com/p/x"),      // /p disallow -> blocked
      (2L, "https://a.com/p/ok/y"),   // tie -> allowed
      (3L, "https://a.com/q"),        // no match -> allowed
      (4L, "https://b.net/p"),        // empty disallow -> allowed
      (5L, "https://nowhere.org/z")   // no rules at all -> allowed
    ).toDF("id", "url")
    val got = Corpus.robotsGate(urls, "url", rules)
      .select("id", "allowed")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true,
      4L -> true, 5L -> true))
    // row-preserving: duplicate frontier rows each keep a verdict
    val dup = Corpus.robotsGate(
      Seq((1L, "https://a.com/p/x"), (1L, "https://a.com/p/x"),
        (2L, "garbage no scheme")).toDF("id", "url"),
      "url", rules)
    assert(dup.count() === 3L)
    assert(dup.filter(col("allowed")).count() === 1L) // the garbage row
  }

  test("lineCorrections: uppercase nav / numeric / counter / short " +
      "lines drop, prose survives in order, all-junk doc is gated") {
    val df = Seq(
      (1L, "HOME ABOUT US\nthe first good prose line of the page " +
        "carries real content\n42\n7 likes\n" +
        "the second good prose line of the page also carries some"),
      (2L, "12.5%\nNAV BAR\nok"))
      .toDF("id", "text")
    val out = Corpus.lineCorrections(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(5),
          r.getString(4))).toMap
    assert(out(1L)._1 === 5L && out(1L)._2 === 2L)
    assert(out(1L)._3 === true)
    assert(out(1L)._4 ===
      "the first good prose line of the page carries real content\n" +
      "the second good prose line of the page also carries some")
    assert(out(2L) === ((3L, 0L, false, "")))
    // zero-char doc: ratio NULL, gate false (NOT NaN >= cut -> true)
    val z = Corpus.lineCorrections(
      Seq((9L, "\n\n")).toDF("id", "text"), "id", "text").head
    assert(z.isNullAt(3) && z.getBoolean(5) === false)
  }

  test("rrfFusion: a doc ranked first everywhere gets the max " +
      "possible fused score; null scores rank last; ties break on " +
      "id") {
    val scored = Seq(
      (1L, 0.9, 0.9),               // best on both
      (2L, 0.5, 0.5),
      (3L, 0.5, 0.1),               // ties doc 2 on a -> id order
      (4L, Double.NaN, 0.0)).toDF("id", "a", "b")
      .withColumn("a", when(col("id") === 4L, lit(null))
        .otherwise(col("a")))
    val out = Corpus.rrfFusion(scored, "id", Seq("a", "b"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((1L, 1L, 1.0 / 61 + 1.0 / 61)))
    assert(out(2L)._1 === 2L && out(3L)._1 === 3L) // id tie-break
    assert(out(4L)._1 === 4L)                      // null ranks last
    // fused respects rank dominance
    assert(out(1L)._3 > out(2L)._3 && out(2L)._3 > out(4L)._3)
  }
}
