package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}

/** Corpus-curation operators a large-scale training-data pipeline
  * runs between dedup and packing: source blocklisting, exact global
  * ordering without a single-partition window, curriculum
  * interleaving, and exact distributed quantiles. The common design
  * constraint: every result is EXACT and partitioning-independent,
  * yet no step ever concentrates the corpus on one worker — global
  * order comes from range-partitioned two-pass indexing, quantiles
  * from a value histogram, bucket assignment from closed-form NTILE
  * arithmetic.
  */
object Corpus {

  /** Drop rows whose `keyCol` appears in `blocked` (first column of
    * the frame, e.g. a domain / source blocklist): broadcast
    * left-anti hash join — the blocklist ships to every executor,
    * the corpus never shuffles. The standard web-corpus hygiene step
    * (host blocklists in C4/RefinedWeb-class pipelines). */
  def blocklistFilter(df: DataFrame, keyCol: String,
      blocked: DataFrame): DataFrame = {
    val bcol = blocked.columns.head
    df.join(
      broadcast(blocked.select(col(bcol).as(keyCol)).distinct()),
      Seq(keyCol), "left_anti")
  }

  /** Hostname from a raw URL: the authority component with scheme,
    * userinfo, port, path/query/fragment and any trailing dot
    * stripped, lowercased; NULL when the string has no
    * `scheme://host` shape. One regex in the Java-regex ∩ RE2
    * intersection (the q108 discipline), so SQL engines replay it
    * byte-identically — the normalizer raw-URL provenance needs
    * before per-domain caps/blocklists can key on anything. */
  def urlHost(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^:/?#]+)", 1))
    when(length(h) > 0, regexp_replace(h, "\\.$", ""))
  }

  /** Tracking query-parameters every canonicalizer drops by exact
    * name; names beginning `utm_` are dropped by prefix regardless of
    * this list. */
  val DefaultTrackingParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "ref")

  /** Canonical form of a raw URL — the WARC-pipeline exact-dedup key
    * ("the same page fetched twice rarely has the same URL string"):
    *   - scheme and host lowercased, userinfo and trailing host dot
    *     dropped (the [[urlHost]] normalizer);
    *   - default ports removed (http:80, https:443), others kept;
    *   - empty path → "/";
    *   - fragment dropped;
    *   - tracking params removed (`utm_*` by prefix plus
    *     `dropParams` by exact name), the survivors SORTED so
    *     `?a=1&b=2` and `?b=2&a=1` collapse;
    *   - NULL when the string has no `scheme://host` shape.
    *
    * Every step is a Java-regex ∩ RE2 string transform or an
    * array_sort, so a SQL oracle replays the canonical string
    * byte-exactly. Pure per-row expression chain (codegen'd, no
    * shuffle); IPv6 bracket authorities and IDN/punycode host
    * folding are out of the snapshot's scope and documented so.
    * Percent-encoding normalization is NOT
    * attempted (%7E vs ~ stays distinct — decoding is lossy without
    * a reserved-set table and real pipelines dedup post-fetch by
    * content anyway). */
  def canonicalizeUrl(url: Column,
      dropParams: Seq[String] = DefaultTrackingParams): Column = {
    val scheme = lower(regexp_extract(url,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = urlHost(url)
    val port = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^:/?#]*:([0-9]+)", 1)
    val keepPort = length(port) > 0 &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val noFrag = regexp_replace(url, "(?s)#.*", "")
    val qry = regexp_extract(noFrag, "(?s)\\?(.*)", 1)
    val kept = array_sort(filter(split(qry, "&"), p =>
      length(p) > 0 && !p.startsWith("utm_") &&
        !split(p, "=").getItem(0).isin(dropParams: _*)))
    val joined = array_join(kept, "&")
    when(host.isNotNull, concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      when(length(path) === 0, lit("/")).otherwise(path),
      when(length(joined) > 0, concat(lit("?"), joined))
        .otherwise(lit(""))))
  }

  /** Registrable domain (eTLD+1) of every row's raw URL against a
    * snapshotted PUBLIC-SUFFIX LIST (`psl`: one `suffix` column of
    * dotted label rules, e.g. "com", "co.uk", "github.io") — the
    * per-domain unit C4/RefinedWeb-class pipelines cap and block on
    * ("per domain" is eTLD+1, not raw host: news.bbc.co.uk and
    * www.bbc.co.uk are both bbc.co.uk).
    *
    * Longest-suffix match (the PSL algorithm, plain rules): the
    * public suffix is the longest rule matching a label-boundary
    * suffix of the host, defaulting to the rightmost label when no
    * rule matches (the PSL `*` prevailing rule); eTLD+1 is the
    * suffix plus one preceding label, NULL when the host IS a bare
    * public suffix (nothing registrable). Wildcard/exception PSL
    * rules are out of scope for the snapshot fixture and documented
    * so.
    *
    * Scale shape: candidate suffixes explode from DISTINCT hosts
    * only (≤`maxSuffixLabels` rows each), the rule list BROADCASTS,
    * and the per-host verdict joins back on the host key — the
    * corpus itself never carries the explode. Adds (host,
    * public_suffix, etld1). */
  def registrableDomains(df: DataFrame, urlCol: String,
      psl: DataFrame, maxSuffixLabels: Int = 4): DataFrame = {
    require(maxSuffixLabels >= 1,
      s"maxSuffixLabels >= 1 ($maxSuffixLabels)")
    val pslCol = psl.columns.head
    val rules = broadcast(
      psl.select(lower(col(pslCol)).as("__cand")).distinct())
    val withHost = df.withColumn("host", urlHost(col(urlCol)))
    val hosts = withHost.select(col("host"))
      .where(col("host").isNotNull).distinct()
    def lab = split(col("host"), "\\.")
    val matched = hosts
      .select(col("host"), lab.as("__lab"), size(lab).as("__n"))
      .select(col("host"), col("__lab"),
        explode(sequence(lit(1),
          least(col("__n"), lit(maxSuffixLabels)))).as("__l"))
      .select(col("host"),
        concat_ws(".", slice(col("__lab"), -col("__l"), col("__l")))
          .as("__cand"), col("__l"))
      .join(rules, Seq("__cand"))
      .groupBy(col("host"))
      .agg(max(col("__l")).as("__m"))
    val info = hosts
      .join(matched, Seq("host"), "left")
      .select(col("host"), lab.as("__lab"), size(lab).as("__n"),
        coalesce(col("__m"), lit(1)).as("__mm")) // PSL '*' default
      .select(col("host"),
        concat_ws(".",
          slice(col("__lab"), -col("__mm"), col("__mm")))
          .as("public_suffix"),
        when(col("__n") > col("__mm"),
          concat_ws(".", slice(col("__lab"), -(col("__mm") + 1),
            col("__mm") + 1))).as("etld1"))
    withHost.join(info, Seq("host"), "left")
  }

  /** Content-type routing signals — the deterministic code/math/
    * prose triage every mixed web corpus runs before per-type
    * pipelines (code gets lexer-aware dedup and license scans, math
    * gets TeX normalization, prose gets the quality chain). Signals,
    * all in-row and SQL-replayable:
    *   - `code_char_density`: fraction of `{ } ( ) ; =` characters;
    *   - `code_line_frac`: fraction of lines that are indented
    *     (2+ spaces / tab) or end in `; { }`;
    *   - `math_char_density`: fraction of `$ \ ^ _` characters.
    * Routing: code when either code signal clears its cut, else math
    * when the math density clears its cut, else prose. Thresholds
    * are parameters — the defaults separate the fixture classes and
    * real corpora tune them. One codegen'd expression chain, no
    * shuffle. Empty text has no densities: all three signals are
    * NULL and the row routes to prose (a deliberate guard — a raw
    * NaN ratio would satisfy `NaN > cut` under Spark's NaN-greatest
    * ordering and mis-route empties to code). */
  def contentTypeSignals(df: DataFrame, idCol: String,
      textCol: String, codeCharCut: Double = 0.03,
      codeLineCut: Double = 0.4,
      mathCharCut: Double = 0.02): DataFrame = {
    val t = col(textCol)
    val n = when(length(t) > 0, length(t).cast("double"))
    def removed(cls: String) =
      (length(t) - length(regexp_replace(t, cls, ""))).cast("double")
    val codeChar = removed("[{}();=]") / n
    val mathChar = removed("[$\\\\^_]") / n
    val lines = split(t, "\n")
    val codeLines = filter(lines, l =>
      l.rlike("^(  |\\t)") || l.rlike("[;{}]\\s*$"))
    // split('') yields [''], so the line ratio needs its own
    // empty-text guard — the char densities get NULL through `n`
    // but 0/1 here would be a non-NULL 0.0, contradicting the
    // all-NULL contract above (and the oracle's 0/0 would be NaN).
    val codeLineFrac = when(length(t) > 0,
      size(codeLines).cast("double") / size(lines).cast("double"))
    df.select(col(idCol),
        codeChar.as("code_char_density"),
        codeLineFrac.as("code_line_frac"),
        mathChar.as("math_char_density"))
      .withColumn("content_type",
        when(col("code_char_density") > codeCharCut ||
          col("code_line_frac") > codeLineCut, "code")
          .when(col("math_char_density") > mathCharCut, "math")
          .otherwise("prose"))
  }

  /** Parse robots.txt bodies into a (host, rule_type, prefix) rule
    * table: `Disallow:` / `Allow:` lines (field names matched
    * case-insensitively, REP §2.1), trailing `#` comments stripped,
    * trimmed, empty prefixes dropped (an empty Disallow allows
    * everything — no rule). The single-group snapshot scope is
    * documented: per-user-agent sections are NOT separated (the
    * fixture corpus carries only `*` groups), matching what the SQL
    * oracle can replay. */
  def robotsRules(df: DataFrame, hostCol: String,
      txtCol: String): DataFrame =
    df.select(col(hostCol).as("host"),
        explode(split(col(txtCol), "\n")).as("line"))
      .select(col("host"),
        trim(regexp_replace(col("line"), "#.*", "")).as("line"))
      .withColumn("rule_type",
        when(lower(col("line")).startsWith("disallow:"), "disallow")
          .when(lower(col("line")).startsWith("allow:"), "allow"))
      .filter(col("rule_type").isNotNull)
      .withColumn("prefix", trim(expr(
        "substring(line, instr(line, ':') + 1, 1048576)")))
      .filter(length(col("prefix")) > 0)
      .select(col("host"), col("rule_type"), col("prefix"))

  /** Robots-consent gate (Google REP semantics, the crawl-hygiene
    * twin of the q236 noindex signal): a URL's verdict comes from
    * the LONGEST matching rule prefix on its host — Allow wins ties
    * (allow_len >= disallow_len), no matching rule means allowed.
    * The rule table BROADCASTS (robots bodies are tiny next to the
    * corpus); verdicts compute over the DISTINCT (host, path) set —
    * prefix matches + one keyed agg of the two max lengths — and
    * join back, so the operator is ROW-PRESERVING (duplicate
    * frontier rows each keep their verdict) and indifferent to
    * whatever other columns, of any type, ride along. Adds (host,
    * path, allow_len, disallow_len, allowed).
    *
    * Scope notes: rules are PLAIN PREFIXES — REP `*`/`$` wildcard
    * rules are NOT interpreted (a star-pattern Disallow, e.g. a
    * .php-suffix rule, becomes a literal never-matching prefix;
    * corpora using wildcards need a regex-rule extension). A URL
    * with no scheme://host shape gets
    * a NULL host, matches no rules, and is therefore `allowed`
    * (vacuously — nothing forbids it); gate unparseable URLs
    * upstream if they should be dropped instead. */
  def robotsGate(urls: DataFrame, urlCol: String,
      rules: DataFrame): DataFrame = {
    val withParts = urls
      .withColumn("host", urlHost(col(urlCol)))
      .withColumn("path", {
        val p = regexp_extract(col(urlCol),
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
        when(length(p) === 0, "/").otherwise(p)
      })
    // verdict per DISTINCT (host, path), joined back: the operator
    // is ROW-PRESERVING (duplicate frontier rows each keep their
    // verdict) and indifferent to whatever other columns — of any
    // type — ride along on the input. The join key uses a null-safe
    // host surrogate so unparseable-URL rows (NULL host) still get
    // their vacuous allow.
    val hk = coalesce(col("host"), lit(" "))
    val keyed = withParts.withColumn("_hk", hk)
    val verdict = keyed
      .select(col("_hk"), col("host"), col("path")).distinct()
      .join(broadcast(rules), Seq("host"), "left")
      .withColumn("hit", col("prefix").isNotNull &&
        col("path").startsWith(col("prefix")))
      .groupBy(col("_hk"), col("path"))
      .agg(
        max(when(col("hit") && col("rule_type") === "allow",
          length(col("prefix"))).otherwise(lit(-1)))
          .as("allow_len"),
        max(when(col("hit") && col("rule_type") === "disallow",
          length(col("prefix"))).otherwise(lit(-1)))
          .as("disallow_len"))
      .withColumn("allowed",
        col("allow_len") >= col("disallow_len"))
    keyed.join(verdict, Seq("_hk", "path")).drop("_hk")
  }

  /** Permissive-license identifiers for the default gate: exact ids
    * plus BSD-* by prefix. */
  val PermissiveLicenses: Seq[String] =
    Seq("MIT", "Apache-2.0", "ISC", "Unlicense", "0BSD")

  /** License tagging for code/doc corpora (The-Stack-class corpora
    * gate on this before anything else ships): the machine-readable
    * `SPDX-License-Identifier:` tag wins; absent that, conservative
    * phrase probes for the three big families (MIT's "permission is
    * hereby granted", the Apache 2.0 title, the GPL title) tag with
    * an explicit `-phrase` suffix so downstream knows the weaker
    * provenance; untagged docs stay NULL (unknown ≠ permissive).
    * Compound SPDX EXPRESSIONS (`MIT AND GPL-3.0-only`,
    * `GPL-2.0-only WITH Classpath-exception-2.0`,
    * `(MIT OR Apache-2.0)`) are captured WHOLE — the operator-chain
    * grammar (ids joined by AND/OR/WITH, any case) extends the
    * capture past the first token so a GPL-encumbered conjunction
    * can never truncate to its permissive head. `permissive` is
    * true ONLY for a SINGLE-id tag (no expression operators) that
    * case-insensitively matches [[PermissiveLicenses]] or `BSD-*` —
    * compound expressions and phrase-derived tags are never
    * auto-permissive (evaluating SPDX boolean logic is a compliance
    * decision, not a tagging one). Pure per-row regex chain; adds
    * (license, permissive). */
  def licenseTags(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    val spdx = regexp_extract(t,
      "(?i)SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+()-]+" +
        "(?:[ \\t]+(?:AND|OR|WITH)[ \\t]+[A-Za-z0-9.+()-]+)*)", 1)
    val low = lower(t)
    val phrase = when(
        low.contains("permission is hereby granted"),
        "MIT-phrase")
      .when(low.contains("apache license") &&
        low.contains("version 2.0"), "Apache-2.0-phrase")
      .when(low.contains("gnu general public license"),
        "GPL-phrase")
    val license = when(length(spdx) > 0, spdx).otherwise(phrase)
    val single = !license.rlike("[ \\t]")
    val permUpper = PermissiveLicenses.map(_.toUpperCase)
    df.withColumn("license", license)
      .withColumn("permissive",
        coalesce(
          single && (upper(license).isin(permUpper: _*) ||
            upper(license).startsWith("BSD-")), lit(false)))
  }

  /** Line-level corrections (RefinedWeb §G.2 / Falcon "line-wise
    * filters"): drop structural junk lines — too short, numeric-only,
    * social counters ("3 likes"), mostly-uppercase nav — rebuild the
    * document from the survivors in order, and GATE the document on
    * the fraction of characters kept (a page that was mostly junk is
    * junk). All rules are RE2 ∩ Java regexes and integer ratios, so
    * a SQL oracle replays the rebuilt text byte-exactly. One bounded
    * explode + one keyed agg; no shuffle beyond the doc key.
    *
    * Output per doc: (idCol, n_lines, n_kept, char_keep_ratio,
    * doc_kept, clean_text). A doc with zero total characters
    * (empty / all-newline text) has NO ratio — char_keep_ratio is
    * NULL and doc_kept false (a raw NaN ratio would satisfy
    * `NaN >= cut` under Spark's NaN-greatest ordering and pass a
    * fully blank document through the junk gate). */
  def lineCorrections(df: DataFrame, idCol: String, textCol: String,
      minLineChars: Int = 10, upperCut: Double = 0.6,
      charKeepCut: Double = 0.8): DataFrame = {
    val lines = df.select(col(idCol), posexplode(
      split(col(textCol), "\n")).as(Seq("line_id", "line")))
    val t = trim(col("line"))
    val letters = length(regexp_replace(t, "[^A-Za-z]", ""))
    val uppers = length(regexp_replace(t, "[^A-Z]", ""))
    val upperHeavy = letters > 0 &&
      uppers.cast("double") / letters.cast("double") > upperCut
    val keep = !(length(t) < minLineChars ||
      t.rlike("^[0-9 .,%/()-]+$") ||
      lower(t).rlike("^[0-9]+ (likes|views|comments|shares)$") ||
      upperHeavy)
    lines
      .withColumn("keep", keep)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        (sum(when(col("keep"), length(col("line"))).otherwise(0L))
          .cast("double") /
          when(sum(length(col("line"))) > 0,
            sum(length(col("line"))).cast("double")))
          .as("char_keep_ratio"),
        concat_ws("\n", transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("line_id"), col("line"))))),
          s => s.getField("line"))).as("clean_text"))
      .withColumn("doc_kept",
        coalesce(col("char_keep_ratio") >= charKeepCut, lit(false)))
  }

  /** C4-style badwords document filter (Raffel et al. 2020 §2.2 —
    * the "List of Dirty, Naughty ... Words" gate every public web
    * corpus applies): drop any document containing at least one
    * blocked TOKEN (lowercased whitespace token, the C4 matching
    * unit). Returns survivors with their full columns.
    *
    * Scale: the block list broadcasts (thousands of words); the doc
    * side explodes to lowercased tokens, inner-joins the broadcast
    * list, and the matched doc-id set anti-joins back — two map-side
    * hash probes and one distinct on matched ids, no shuffle of the
    * token stream. A doc matches on membership only, so the token
    * stream needs no ordering and duplicate matches collapse in the
    * distinct. */
  def badwordsFilter(df: DataFrame, idCol: String, textCol: String,
      badwords: DataFrame): DataFrame = {
    val bcol = badwords.columns.head
    val bw = broadcast(badwords
      .select(lower(col(bcol)).as("_bw")).distinct())
    val matched = df
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("_tok"))
      .join(bw, col("_tok") === col("_bw"), "left_semi")
      .select(col(idCol)).distinct()
    df.join(matched, Seq(idCol), "left_anti")
  }

  /** Vocabulary-coverage report under a corpus-trained top-K word
    * vocabulary — the tokenizer-budget planning number (what OOV
    * rate does a K-entry word vocab leave on THIS corpus?) and the
    * per-doc outlier signal (a doc whose tokens are mostly
    * out-of-vocabulary is foreign to the corpus: wrong language,
    * binary junk, or template noise). Token unit = lowercased
    * whitespace token (the [[badwordsFilter]] / C4 matching unit);
    * the vocabulary is the top `vocabSize` tokens by (count desc,
    * token asc — deterministic tie).
    *
    * Output per doc: (idCol, n_tokens, n_oov, n_types, n_oov_types,
    * oov_rate), rate NULL on token-less docs (no 0/0).
    *
    * Scale: counts aggregate is VOCABULARY-sized; the top-K rank
    * window runs over that vocab table, not the corpus (the
    * [[graft.operators.Dedup.jaccardPrefixJoin]] device — swap for
    * [[globalRank]] at extreme vocab); the kept vocab broadcasts
    * back onto the token stream, so documents never shuffle. The
    * token explode runs twice (count pass + probe pass) — two scans
    * beat materializing a corpus-sized token frame. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 1000): DataFrame = {
    def toks = df.select(col(idCol), explode(
      filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("tok"))
    val vocab = broadcast(
      toks.groupBy(col("tok")).agg(count(lit(1)).as("_cnt"))
        .withColumn("_vrank", row_number().over(
          Window.orderBy(desc("_cnt"), col("tok"))))
        .filter(col("_vrank") <= vocabSize)
        .select(col("tok"), lit(true).as("_in_vocab")))
    val agg = toks.join(vocab, Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L))
          .as("n_oov"),
        countDistinct(col("tok")).as("n_types"),
        countDistinct(when(col("_in_vocab").isNull, col("tok")))
          .as("n_oov_types"))
    // Token-less docs have no token rows, so the aggregate alone
    // would DROP them — join back onto the doc set so they report
    // zero counters and a NULL rate (a gate reading this frame must
    // see every doc it was asked about).
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_oov_types"), lit(0L)).as("n_oov_types"))
      .withColumn("oov_rate", when(col("n_tokens") > 0,
        col("n_oov").cast("double") / col("n_tokens").cast("double")))
  }

  /** Per-document Unicode SCRIPT-MIX signals — the routing/quality
    * layer beneath language ID (a LID model sees tokens; the script
    * histogram sees raw code points, so it catches what LID can't:
    * mixed-script spoofing, mislabeled transliterations, binary
    * junk). Ratios over total characters for six families — latin,
    * cyrillic, greek, arabic, cjk (Han+Hiragana+Katakana+Hangul),
    * digit — via the [[contentTypeSignals]] char-class-removal
    * device (script property classes, RE2 ∩ Java: `\p{IsLatin}` ≙
    * RE2 `\p{Latin}`). Empty text: all ratios NULL, dominant NULL.
    * `dominant_script` = the letter family with the max ratio
    * (first in the declared order on ties; NULL when no letter
    * family is present at all); `n_scripts` counts letter
    * families above 5% — ≥2 is the mixed-script flag. One codegen'd
    * per-row chain, no shuffle. */
  def scriptMix(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    val n = when(length(t) > 0, length(t).cast("double"))
    def ratio(cls: String) =
      (length(t) - length(regexp_replace(t, cls, ""))).cast("double") / n
    val fams = Seq(
      "latin" -> "\\p{IsLatin}",
      "cyrillic" -> "\\p{IsCyrillic}",
      "greek" -> "\\p{IsGreek}",
      "arabic" -> "\\p{IsArabic}",
      "cjk" -> ("[\\p{IsHan}\\p{IsHiragana}" +
        "\\p{IsKatakana}\\p{IsHangul}]"),
      "digit" -> "[0-9]")
    val withRatios = df.select(col(idCol) +: fams.map { case (f, cls) =>
      ratio(cls).as(s"${f}_ratio")
    }: _*)
    val letters = fams.map(_._1).filter(_ != "digit")
    val mx = greatest(letters.map(f => col(s"${f}_ratio")): _*)
    val dominant = letters.foldRight(lit(null).cast("string")) {
      case (f, acc) =>
        when(col(s"${f}_ratio") === mx, f).otherwise(acc)
    }
    val nScripts = letters.map(f =>
      when(col(s"${f}_ratio") > 0.05, 1).otherwise(0))
      .reduce(_ + _)
    withRatios
      // no letters at all (digits/punct-only, or empty) -> NULL,
      // not a vacuous 'latin' at ratio 0
      .withColumn("dominant_script", when(mx > 0, dominant))
      .withColumn("n_scripts", nScripts.cast("long"))
      .withColumn("mixed_script",
        coalesce(col("n_scripts") >= 2, lit(false)))
  }

  /** Rule-based sentence segmentation — the unit beneath the
    * paragraph/line operators that translation mining, SFT slicing,
    * and sentence-level dedup key on. Grammar, declared (RE2 ∩ Java
    * — no lookarounds, so a SQL oracle replays it):
    * a sentence is a maximal run of non-terminator characters plus
    * its trailing `[.!?]+` run (`([^.!?]+[.!?]+|[^.!?]+$)`); the
    * unterminated tail is its own sentence; sentences trim and
    * empty trims drop, then re-number contiguously. Abbreviation
    * periods ("Dr.") split — the line-local scope every operator in
    * this family declares; a corpus that needs abbreviation tables
    * routes through a trained segmenter upstream.
    * Output: (idCol, sent_id, sentence), one bounded explode, no
    * shuffle. */
  def sentences(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val raw = expr(s"regexp_extract_all($textCol, " +
      "'([^.!?]+[.!?]+|[^.!?]+$)', 1)")
    val kept = filter(transform(raw, s => trim(s)),
      s => length(s) > 0)
    df.select(col(idCol), posexplode(kept)
      .as(Seq("sent_id", "sentence")))
      .withColumn("sent_id", col("sent_id").cast("long"))
  }

  /** Heaps'-law vocabulary growth curve — distinct word types vs
    * tokens seen at `checkpoints` evenly-spaced prefixes of the
    * corpus in `idCol` order: the vocabulary-scaling diagnostic
    * (companion to the Zipf slope and the Good-Turing spectrum)
    * that sizes tokenizer vocabularies and predicts OOV decay
    * before a 100 TB pass commits to one. Token unit = lowercased
    * whitespace token (the [[vocabCoverage]] unit).
    *
    * Output per checkpoint 1..K: (checkpoint, n_docs, n_tokens,
    * n_types) where the prefix is the first ⌊i·n/K⌋ docs.
    *
    * Scale: doc order comes from [[globalRank]] (two-pass range
    * rank, never a single-partition window); each type collapses to
    * its FIRST-occurrence rank and each doc to its token count
    * BEFORE the checkpoint join, so the ≤-join explodes only
    * vocabulary-sized and doc-count-sized frames by K (broadcast
    * K rows), never the token stream. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
      checkpoints: Int = 10): DataFrame = {
    require(checkpoints >= 1, s"checkpoints >= 1 ($checkpoints)")
    val spark = df.sparkSession
    val ranked = globalRank(df.select(col(idCol), col(textCol)),
      Seq(col(idCol)), "rnk")
    val toks = ranked.select(col("rnk"), explode(
      filter(split(lower(col(textCol)), "\\s+"),
        t => length(t) > 0)).as("tok"))
    val firstRank = toks.groupBy(col("tok"))
      .agg(min(col("rnk")).as("first_rnk"))
    val docTokens = toks.groupBy(col("rnk"))
      .agg(count(lit(1)).as("n_toks"))
    // doc count rides as a broadcast one-row frame (the
    // curriculumInterleave device) — no driver action in the plan
    val nRow = df.agg(count(lit(1)).as("_n"))
    val cps = broadcast(spark.range(1, checkpoints + 1L)
      .select(col("id").as("checkpoint"))
      .crossJoin(nRow)
      .select(col("checkpoint"),
        floor(col("checkpoint") * col("_n") / checkpoints)
          .as("cutoff")))
    val types = firstRank.join(cps,
        col("first_rnk") <= col("cutoff"))
      .groupBy(col("checkpoint"))
      .agg(count(lit(1)).as("n_types"))
    val tokens = docTokens.join(cps, col("rnk") <= col("cutoff"))
      .groupBy(col("checkpoint"))
      .agg(sum(col("n_toks")).as("n_tokens"))
    // the checkpoint frame DRIVES the output: a zero-cutoff or
    // all-empty prefix still reports its row (with zeros) — the
    // declared 1..K contract; the inner ≤-joins alone would silently
    // drop it
    cps.join(types, Seq("checkpoint"), "left")
      .join(tokens, Seq("checkpoint"), "left")
      .select(col("checkpoint"), col("cutoff").as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"))
  }

  /** Exact 1-based global rank of every row under `sortCols` WITHOUT
    * a single-partition window: range-repartition on the sort key,
    * sort within partitions, then assign indexes in two passes
    * (per-partition counts → prefix offsets — the zipWithIndex
    * device). The sort keys MUST be a total order (include a unique
    * tie-break column): rows equal under `sortCols` may land on
    * either side of a range boundary, and a strict order makes the
    * result independent of where the sampled boundaries fall.
    *
    * This is the scale-correct form of `row_number() OVER (ORDER BY
    * …)`, which Spark executes on ONE partition — the ranking
    * operator a 100 TB curriculum/packing pass needs. */
  def globalRank(df: DataFrame, sortCols: Seq[Column],
      rankName: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }

  /** Curriculum interleave: order rows by `scoreCol` (ascending —
    * easy-to-hard, e.g. a sequence-length curriculum), cut the
    * ordered corpus into `buckets` NTILE difficulty buckets, then
    * emit the round-robin training order that cycles bucket 1..k at
    * each difficulty position — every training window sees the full
    * difficulty mix while overall difficulty still ramps.
    *
    * Output adds: rnk (global rank), bucket (NTILE id, 1..k), pos
    * (1-based position within bucket), training_pos (the interleaved
    * order, a bijection onto 1..n).
    *
    * Exactness + scale: rank comes from [[globalRank]] (no
    * single-partition window), and bucket/pos/training_pos are
    * CLOSED-FORM integer arithmetic on (rnk, n) — NTILE's first
    * n mod k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋, so bucket
    * boundaries are computable per-row from the broadcast one-row
    * count, no second window anywhere. */
  def curriculumInterleave(df: DataFrame, scoreCol: String,
      idCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be positive ($buckets)")
    val k = buckets.toLong
    val ranked = globalRank(df, Seq(col(scoreCol), col(idCol)))
    val cnt = ranked.agg(max(col("rnk")).as("__n"))
    ranked.crossJoin(broadcast(cnt))
      .withColumn("__base", expr(s"__n div $k"))
      .withColumn("__rem", col("__n") % k)
      .withColumn("__bdry", col("__rem") * (col("__base") + 1))
      .withColumn("bucket",
        when(col("rnk") <= col("__bdry"),
          expr("(rnk + __base) div (__base + 1)"))
          .otherwise(col("__rem") +
            expr("(rnk - __bdry + __base - 1) div __base")))
      .withColumn("pos",
        col("rnk") - (col("bucket") - 1) * col("__base") -
          least(col("bucket") - 1, col("__rem")))
      .withColumn("training_pos",
        (col("pos") - 1) * k + col("bucket"))
      .drop("__n", "__base", "__rem", "__bdry")
  }

  /** Exact per-group quantiles of an INTEGER-valued column (token
    * counts, char lengths, …) with type-7 linear interpolation —
    * equal to `quantile_cont` / exact `percentile` — computed from
    * the (group, value) HISTOGRAM instead of a per-group sort: the
    * only window runs over distinct values per group (bounded by
    * value cardinality, e.g. a few thousand lengths), never over
    * rows, so group skew cannot concentrate a corpus-sized partition
    * anywhere. Quantile fractions should be exactly representable
    * binary fractions (0.25, 0.5, 0.875, …) so the interpolation
    * arithmetic is exact and engine-independent.
    *
    * `quantiles`: (output column name, fraction). Output: groupCol,
    * n (group row count), one double column per requested quantile.
    */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    val hist = df
      .groupBy(col(groupCol), col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    // [__lo, __hi): the 0-based index range this value covers in the
    // group's sorted row sequence
    val cum = hist
      .withColumn("__hi", sum(col("__c")).over(w))
      .withColumn("__lo", col("__hi") - col("__c"))
    val ns = hist.groupBy(col(groupCol)).agg(sum(col("__c")).as("n"))
    val qlits = array(quantiles.map { case (name, f) =>
      struct(lit(name).as("qname"), lit(f).as("f")) }: _*)
    val grid = ns
      .select(col(groupCol), col("n"), explode(qlits).as("__q"))
      .select(col(groupCol), col("n"), col("__q.qname").as("__qname"),
        ((col("n") - 1).cast("double") * col("__q.f")).as("__h"))
      .withColumn("__i0", floor(col("__h")).cast("long"))
      .withColumn("__i1",
        least(ceil(col("__h")).cast("long"), col("n") - 1))
    val at0 = cum.select(col(groupCol).as("__g0"), col("__v").as("__v0"),
      col("__lo").as("__l0"), col("__hi").as("__h0"))
    val at1 = cum.select(col(groupCol).as("__g1"), col("__v").as("__v1"),
      col("__lo").as("__l1"), col("__hi").as("__h1"))
    val vals = grid
      .join(at0, col(groupCol) === col("__g0") &&
        col("__i0") >= col("__l0") && col("__i0") < col("__h0"))
      .join(at1, col(groupCol) === col("__g1") &&
        col("__i1") >= col("__l1") && col("__i1") < col("__h1"))
      .select(col(groupCol), col("__qname"),
        (col("__v0") +
          (col("__v1") - col("__v0")) * (col("__h") - col("__i0")))
          .as("__qv"),
        col("n"))
    vals.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        quantiles.map { case (name, _) =>
          max(when(col("__qname") === name, col("__qv"))).as(name)
        }: _*)
  }

  /** Top-k bigram collocations by pointwise mutual information —
    * PMI(a,b) = ln(P(ab) / (P(a)·P(b))) with P from corpus unigram /
    * bigram frequencies — the phrase-induction signal tokenizer and
    * vocab pipelines mine ("new york"-class units score high, "of
    * the"-class chance pairs near 0). `minCount` floors the bigram
    * count: PMI's known pathology is that hapax pairs score highest.
    *
    * Output: (a, b, cab, ca, cb, pmi) — counts exact, pmi truncated
    * to 9 decimals (the ln-truncation device of the entropy/Zipf
    * family: engines' libm ln agree far beyond 1e-9 at these
    * magnitudes).
    *
    * Scale: two hash aggregations (unigrams, bigrams) + two keyed
    * joins of bigrams onto the unigram counts + two one-row total
    * frames (broadcast). The PMI argument is assembled as one
    * quotient of count products — at trillion-token scale move to
    * log-space (ln(cab) + 2·ln(N) − …) to keep the products inside
    * double precision; the single-ln form is kept here because the
    * oracle replays it verbatim. */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Int = 5, k: Int = 30): DataFrame = {
    val tks = filter(split(trim(col(textCol)), " +"),
      t => length(t) > 0)
    val docs = df.select(tks.as("__tk"))
    val uni = docs.select(explode(col("__tk")).as("w"))
    val uc = uni.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = uni.agg(count(lit(1)).as("nn"))
    val bi = docs
      .filter(size(col("__tk")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__tk")) - 1),
        i => struct(element_at(col("__tk"), i).as("a"),
          element_at(col("__tk"), i + 1).as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bc = bi.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cab"))
    val nb = bi.agg(count(lit(1)).as("nbb"))
    val pmi9 = floor(
      log((col("cab").cast("double") * col("nn") * col("nn")) /
        (col("nbb").cast("double") * col("ca") * col("cb"))) *
        lit(1e9)).cast("double") / lit(1e9)
    bc.filter(col("cab") >= minCount)
      .join(uc.select(col("w").as("a"), col("c").as("ca")), "a")
      .join(uc.select(col("w").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(nb))
      .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
        pmi9.as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Flesch reading-ease statistics (Flesch 1948) with fully-declared
    * counting heuristics so the score is engine-replayable: words =
    * whitespace tokens, sentences = max(1, [.!?]+ run count),
    * syllables = [aeiouy]+ vowel-group count of the lowercased text
    * (vowel-less words contribute 0 — the per-word ≥1 floor is
    * deliberately traded for a single regexp pass; scores shift by a
    * constant-ish offset, ranking survives). flesch = 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words), truncated to
    * 9 decimals, null when words = 0. The readability quality signal
    * corpora filter on next to the Gopher gates; a pure map stage.
    */
  def readabilityStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        size(split(trim(t), "\\s+")).cast("long").as("words"),
        greatest(lit(1L),
          size(regexp_extract_all(t, lit("[.!?]+"), lit(0)))
            .cast("long")).as("sentences"),
        size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("syllables"))
      .withColumn("flesch",
        when(col("words") > 0,
          floor((lit(206.835) -
            lit(1.015) *
              (col("words").cast("double") / col("sentences")) -
            lit(84.6) *
              (col("syllables").cast("double") / col("words"))) *
            lit(1e9)).cast("double") / lit(1e9)))
  }

  /** Reciprocal-rank fusion of several quality scores (the RRF
    * formula of Cormack et al. 2009, applied to corpus curation
    * instead of retrieval): each score column ranks the corpus
    * descending (ties → smaller id first), and
    * fused = Σ 1/(kRrf + rank) left-to-right over `scoreCols` —
    * a fixed IEEE addition chain, so the fusion is engine-exact
    * with no decimal discipline needed. Rank-based fusion is the
    * standard way to combine scorers on incompatible scales
    * (a Flesch score, a log-odds, a length prior) without
    * per-scorer calibration.
    *
    * Shape: one window per score column over (score desc, id) —
    * S full-data sorts, the honest cost of exact global ranks; at
    * 100 TB swap exact ranks for the closed-form NTILE bucket
    * arithmetic above ([[exactQuantiles]]) if bucket-grade ranks
    * suffice. Null scores rank last (they still receive a rank).
    *
    * Output: (idCol, rank_<c> per score col, fused). */
  def rrfFusion(scored: DataFrame, idCol: String,
      scoreCols: Seq[String], kRrf: Int = 60): DataFrame = {
    require(scoreCols.nonEmpty && kRrf >= 1,
      s"need score columns and kRrf >= 1 ($scoreCols, $kRrf)")
    val ranked = scoreCols.foldLeft(scored) { (df, c) =>
      df.withColumn(s"rank_$c",
        row_number().over(Window
          .orderBy(col(c).desc_nulls_last, col(idCol)))
          .cast("long"))
    }
    val fused = scoreCols
      .map(c => lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$c")))
      .reduce(_ + _)
    ranked.select(
      (col(idCol) +: scoreCols.map(c => col(s"rank_$c"))) :+
        fused.as("fused"): _*)
  }

  private def ln9c(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  private def t9c(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  /** Token-distribution drift between a corpus slice and its
    * complement — the KL/JS divergence report a data-quality
    * pipeline runs when a new crawl lands or a filter changes
    * ("did this batch shift the distribution?"). Unigram counts
    * per side, add-one smoothing over the UNION vocabulary (so
    * either side's missing tokens contribute their smoothed mass),
    * p·ln(p/q) terms 9-truncated into exact decimal sums:
    *
    *  - kl_ab = Σ p·(ln p − ln q), kl_ba symmetric,
    *  - js = ½·Σ p·(ln p − ln m) + ½·Σ q·(ln q − ln m),
    *    m = (p+q)/2 — bounded, symmetric, the drift metric to
    *    alert on.
    *
    * One token scan → two bounded (vocab-sized) count tables →
    * one full-outer vocab join; corpus-sized work is the scan.
    * Output: one row (vocab_union, tokens_a, tokens_b, kl_ab,
    * kl_ba, js).
    *
    * Degenerate inputs are SIGNALED, not silently degraded: rows
    * where `sliceA` is NULL belong to neither side and are dropped
    * before counting (a null slice label is "provenance unknown",
    * not a vote for either distribution), and if either side ends
    * up with zero tokens the KL/JS columns are NULL — comparing a
    * real distribution against pure smoothing mass is not a drift
    * measurement, and a null tells the caller so machine-readably
    * (tokens_a/tokens_b carry which side was empty). */
  def distributionDrift(docs: DataFrame, textCol: String,
      sliceA: Column): DataFrame = {
    val toks = docs.select(sliceA.as("a"),
      explode(filter(split(col(textCol), " "),
        x => length(x) > 0)).as("tok"))
    val ca = toks.filter(col("a")).groupBy(col("tok"))
      .agg(count(lit(1)).as("ca"))
    val cb = toks.filter(!col("a")).groupBy(col("tok"))
      .agg(count(lit(1)).as("cb"))
    val joined = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(count(lit(1)).as("v"),
      sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    def dsum15(c: Column): Column =
      sum(c.cast(DecimalType(18, 15))).cast("double")
    joined.crossJoin(broadcast(tot))
      .select(col("v"), col("na"), col("nb"),
        ((col("ca") + 1).cast("double") /
          (col("na") + col("v"))).as("p"),
        ((col("cb") + 1).cast("double") /
          (col("nb") + col("v"))).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .agg(max(col("v")).as("vocab_union"),
        max(col("na")).as("tokens_a"),
        max(col("nb")).as("tokens_b"),
        dsum15(t9c(col("p") * (ln9c(col("p")) - ln9c(col("q")))))
          .as("_kl_ab"),
        dsum15(t9c(col("q") * (ln9c(col("q")) - ln9c(col("p")))))
          .as("_kl_ba"),
        (dsum15(t9c(col("p") * (ln9c(col("p")) - ln9c(col("m")))))
          / 2 +
          dsum15(t9c(col("q") * (ln9c(col("q")) - ln9c(col("m")))))
          / 2).as("_js"))
      // an empty side means there is no distribution to compare —
      // null the divergences instead of reporting KL against pure
      // add-one smoothing mass
      .select(Seq(col("vocab_union"), col("tokens_a"),
        col("tokens_b")) ++
        Seq("kl_ab", "kl_ba", "js").map(c =>
          when(col("tokens_a") > 0 && col("tokens_b") > 0,
            col(s"_$c")).as(c)): _*)
  }

  /** Cross-source quantile-mapping score calibration: scores
    * produced per source (different classifier versions, different
    * heuristics) are not comparable on their raw scale — a 0.8 from
    * one grader is not a 0.8 from another. The standard fix before
    * mixing is rank-based distribution mapping: replace each row's
    * score with the GLOBAL score distribution's value at the row's
    * within-source quantile. Bucketized to `buckets` equal-width
    * quantile bins so the mapping table is tiny and the whole
    * decision is exact-integer + one IEEE division per row (which
    * is what lets the DuckDB oracle replay it bit-identically).
    *
    * Output: idCol, sourceCol, score, src_pct (percent_rank within
    * source, ties broken by id), bucket, calibrated (the global
    * max-score of the row's quantile bucket; empty buckets inherit
    * the previous bucket's value).
    *
    * Scale shape: the within-source side is a source-partitioned
    * window (parallel across sources); the global side reuses the
    * [[globalRank]] two-pass device — range exchange + per-partition
    * zipWithIndex, never a single-partition window — folded into a
    * `buckets`-row map that broadcasts back onto the corpus. The
    * bucket-fill window runs over the `buckets`-row spine, bounded
    * by the bucket count, not the data. */
  def quantileCalibrate(df: DataFrame, idCol: String,
      sourceCol: String, scoreCol: String,
      buckets: Int = 20): DataFrame = {
    require(buckets >= 2, "need at least two quantile buckets")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(sourceCol),
      col(scoreCol).as("score"))
    def bucketOf(pct: Column): Column =
      least(floor(pct * buckets), lit(buckets - 1)).cast("long")
    val srcPct = percent_rank().over(Window.partitionBy(col(sourceCol))
      .orderBy(col("score"), col(idCol)))
    val withSrc = base
      .withColumn("src_pct", srcPct)
      .withColumn("bucket", bucketOf(col("src_pct")))
    // global side: two-pass rank, never a global window
    val ranked = globalRank(base.select(col(idCol), col("score")),
      Seq(col("score"), col(idCol)))
    val n = ranked.agg(count(lit(1)).as("__n"))
    val gBuckets = ranked.crossJoin(broadcast(n))
      .select(col("score"), bucketOf(
        when(col("__n") > 1,
          (col("rnk") - 1).cast("double") / (col("__n") - 1))
          .otherwise(lit(0.0))).as("gbucket"))
      .groupBy(col("gbucket")).agg(max(col("score")).as("__cal"))
    val spine = spark.range(buckets.toLong).toDF("gbucket")
    val fill = spine.join(gBuckets, Seq("gbucket"), "left")
      .withColumn("calibrated", last(col("__cal"), ignoreNulls = true)
        .over(Window.orderBy(col("gbucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("gbucket"), col("calibrated"))
    withSrc.join(broadcast(fill),
        col("bucket") === col("gbucket"), "left")
      .drop("gbucket")
  }
}
