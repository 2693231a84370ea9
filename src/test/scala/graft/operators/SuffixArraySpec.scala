package graft.operators

import graft.SparkTestBase

/** Prefix-doubling suffix ranks vs hand-sorted suffixes. */
class SuffixArraySpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
    SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("generalized suffix array of {banana, ban} — hand-sorted") {
    val out = ranks(Seq((1L, "banana"), (2L, "ban")))
    // suffixes sorted: a | an | ana | anana | ban | banana | n | na | nana
    val expected = Map(
      (1L, 5L) -> 0L, (2L, 1L) -> 1L, (1L, 3L) -> 2L, (1L, 1L) -> 3L,
      (2L, 0L) -> 4L, (1L, 0L) -> 5L, (2L, 2L) -> 6L, (1L, 4L) -> 7L,
      (1L, 2L) -> 8L)
    assert(out === expected)
  }

  test("identical documents share every suffix rank (dense ranks)") {
    val out = ranks(Seq((1L, "ab"), (2L, "ab")))
    assert(out === Map(
      (1L, 0L) -> 0L, (2L, 0L) -> 0L, // "ab"
      (1L, 1L) -> 1L, (2L, 1L) -> 1L)) // "b"
  }

  test("longestRepeats: max adjacent-rank LCP incl. the " +
      "one-suffix-is-a-prefix-of-the-other case") {
    val out = SuffixArray.longestRepeats(
      Seq((1L, "banana"), (2L, "ban")).toDF("doc_id", "text"),
      "doc_id", "text", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(5))).toSeq
    // suffix order: a|an|ana|anana|ban|banana|n|na|nana
    // top LCPs: ana~anana = 3, ban~banana = 3 (ban IS a prefix —
    // lcp must equal min length, not a sentinel), an~ana = 2
    assert(out === Seq((2L, 3L), (4L, 3L), (1L, 2L)))
  }

  /** Unsigned UTF-8 byte lexicographic order — what UTF8String and
    * DuckDB's binary collation both compare by. NOT the same as JVM
    * String order for non-BMP text (UTF-16 code units put U+E000+
    * after the surrogate range, i.e. after every supplementary
    * character). */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      if ((a(i) & 0xff) != (b(i) & 0xff))
        return (a(i) & 0xff) < (b(i) & 0xff)
      i += 1
    }
    a.length < b.length
  }

  private def jvmDenseRanks(
      docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sufs = docs.flatMap { case (id, t) =>
      val cps = t.codePoints.toArray
      cps.indices.map(o =>
        ((id, o.toLong), new String(cps, o, cps.length - o)))
    }
    val rank = sufs.map(_._2).distinct.sortWith(utf8Less)
      .zipWithIndex.toMap
    sufs.map { case (k, s) => k -> rank(s).toLong }.toMap
  }

  test("CJK + emoji corpus: code-point offsets, UTF-8 byte order — " +
      "ranks match a JVM code-point reference exactly") {
    // doc 3/4 mix ASCII, a non-BMP musical symbol (U+1D11E), a
    // private-use BMP char (U+E000), and emoji (U+1F600): U+E000
    // sorts BEFORE the supplementary chars in UTF-8/code-point order
    // but AFTER them in UTF-16 code-unit order, so any code-unit
    // leakage in the engine path flips these ranks.
    val docs = Seq(
      (1L, "日本語のテスト文書です。日本語のテスト"),
      (2L, "日本語のテスト"),
      (3L, "a𝄞bc😀"),
      (4L, "😀😀a𝄞"))
    assert(ranks(docs) === jvmDenseRanks(docs))
  }

  test("windowed LCP: a repeat spanning many doubling rounds is " +
      "exact, and per-round slices stay window-bounded") {
    // 1000 shared chars then a diverging tail: with window=8 the top
    // pair saturates 8,16,...,256-wide rounds and finishes inside the
    // 512 window — the extension loop, not a whole-suffix zip.
    val rnd = new scala.util.Random(42)
    val p = (1 to 1000).map(_ =>
      "abcdefghijklmnopqrstuvwxyz0123456789"(rnd.nextInt(36)))
      .mkString
    val docs = Seq((1L, p + "1"), (2L, p + "2"))
    val out = SuffixArray.longestRepeats(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = 3,
      window = 8).collect()
    assert(out.map(_.getLong(5)).toSeq === Seq(1000L, 999L, 998L))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.head.getString(6) === md)
    assert(out.head.getLong(2) === 0L) // a_off of the full-prefix pair
  }

  test("windowed LCP on CJK text counts code points, not code units") {
    // shared 6-code-point prefix (incl. non-BMP) then divergence
    val docs = Seq(
      (1L, "😀日本語𝄞Xたchい"),
      (2L, "😀日本語𝄞Yうね"))
    val out = SuffixArray.longestRepeats(
      docs.toDF("doc_id", "text"), "doc_id", "text", k = 1,
      window = 4).collect()
    assert(out.head.getLong(5) === 5L)
  }

  test("repetitive text needs the late doubling rounds (long " +
      "shared prefixes) and is partition-invariant") {
    val docs = Seq((1L, "aaaaaaaaaaaaaaaab"), (2L, "aaaaaaaaaaaaaaaa"))
    val a = ranks(docs)
    // suffix order: all-a suffixes by LENGTH (shorter first), and a^k b
    // suffixes sort after any all-a run of length >= k's prefix match
    // spot-check the extremes against direct string sort
    val all = docs.flatMap { case (id, t) =>
      t.indices.map(o => ((id, o.toLong), t.substring(o))) }
    val sorted = all.sortBy(_._2).map(_._1)
    val dense = sorted.zipWithIndex.foldLeft(
      (Map.empty[(Long, Long), Long], -1L, "")) {
      case ((m, prev, prevS), (key, _)) =>
        val s = all.toMap.apply(key)
        val r = if (s == prevS) prev else prev + 1
        (m + (key -> r), r, s)
    }._1
    assert(a === dense)
    val b = SuffixArray.suffixRanks(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(b === a)
  }

  /** Brute force: for an eval doc, the longest substring occurring in
    * any train doc, and the smallest offset achieving it. */
  private def bruteShared(ev: String,
      train: Seq[String]): (Long, Long) = {
    def sharedAt(off: Int): Int = {
      var best = 0
      var l = ev.length - off
      while (l > best) {
        if (train.exists(_.contains(ev.substring(off, off + l))))
          best = l
        l -= 1
      }
      best
    }
    val per = (0 until ev.length).map(o => (sharedAt(o), o))
    if (per.isEmpty) (0L, 0L)
    else {
      val mx = per.map(_._1).max
      (mx.toLong, per.filter(_._1 == mx).map(_._2).min.toLong)
    }
  }

  test("crossCorpusShared: hand cases — interior LCS, identical " +
      "suffix, nothing shared, eval-eval sharing excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefgh", "train"),
      (2L, "xxcdefyy", "eval"),   // LCS "cdef" at off 2
      (3L, "efgh", "eval"),       // identical to a train suffix
      (4L, "zzzz", "eval"),       // disjoint alphabet: nothing
      (5L, "qqqq", "eval"),       // shares only with eval 6 — must
      (6L, "qqqq", "eval")        //   NOT count (same label)
    ).toDF("doc_id", "text", "lbl")
    val out = SuffixArray.crossCorpusShared(docs, "doc_id", "text",
        "lbl", "eval")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getLong(2)))).toMap
    assert(out(2L) === ((4L, 2L)))
    assert(out(3L) === ((4L, 0L)))
    assert(out(4L) === ((0L, 0L)))
    assert(out(5L) === ((0L, 0L)) && out(6L) === ((0L, 0L)))
  }

  test("crossCorpusShared matches brute force on dense two-letter " +
      "corpora (long shared runs, many rank ties)") {
    import spark.implicits._
    // deterministic pseudo-random a/b strings: heavy suffix-rank
    // collisions and nontrivial cross-doc runs
    def mk(seed: Int, n: Int): String =
      (0 until n).map(i => if (((seed * 31 + i * 17) % 7) < 3) 'a'
        else 'b').mkString
    val train = Seq(mk(1, 24), mk(2, 19))
    val evals = Seq(mk(3, 21), mk(4, 16), "ababab")
    val docs = (train.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "train") } ++
      evals.zipWithIndex.map { case (t, i) =>
        (100L + i, t, "eval") }).toDF("doc_id", "text", "lbl")
    val out = SuffixArray.crossCorpusShared(docs, "doc_id", "text",
        "lbl", "eval")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getLong(2)))).toMap
    for ((ev, i) <- evals.zipWithIndex) {
      val exp = bruteShared(ev, train)
      assert(out(100L + i) === exp, s"eval $i '$ev' expected $exp")
    }
  }
}
