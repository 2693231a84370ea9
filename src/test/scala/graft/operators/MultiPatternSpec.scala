package graft.operators

import graft.SparkTestBase

/** [[MultiPattern]] — Aho–Corasick semantics pinned against a naive
  * per-pattern scanner: suffix outputs via failure links (the
  * classic ushers case), overlapping occurrences, patterns inside
  * patterns, and the DataFrame surface. */
class MultiPatternSpec extends SparkTestBase {
  import spark.implicits._

  private def naive(text: String,
      pats: Seq[String]): Map[String, (Long, Long)] =
    pats.flatMap { p =>
      val pos = (0 to text.length - p.length)
        .filter(i => text.regionMatches(i, p, 0, p.length))
      if (pos.isEmpty) None
      else Some(p -> ((pos.min.toLong, pos.length.toLong)))
    }.toMap

  test("classic ushers case: suffix patterns surface via failure " +
      "links") {
    val a = MultiPattern.build(Seq("he", "she", "his", "hers"))
    val hits = a.findAll("ushers")
      .map { case (pi, off) => (a.patterns(pi), off) }.toSet
    assert(hits === Set(("she", 1), ("he", 2), ("hers", 2)))
  }

  test("overlapping occurrences all count") {
    val a = MultiPattern.build(Seq("aa"))
    assert(a.findAll("aaaa").map(_._2) === Seq(0, 1, 2))
  }

  test("matches naive scanning on dense two-letter text") {
    val pats = Seq("aa", "ab", "aba", "b", "bbb")
    for (seed <- 1 to 5) {
      val text = (0 until 60).map(i =>
        if (((seed * 13 + i * 7) % 5) < 2) 'a' else 'b').mkString
      val a = MultiPattern.build(pats)
      val got = a.findAll(text)
        .groupBy(_._1)
        .map { case (pi, hs) => a.patterns(pi) ->
          ((hs.map(_._2).min.toLong, hs.length.toLong)) }
      assert(got === naive(text, pats), s"seed=$seed text=$text")
    }
  }

  test("DataFrame surface: one row per (doc, matched pattern), " +
      "misses emit nothing, null text safe") {
    val docs = Seq((1L, "she sells sea shells"), (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = MultiPattern.matches(docs, "doc_id", "text",
        Seq("she", "sells", "zzz"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out === Set(
      (1L, "she", 0L, 2L),     // "she" and inside "shells"
      (1L, "sells", 4L, 1L)))
    // doc 2 matches "he" -> not in patterns; "zzz" matches nothing
  }

  test("duplicate patterns collapse") {
    val out = MultiPattern.matches(
        Seq((1L, "xyxy")).toDF("doc_id", "text"),
        "doc_id", "text", Seq("xy", "xy"))
      .collect()
    assert(out.length === 1 && out(0).getLong(3) === 2L)
  }
}
