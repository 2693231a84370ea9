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
}
