package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern substring search via Aho–Corasick (Aho & Corasick
  * 1975) — the one-pass automaton behind phrase blocklists, PII
  * keyword sweeps, and contamination marker scans. The existing
  * [[Corpus.badwordsFilter]] matches whole TOKENS by hash join; this
  * operator matches SUBSTRINGS (multi-word phrases, words hidden by
  * concatenation), where the naive plan is |patterns| separate
  * scans per document and the automaton is one scan total — the
  * classic T-fold win when blocklists reach thousands of entries.
  *
  * Matching semantics (pinned by the spec against a naive scanner
  * and replayed by the DuckDB oracle): every occurrence counts,
  * including overlapping occurrences and occurrences of one pattern
  * inside another; positions are 0-based code-unit offsets of the
  * match START. Duplicate patterns are collapsed.
  *
  * Scale shape: the automaton is built ONCE per executor per
  * pattern set (a process-level cache keyed by the pattern list —
  * patterns are planner-sized, documents are not) and the scan is a
  * pure per-row function: no shuffle, no join, no per-row regex
  * compilation. Emitted matches are one row per (doc, matched
  * pattern), so the output is bounded by actual hits, not
  * |docs| × |patterns|.
  */
object MultiPattern {

  /** Immutable trie-with-failure-links automaton. Built on the
    * driver (patterns are small); the goto function uses per-node
    * hash maps — pattern alphabets are unbounded (Unicode). */
  final class Automaton private[MultiPattern] (
      val patterns: Array[String],
      gotoFn: Array[Map[Char, Int]],
      fail: Array[Int],
      out: Array[List[Int]]) extends Serializable {

    private def step(state: Int, c: Char): Int = {
      var s = state
      while (s != 0 && !gotoFn(s).contains(c)) s = fail(s)
      gotoFn(s).getOrElse(c, 0)
    }

    /** All matches in `text`: (patternIndex, startOffset) in text
      * order. */
    def findAll(text: String): Seq[(Int, Int)] = {
      if (text == null) return Nil
      val hits = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        var o = out(s)
        while (o.nonEmpty) {
          val p = o.head
          hits += ((p, i - patterns(p).length + 1))
          o = o.tail
        }
        i += 1
      }
      hits.toSeq
    }
  }

  /** Build the automaton: trie, then BFS failure links with output
    * sets merged along failures (so a match of "bc" is reported
    * inside "abcd" even when the trie path sits under "ab"). */
  def build(patterns: Seq[String]): Automaton = {
    val pats = patterns.distinct.toArray
    require(pats.nonEmpty && pats.forall(_.nonEmpty),
      "need non-empty patterns")
    val gotoFn = scala.collection.mutable.ArrayBuffer(
      Map.empty[Char, Int])
    val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for ((p, pi) <- pats.zipWithIndex) {
      var s = 0
      for (c <- p) {
        gotoFn(s).get(c) match {
          case Some(n) => s = n
          case None =>
            gotoFn += Map.empty
            out += Nil
            gotoFn(s) = gotoFn(s) + (c -> (gotoFn.size - 1))
            s = gotoFn.size - 1
        }
      }
      out(s) = pi :: out(s)
    }
    val fail = Array.fill(gotoFn.size)(0)
    val queue = scala.collection.mutable.Queue[Int]()
    for ((_, n) <- gotoFn(0)) queue += n
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      for ((c, n) <- gotoFn(s)) {
        queue += n
        var f = fail(s)
        while (f != 0 && !gotoFn(f).contains(c)) f = fail(f)
        fail(n) = if (gotoFn(f).contains(c) && gotoFn(f)(c) != n)
          gotoFn(f)(c) else 0
        out(n) = out(n) ++ out(fail(n))
      }
    }
    new Automaton(pats, gotoFn.toArray, fail, out.toArray)
  }

  /** Per-process automaton cache: the UDF closure captures only the
    * (small) pattern list; each executor JVM builds the automaton
    * once per distinct pattern set. */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Automaton]()
  private def cached(patterns: Seq[String]): Automaton = {
    var a = cache.get(patterns)
    if (a == null) {
      a = build(patterns)
      cache.put(patterns, a)
    }
    a
  }

  /** One row per (doc, matched pattern): first 0-based match offset
    * and total occurrence count (overlaps included). Docs or
    * patterns with no hits emit nothing. */
  def matches(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[String]): DataFrame = {
    val pats = patterns.distinct
    val scan = udf { text: String =>
      val hits = cached(pats).findAll(text)
      hits.groupBy(_._1).toSeq.map { case (pi, hs) =>
        (pats(pi), hs.map(_._2).min, hs.length.toLong)
      }
    }
    df.select(col(idCol),
        explode(scan(col(textCol))).as("m"))
      .select(col(idCol), col("m._1").as("pattern"),
        col("m._2").as("first_pos").cast("long"),
        col("m._3").as("n_occurrences"))
  }
}
