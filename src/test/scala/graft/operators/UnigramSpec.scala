package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unigram tokenizer invariants: hand-checked Viterbi argmin,
  * longest-match tie order, char coverage, EM usage accounting, and
  * partition invariance. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  test("segment finds the min-cost path on a hand vocab") {
    val words = Seq(("abab", 2L), ("abc", 1L)).toDF("w", "wcnt")
    val vocab = Seq(("a", 1.0), ("b", 1.2), ("c", 2.0), ("ab", 1.5),
      ("bab", 2.2)).toDF("piece", "cost")
    val out = Unigram.segment(words, vocab).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getString(4))))
      .toMap
    // abab: a+b+a+b=4.4, ab+ab=3.0, a+bab=3.2 -> ab ab
    assert(out("abab") === ((3.0, "ab ab")))
    // abc: ab+c=3.5 beats a+b+c=4.2
    assert(out("abc") === ((3.5, "ab c")))
  }

  test("equal-cost ties pick the longer final piece (smaller start)") {
    // 'aa': a+a = 2.0 and aa = 2.0 tie -> aa (frm 0 < frm 1)
    val words = Seq(("aa", 1L)).toDF("w", "wcnt")
    val vocab = Seq(("a", 1.0), ("aa", 2.0)).toDF("piece", "cost")
    val out = Unigram.segment(words, vocab).head()
    assert(out.getString(4) === "aa")
    assert(out.getLong(3) === 1L)
  }

  test("seedVocab covers every single char and ranks multi-char " +
      "pieces by frequency; segment+emStep conserve usage mass") {
    val docs = Seq.fill(8)("the cat sat the mat the")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = Unigram.words(docs, "text")
    val vocab = Unigram.seedVocab(w, minCount = 4, maxSize = 32)
    val pieces = vocab.select("piece").collect()
      .map(_.getString(0)).toSet
    assert(Set("t", "h", "e", "c", "a", "s", "m").subsetOf(pieces))
    assert(pieces.contains("the")) // frequent multi-char substring
    val seg = Unigram.segment(w, vocab)
    // every word segments fully: pieces re-concatenate to the word
    seg.collect().foreach { r =>
      assert(r.getString(4).replace(" ", "") === r.getString(0))
    }
    val em = Unigram.emStep(w, vocab)
    // usage mass = total tokens' piece count: each word's n_pieces
    // times its count
    val massFromSeg = seg.select(
      sum(col("n_pieces") * col("wcnt"))).head().getLong(0)
    val massFromEm = em.select(sum(col("usage"))).head().getLong(0)
    assert(massFromEm === massFromSeg)
    // 'the' should dominate usage after the E-step
    val theUsage = em.filter(col("piece") === "the")
      .select("usage").head().getLong(0)
    assert(theUsage === 24L) // 3 per doc x 8 docs
  }

  test("segmentation is partition-invariant") {
    val docs = (0 until 30).map(i =>
      (i.toLong, s"alpha beta gamma delta word$i")).toDF("doc_id",
      "text")
    val w = Unigram.words(docs, "text")
    val vocab = Unigram.seedVocab(w)
    val a = Unigram.segment(w, vocab).orderBy("w").collect()
    val b = Unigram.segment(w.repartition(13), vocab).orderBy("w")
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("a pruned vocab routes around unreachable positions; a " +
      "fully uncoverable word surfaces as (inf, 0 pieces, '')") {
    val words = Seq(("abc", 1L), ("xyz", 1L)).toDF("w", "wcnt")
    // no 'b' and no piece ending at position 2 of abc except 'ab';
    // 'c' closes it — path must route a|b-free: ab + c
    val vocab = Seq(("a", 1.0), ("ab", 1.5), ("c", 2.0))
      .toDF("piece", "cost")
    val out = Unigram.segment(words, vocab).orderBy("w").collect()
    val abc = out(0)
    assert(abc.getString(4) === "ab c")
    assert(abc.getDouble(2) === 3.5)
    // xyz has zero vocab coverage
    val xyz = out(1)
    assert(xyz.getDouble(2).isPosInfinity)
    assert(xyz.getLong(3) === 0L && xyz.getString(4) === "")
  }

  test("the second E-step under an emStep vocab stays segmentable " +
      "and never inflates piece counts") {
    val docs = Seq.fill(6)("spark chunk merge spark chunk")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = Unigram.words(docs, "text")
    val v1 = Unigram.seedVocab(w, minCount = 2, maxSize = 64)
    val v2 = Unigram.emStep(w, v1)
    val s1 = Unigram.segment(w, v1).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val s2 = Unigram.segment(w, v2).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getDouble(2))))
      .toMap
    s2.foreach { case (word, (n2, cost)) =>
      assert(!cost.isInfinity, s"$word unsegmentable after EM")
      assert(n2 <= s1(word) + 1, s"$word inflated: $n2 vs ${s1(word)}")
    }
  }
}
