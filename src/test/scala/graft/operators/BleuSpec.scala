package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** [[Eval.bleuStats]] — clipped n-gram precision statistics, pinned
  * against hand-worked examples (including the Papineni et al. 2002
  * "the the the…" clipping case), plus the driver-side fold into full
  * brevity-penalized corpus BLEU from the emitted integers.
  */
class BleuSpec extends SparkTestBase {

  import spark.implicits._

  private def stats(pairs: Seq[(Int, String, String)]) =
    Eval.bleuStats(
      pairs.toDF("id", "cand", "ref"), "cand", "ref")
      .orderBy("id")

  test("clipping: candidate repeats are capped at reference counts") {
    // Papineni §2.1: cand = 7×"the", ref has "the" twice → m1 = 2
    val r = stats(Seq((1,
      "the the the the the the the",
      "the cat is on the mat"))).collect().head
    assert(r.getAs[Long]("cand_len") == 7 &&
      r.getAs[Long]("ref_len") == 6)
    assert(r.getAs[Long]("m1") == 2 && r.getAs[Long]("t1") == 7)
    assert(r.getAs[Long]("m2") == 0 && r.getAs[Long]("t2") == 6)
    assert(r.getAs[Long]("m3") == 0 && r.getAs[Long]("t3") == 5)
    assert(r.getAs[Long]("m4") == 0 && r.getAs[Long]("t4") == 4)
    assert(r.getAs[Double]("p1") == 2.0 / 7)
    assert(r.getAs[Double]("bleu_nobp") == 0.0)
  }

  test("identical strings score 1.0 on every precision") {
    val r = stats(Seq((1, "a b c d e", "a b c d e"))).collect().head
    assert((1 to 4).forall(n =>
      r.getAs[Double](s"p$n") == 1.0))
    assert(r.getAs[Long]("t1") == 5 && r.getAs[Long]("t4") == 2)
    assert(r.getAs[Double]("bleu_nobp") == 1.0)
  }

  test("multiset clip, not set intersect: cand 'a a b' vs 'a b a b'") {
    // m1 = min(2,2) for a + min(1,2) for b = 3; cand 2-grams
    // {a a, a b}: "a a" absent in ref, "a b" appears twice → m2 = 1
    val r = stats(Seq((1, "a a b", "a b a b"))).collect().head
    assert(r.getAs[Long]("m1") == 3 && r.getAs[Long]("t1") == 3)
    assert(r.getAs[Long]("m2") == 1 && r.getAs[Long]("t2") == 2)
    assert(r.getAs[Long]("t4") == 0 && r.isNullAt(r.fieldIndex("p4")))
    assert(r.isNullAt(r.fieldIndex("bleu_nobp")))
  }

  test("tokens are whitespace units — no cross-token gram aliasing") {
    // with a bare concat joiner, cand ("ab","c") would alias ref
    // ("a","bc") at the 2-gram level; the  joiner must not
    val r = stats(Seq((1, "ab c", "a bc"))).collect().head
    assert(r.getAs[Long]("m1") == 0 && r.getAs[Long]("m2") == 0)
  }

  test("corpus BLEU folds from the emitted integers (hand value)") {
    val rows = stats(Seq(
      (1, "a b c d e", "a b c d e"),
      (2, "the the the the the the the", "the cat is on the mat")))
      .collect()
    def s(f: Row => Long) = rows.map(f).sum
    val (c, r) = (s(_.getAs[Long]("cand_len")), s(_.getAs[Long]("ref_len")))
    val ps = (1 to 4).map { n =>
      s(_.getAs[Long](s"m$n")).toDouble / s(_.getAs[Long](s"t$n"))
    }
    val bp = if (c >= r) 1.0 else math.exp(1.0 - r.toDouble / c)
    val bleu = bp * math.exp(ps.map(math.log).sum / 4)
    // hand-worked: Σm/Σt = 7/12, 4/10, 3/8, 2/6; c=12 ≥ r=11 → BP=1;
    // (7/240)^¼ = e^(−3.53473/4) ≈ 0.41326
    assert(math.abs(bleu - 0.41326) < 1e-4, s"corpus BLEU $bleu")
  }

  private def rouge(pairs: Seq[(Int, String, String)]) =
    Eval.rougeStats(
      pairs.toDF("id", "cand", "ref"), "cand", "ref")
      .orderBy("id")

  test("rougeStats: hand-worked precision/recall/F1 for both n") {
    // cand "a b c", ref "a b d e": unigram overlap {a,b} → m1=2,
    // c1=3, r1=4; bigram overlap {"a b"} → m2=1, c2=2, r2=3
    val r = rouge(Seq((1, "a b c", "a b d e"))).collect().head
    assert(r.getAs[Long]("m1") == 2 &&
      r.getAs[Long]("c1") == 3 && r.getAs[Long]("r1") == 4)
    assert(r.getAs[Double]("p1") == 2.0 / 3 &&
      r.getAs[Double]("rec1") == 0.5)
    val f1 = 2.0 * (2.0 / 3) * 0.5 / (2.0 / 3 + 0.5)
    assert(r.getAs[Double]("f1") == f1)
    assert(r.getAs[Long]("m2") == 1 &&
      r.getAs[Long]("c2") == 2 && r.getAs[Long]("r2") == 3)
    assert(r.getAs[Double]("p2") == 0.5 &&
      r.getAs[Double]("rec2") == 1.0 / 3)
  }

  test("rougeStats: clipping caps candidate repeats at ref counts") {
    // 7×"the" vs 2×"the" in ref → m1 = 2, recall = 2/6
    val r = rouge(Seq((1, "the the the the the the the",
      "the cat is on the mat"))).collect().head
    assert(r.getAs[Long]("m1") == 2 && r.getAs[Long]("c1") == 7 &&
      r.getAs[Long]("r1") == 6)
    assert(r.getAs[Double]("rec1") == 2.0 / 6)
  }

  test("rougeStats: zero-overlap F1 is null, not NaN or zero") {
    val r = rouge(Seq((1, "x y", "a b"))).collect().head
    assert(r.getAs[Long]("m1") == 0)
    assert(r.getAs[Double]("p1") == 0.0 &&
      r.getAs[Double]("rec1") == 0.0)
    assert(r.isNullAt(r.fieldIndex("f1")))
  }

  test("rougeStats: identical strings are perfect on every metric") {
    val r = rouge(Seq((1, "a b c d", "a b c d"))).collect().head
    for (c <- Seq("p1", "rec1", "f1", "p2", "rec2", "f2"))
      assert(r.getAs[Double](c) == 1.0, c)
  }
}
