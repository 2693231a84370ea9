package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Skip-gram pair extraction + negative sampling: window semantics,
  * draw determinism, distribution sanity, and partition invariance. */
class SkipGramSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d"),
    (2L, "x y")).toDF("doc_id", "text")

  test("window=1 pairs are exactly the adjacent-token pairs, both " +
      "directions, no cross-document leakage") {
    val pairs = SkipGram.pairsWithNegatives(docs, "doc_id", "text",
        window = 1, negatives = 0)
      .select(col("doc"), col("center"), col("context")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(pairs === Set(
      (1L, "a", "b"), (1L, "b", "a"), (1L, "b", "c"), (1L, "c", "b"),
      (1L, "c", "d"), (1L, "d", "c"), (2L, "x", "y"), (2L, "y", "x")))
  }

  test("window=2 includes distance-2 contexts and respects doc " +
      "boundaries") {
    val pairs = SkipGram.pairsWithNegatives(docs, "doc_id", "text",
        window = 2, negatives = 0)
      .filter(col("doc") === 1 && col("center") === "a")
      .select(col("context")).collect().map(_.getString(0)).toSet
    assert(pairs === Set("b", "c"))
  }

  test("negatives are drawn deterministically and follow the " +
      "smoothed unigram distribution") {
    // skewed corpus: 'z' dominates; its ^0.75 share should dominate
    // the negative draws but be flatter than raw frequency
    val skew = Seq((1L, (Seq.fill(96)("z") ++ Seq("p", "q", "r", "s"))
      .mkString(" "))).toDF("doc_id", "text")
    val a = SkipGram.pairsWithNegatives(skew, "doc_id", "text",
      window = 1, negatives = 3).collect()
    val b = SkipGram.pairsWithNegatives(skew.repartition(7), "doc_id",
      "text", window = 1, negatives = 3).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val negs = a.map(_.getString(6))
    val zShare = negs.count(_ == "z").toDouble / negs.length
    // raw share 0.96; ^0.75-smoothed share = 96^.75/(96^.75+4) ≈ .885
    assert(zShare > 0.7 && zShare < 0.97, s"z share $zShare")
    // every (pair, slot) got exactly one negative
    val pairCount = SkipGram.pairsWithNegatives(skew, "doc_id",
      "text", window = 1, negatives = 0).count()
    assert(a.length === 3 * pairCount)
  }
}
