package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance-weight invariants: target-like text outweighs
  * source-only text, weights are a pure function of content (stable
  * under repartitioning), and token counts are exact. */
class ImportanceSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta alpha beta", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "gamma delta gamma delta", false),
      (5L, "alpha beta gamma delta", false))
      .toDF("doc_id", "text", "tgt")
  }

  test("target-vocabulary documents get higher log-weights") {
    val got = Importance.dsirWeights(corpus, "doc_id", "text",
        col("tgt"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 5 (half target vocab) sits strictly between pure-target
    // doc 1 and pure-source doc 3
    assert(got(1L) > got(5L), s"${got(1L)} !> ${got(5L)}")
    assert(got(5L) > got(3L), s"${got(5L)} !> ${got(3L)}")
    // pure-target text scores above the corpus baseline, pure-source
    // (never in target) below it
    assert(got(1L) > 0.0 && got(3L) < 0.0)
  }

  test("weights are content-pure: stable under repartitioning") {
    val base = Importance.dsirWeights(corpus, "doc_id", "text",
        col("tgt"), buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val shuffled = Importance.dsirWeights(corpus.repartition(7),
        "doc_id", "text", col("tgt"), buckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(base.toSeq === shuffled.toSeq)
  }

  test("token counts are exact") {
    val got = Importance.dsirWeights(corpus, "doc_id", "text",
        col("tgt"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L))
  }
}
