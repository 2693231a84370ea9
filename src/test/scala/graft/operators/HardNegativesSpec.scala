package graft.operators

import graft.SparkTestBase

/** Hard-negative mining invariants: positives never surface, queries
  * without positives degrade to plain top-k, ranking matches the
  * exact scan on the non-positive subset. */
class HardNegativesSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.9, 0.1)),
      (3L, Seq(0.8, 0.2)),
      (4L, Seq(0.0, 1.0)),
      (5L, Seq(0.1, 0.9))
    ).toDF("id", "vec")
  }

  test("positives are excluded; next-best negatives fill the ranks") {
    import spark.implicits._
    val queries = Seq((100L, Seq(1.0, 0.0))).toDF("id", "vec")
    // 1 and 2 are the query's known positives → best negative is 3
    val pos = Seq((100L, 1L), (100L, 2L)).toDF("qid", "cid")
    val got = SimilaritySearch.hardNegatives(queries, "id",
      pos, "qid", "cid", corpus, "id", "vec", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(got === Seq((3L, 1), (5L, 2)))
  }

  test("a query with no positives gets plain top-k") {
    import spark.implicits._
    val queries = Seq((200L, Seq(0.0, 1.0))).toDF("id", "vec")
    val pos = Seq.empty[(Long, Long)].toDF("qid", "cid")
    val got = SimilaritySearch.hardNegatives(queries, "id",
      pos, "qid", "cid", corpus, "id", "vec", k = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(got === Seq(4L, 5L))
  }
}
