package graft.operators

import graft.SparkTestBase

/** SemDeDup invariants: within-cell keep-first semantics, cell
  * isolation (identical vectors in different cells both survive), and
  * totality (every input row appears with a verdict). */
class SemDedupSpec extends SparkTestBase {

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, 0, Seq(1.0, 0.0)),  // cell 0 representative
      (2L, 0, Seq(1.0, 0.0)),  // exact duplicate of 1 → dropped
      (3L, 0, Seq(0.0, 1.0)),  // orthogonal → kept
      (4L, 1, Seq(1.0, 0.0)),  // identical to 1 but another cell → kept
      (5L, 0, Seq(0.9999, 0.0141)) // near-dup of 1 (cos ≈ 0.9999) → dropped
    ).toDF("vec_id", "cell_id", "vec")
  }

  test("keep-first within cells, isolation across cells, totality") {
    val got = SimilaritySearch
      .semDedup(vecs, "vec_id", "vec", "cell_id", threshold = 0.99)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> true,
      4L -> true, 5L -> false))
  }

  test("threshold 1-above-max keeps everything") {
    val got = SimilaritySearch
      .semDedup(vecs, "vec_id", "vec", "cell_id", threshold = 1.000001)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.values.forall(identity) && got.size === 5)
  }
}
