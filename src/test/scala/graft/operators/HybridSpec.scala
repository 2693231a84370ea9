package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 + DBSF semantics (SURVEY §5: "DBSF fusion (V5)"). */
class HybridSpec extends SparkTestBase {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana cherry durian elderberry"),
      (3L, "fig grape honeydew kiwi lemon"),
      (4L, "apple apple apple apple apple")).toDF("id", "text")
  }

  test("bm25: matching terms score, idf favors rare terms") {
    import spark.implicits._
    val queries = Seq((10L, "apple cherry")).toDF("qid", "qtext")
    val got = Hybrid.bm25(corpus, "id", "text", queries, "qid", "qtext")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // docs 1, 2, 4 share terms; doc 3 shares none
    assert(got.keySet === Set(1L, 2L, 4L))
    // doc 1 matches both query terms -> highest score
    assert(got(1L) > got(2L) && got(1L) > got(4L))
    assert(got.values.forall(_ > 0))
  }

  test("prfExpandedBm25 widens recall to a document sharing no " +
      "literal query term, and never expands with a query term") {
    import spark.implicits._
    // "solar" retrieves docs 1-2; both contain "photovoltaic" twice,
    // which doc 3 also contains although it never mentions "solar".
    // After feedback expansion doc 3 must score; doc 4 (unrelated)
    // must not. The Σtf·⌊idf·1e9⌋ weight must prefer "photovoltaic"
    // (fbtf 4 × idf ln(1+1.5/3.5)) both over the ubiquitous low-idf
    // "common" and over the rare-but-once terms like "energy"
    // (fbtf 1 × idf ln(1+3.5/1.5)).
    val docs = Seq(
      (1L, "solar panel photovoltaic photovoltaic common"),
      (2L, "solar energy photovoltaic photovoltaic common"),
      (3L, "photovoltaic efficiency research common"),
      (4L, "gravel driveway maintenance common")).toDF("id", "text")
    val queries = Seq((10L, "solar")).toDF("qid", "qtext")
    val got = Hybrid.prfExpandedBm25(docs, "id", "text", queries,
        "qid", "qtext", fbDocs = 2, fbTerms = 1)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got.contains(3L), "expansion must reach the no-term doc")
    assert(!got.contains(4L), "unrelated doc must stay unmatched")
    // first-pass docs still outrank the expansion-only doc
    assert(got(1L) > got(3L) && got(2L) > got(3L))
  }

  test("bm25 hand-check on a single-term query") {
    import spark.implicits._
    val queries = Seq((10L, "durian")).toDF("qid", "qtext")
    val got = Hybrid.bm25(corpus, "id", "text", queries, "qid", "qtext")
      .collect()
    assert(got.length === 1 && got.head.getLong(1) === 2L)
    // N=4, df=1: idf = ln(1 + 3.5/1.5); tf=1, dl=4, avgdl=4.5
    val idf = math.log(1.0 + 3.5 / 1.5)
    val expected = idf * (1.0 * 2.2) /
      (1.0 + 1.2 * (1 - 0.75 + 0.75 * 4.0 / 4.5))
    assert(math.abs(got.head.getDouble(2) - expected) < 1e-9)
  }

  test("dbsf fusion: doc strong in both branches wins") {
    import spark.implicits._
    val dense = Seq(
      (1L, 101L, 0.9), (1L, 102L, 0.8), (1L, 103L, 0.1))
      .toDF("qid", "doc", "score")
    val sparse = Seq(
      (1L, 101L, 12.0), (1L, 104L, 11.0), (1L, 103L, 1.0))
      .toDF("qid", "doc", "score")
    val fused = Hybrid.dbsfFuse(dense, sparse, k = 4)
      .orderBy("rnk").collect()
    // 101 is top in both branches -> rank 1
    assert(fused.head.getLong(1) === 101L)
    // single-branch docs (102 dense-only, 104 sparse-only) still rank
    assert(fused.map(_.getLong(1)).toSet === Set(101L, 102L, 103L, 104L))
  }

  test("hybridSearch end-to-end with mock embeddings") {
    import spark.implicits._
    import graft.functions.VectorFunctions
    val index = corpus.withColumn("vec",
      VectorFunctions.mockEmbedding(col("text"), 16))
    val queries = Seq((7L, "apple cherry")).toDF("qid", "qtext")
      .withColumn("qvec", VectorFunctions.mockEmbedding(col("qtext"), 16))
    val got = Hybrid.hybridSearch(index, "id", "text", "vec",
      queries, "qid", "qtext", "qvec", k = 3)
    assert(got.count() === 3)
    assert(got.select("qid").distinct().head().getLong(0) === 7L)
  }

  test("rrfFuse: hand-checked 1/(60+r) sums, absent branch adds 0") {
    import spark.implicits._
    val dense = Seq(
      (1L, 101L, 0.9), (1L, 102L, 0.8), (1L, 103L, 0.1))
      .toDF("qid", "doc", "score")
    val sparse = Seq(
      (1L, 101L, 12.0), (1L, 104L, 11.0), (1L, 103L, 1.0))
      .toDF("qid", "doc", "score")
    val got = Hybrid.rrfFuse(dense, sparse, k = 4)
      .orderBy("rnk")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toList
    // dense ranks: 101→1, 102→2, 103→3; sparse: 101→1, 104→2, 103→3
    assert(got === List(
      101L -> (1.0 / 61 + 1.0 / 61),
      103L -> (1.0 / 63 + 1.0 / 63),
      102L -> 1.0 / 62,   // ties 104 on score; doc id breaks the tie
      104L -> 1.0 / 62))
  }

  test("rrfFuse: rank ties within a branch break on doc id") {
    import spark.implicits._
    val dense = Seq((1L, 5L, 0.5), (1L, 3L, 0.5))
      .toDF("qid", "doc", "score")
    val sparse = Seq((1L, 9L, 1.0)).toDF("qid", "doc", "score")
    val got = Hybrid.rrfFuse(dense, sparse, k = 3)
      .orderBy("rnk").collect().map(_.getLong(1)).toList
    // doc 3 gets dense rank 1 (same score as 5, lower id), then 9
    // (sparse rank 1 = 1/61) beats 5 (dense rank 2 = 1/62)
    assert(got === List(3L, 9L, 5L))
  }

  test("phraseMatches: anchor intersection counts overlapping " +
      "matches and handles repeated phrase words (r5)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),      // 'a b a' matches at 0 AND 2 (overlap)
      (2L, "a b c a b"),      // no 'a b a'
      (3L, "x a b a y"),      // one match at 1
      (4L, "b a a b a")       // one match at 2
    ).toDF("doc_id", "text")
    val got = Hybrid.phraseMatches(docs, "doc_id", "text", "a b a")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((1L, 2L, 0L), (3L, 1L, 1L), (4L, 1L, 2L)))
    // single-word phrase degenerates to term positions
    val one = Hybrid.phraseMatches(docs, "doc_id", "text", "c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(one === Array((2L, 1L, 2L)))
  }
}
