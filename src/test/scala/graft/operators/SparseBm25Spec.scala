package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** fastembed `Qdrant/bm25` parity surface (V4 sparse embedding):
  * tokenization, token ids, and the document-side weight formula
  * (k=1.2, b=0.75, avg_len=256). The mmh3 core is separately
  * SMHasher-vector-checked in HashingSpec; here the composition is
  * pinned against hand-computed values of the published formula. */
class SparseBm25Spec extends SparkTestBase {

  test("tokenization: lowercase, \\w-split, NLTK stopwords dropped") {
    import spark.implicits._
    val got = Seq("The quick brown foxes jump over the lazy dog!",
      "Don't stop-believing; it's ALL good")
      .toDF("s")
      .select(SparseBm25.tokens(col("s")))
      .collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("quick", "brown", "foxes", "jump", "lazy",
      "dog"))
    // don't -> don|t (both stopwords); it's -> it|s (both stopwords);
    // all -> stopword; hyphens split
    assert(got(1) === Seq("stop", "believing", "good"))
  }

  test("document weights match the fastembed formula by hand") {
    import spark.implicits._
    val got = SparseBm25.embed(
      Seq((1L, "The quick brown foxes jump over the quick lazy dog"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .head()
    // kept tokens: quick,brown,foxes,jump,quick,lazy,dog -> dl=7
    // tf(quick)=2, others 1
    val dl = 7.0
    def w(tf: Double) =
      tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / 256.0))
    val indices = got.getSeq[Long](2)
    val values = got.getSeq[Double](3)
    assert(got.getLong(1) === 6)          // 6 distinct terms
    assert(indices === indices.sorted)    // ascending id order
    // the id of "quick" carries weight w(2); everything else w(1)
    val quickId = spark.range(1)
      .select(SparseBm25.fastembedTokenId(lit("quick"))).head().getLong(0)
    val byId = indices.zip(values).toMap
    assert(math.abs(byId(quickId) - w(2)) < 2e-9)
    (byId - quickId).values.foreach(v =>
      assert(math.abs(v - w(1)) < 2e-9))
    // ids are |mmh3|: non-negative, 32-bit range
    assert(indices.forall(i => i >= 0 && i <= 2147483648L))
  }

  test("token ids are |mmh3| (fastembed compute_token_id)") {
    import spark.implicits._
    val r = Seq("quick", "dog").toDF("s")
      .select(graft.functions.Hashing.murmur3(col("s")).cast("long")
        .as("signed"), SparseBm25.fastembedTokenId(col("s")).as("id"))
      .collect()
    r.foreach(row =>
      assert(row.getLong(1) === math.abs(row.getLong(0))))
  }

  test("embedStemmed counts term frequencies over Snowball stems " +
      "(full fastembed pipeline, r5)") {
    import spark.implicits._
    // 'running' and 'runs' both stem to 'run', so tf(run)=2 and the
    // stemmed embedding has ONE term where the unstemmed has two;
    // 'quickly' stems to 'quick' (step 1c y->i, step 2 li-deletion).
    val df = Seq((1L, "running runs quickly")).toDF("doc_id", "text")
    val plain = SparseBm25.embed(df, "doc_id", "text").head()
    val stemmed = SparseBm25.embedStemmed(df, "doc_id", "text").head()
    assert(plain.getLong(1) === 3)   // running, runs, quickly
    assert(stemmed.getLong(1) === 2) // run (tf=2), quick
    val runId = spark.range(1)
      .select(SparseBm25.fastembedTokenId(lit("run"))).head().getLong(0)
    val quickId = spark.range(1)
      .select(SparseBm25.fastembedTokenId(lit("quick"))).head().getLong(0)
    val byId = stemmed.getSeq[Long](2).zip(stemmed.getSeq[Double](3)).toMap
    assert(byId.keySet === Set(runId, quickId),
      "indices must be hashes of the STEMS")
    // dl counts tokens (3); tf(run)=2, tf(quick)=1
    def w(tf: Double) =
      tf * (1.2 + 1.0) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * 3.0 / 256.0))
    assert(math.abs(byId(runId) - w(2)) < 2e-9)
    assert(math.abs(byId(quickId) - w(1)) < 2e-9)
  }
}
