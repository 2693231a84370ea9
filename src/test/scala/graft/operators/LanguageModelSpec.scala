package graft.operators

import graft.SparkTestBase

/** Bigram-LM surprisal invariants: exact hand-computed values under
  * the add-one-smoothed corpus LM, the discriminative property a
  * perplexity filter relies on, and the no-bigram edge. */
class LanguageModelSpec extends SparkTestBase {

  test("mean surprisal matches the hand-computed add-one bigram LM") {
    import spark.implicits._
    // corpus: a:4 b:4 x:1 q:1 z:1 w:1 → V=6
    // bigram counts: (a,b)=4, (b,a)=2, (x,q)=(q,z)=(z,w)=1
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b a b"), (3L, "x q z w"))
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val sAB = -math.log((4.0 + 1) / (4 + 6)) // -ln(0.5)
    val sBA = -math.log((2.0 + 1) / (4 + 6)) // -ln(0.3)
    // the engine truncates each ln at 9 decimals → ≤1.5e-9 per term
    val exp12 = (2 * sAB + sBA) / 3
    assert(got(1L)._1 === 3L && got(2L)._1 === 3L)
    assert(math.abs(got(1L)._2 - exp12) < 5e-9)
    assert(got(1L)._2 === got(2L)._2)
    val exp3 = -math.log(2.0 / 7.0) // each d3 bigram: (1+1)/(1+6)
    assert(math.abs(got(3L)._2 - exp3) < 5e-9)
  }

  test("CJK text tokenizes character-level: a space-free sentence " +
      "yields per-character bigrams, not one giant token (r5)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "这是测试" → tokens 这/是/测/试 → 3 bigrams; whitespace-only
    // tokenization would see ONE token and emit no bigrams at all
    val docs = Seq(
      (1L, "这是测试"),
      (2L, "plain english words here"),
      (3L, "mixed 混合 text"))
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.cjkAwareTokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(toks(1L) === Seq("这", "是", "测", "试"))
    assert(toks(2L) === Seq("plain", "english", "words", "here"))
    assert(toks(3L) ===
      Seq("mixed", "混", "合", "text"))
    val got = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 3L, "4 CJK chars must give 3 bigrams")
    assert(got(3L) === 3L)
  }

  test("improbable sequences score higher than corpus-typical ones") {
    import spark.implicits._
    val typical = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val weird = Seq((99L, "mat the on sat cat the"))
    val got = LanguageModel.bigramSurprisal(
      (typical ++ weird).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(99L) > got(1L),
      s"reordered doc ${got(99L)} should out-surprise typical ${got(1L)}")
  }

  test("documents without bigrams are absent") {
    import spark.implicits._
    val docs = Seq((1L, "one"), (2L, "two words")).toDF("doc_id", "text")
    val ids = LanguageModel.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }

  test("perplexity bucketing: ntile thirds per language, and the " +
      "no-sort cutoff path reproduces them (r6)") {
    import spark.implicits._
    // 9 docs per language with distinct scores → exact thirds
    val scored = (for (l <- Seq("en", "de"); i <- 1 to 9)
      yield (l.hashCode.toLong * 100 + i, l, i * 1.5 + l.length))
      .toDF("doc_id", "lang", "score")
    val exact = LanguageModel.perplexityBuckets(
        scored, "doc_id", "lang", "score")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // per language: lowest 3 scores head, middle 3, highest 3 tail
    for (l <- Seq("en", "de"); i <- 1 to 9) {
      val want = if (i <= 3) "head" else if (i <= 6) "middle" else "tail"
      assert(exact(l.hashCode.toLong * 100 + i) === want,
        s"lang $l rank $i")
    }
    val cuts = LanguageModel.approxBucketCutoffs(scored, "lang", "score")
    val byCut = LanguageModel.assignByCutoffs(
        scored, "lang", "score", cuts)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(byCut === exact,
      "cutoff assignment must reproduce ntile thirds on distinct scores")
  }
}
