package graft.operators

import graft.SparkTestBase

/** BPE merge learning ([[Tokenizers.trainBpe]]) against hand-derived
  * merge sequences (worked on paper — the byte-level analog of the
  * Sennrich et al. 2016 §3.2 example). */
class BpeTrainSpec extends SparkTestBase {

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("merge order on a worked example: counts, then lexicographic " +
      "tie-break, with the Ġ word marker") {
    // "ab ab ac" → types [a,b]:1, [Ġ,a,b]:1, [Ġ,a,c]:1
    // pairs: (a,b)=2, (Ġ,a)=2, (a,c)=1 → tie → (a,b) < (Ġ,a)
    // then all pairs =1 → (a,c); then (Ġ,ab) < (Ġ,ac)
    val merges = Tokenizers.trainBpe(corpus("ab ab ac"), "text",
      numMerges = 3)
    assert(merges === Seq(("a", "b"), ("a", "c"), ("Ġ", "ab")))
  }

  test("pair counts are weighted by word-type frequency") {
    // "aa aa aa ab": types [a,a]:1, [Ġ,a,a]:2, [Ġ,a,b]:1
    // (a,a)=3 ties (Ġ,a)=3 → (a,a) first; then (Ġ,aa)=2 wins
    val merges = Tokenizers.trainBpe(corpus("aa aa aa ab"), "text",
      numMerges = 2)
    assert(merges === Seq(("a", "a"), ("Ġ", "aa")))
  }

  test("training stops early when no pairs remain") {
    val merges = Tokenizers.trainBpe(corpus("ab ab"), "text",
      numMerges = 50)
    // after (a,b) and (Ġ,ab) every type is a single symbol
    assert(merges === Seq(("a", "b"), ("Ġ", "ab")))
  }

  test("learned merges drive the tokenizer: frequent training words " +
      "collapse to whole tokens, unseen words stay decomposed") {
    val train = corpus(Array.fill(30)("stream loader stream")
      .mkString(" "))
    val merges = Tokenizers.trainBpe(train, "text", numMerges = 30)
    val tok = new Tokenizers.ByteLevelBpeTokenizer(merges)
    val toks = tok.tokenize("stream loader zzz").toSeq
    assert(toks.take(2) === Seq("stream", "Ġloader"),
      s"trained words must be single tokens, got $toks")
    assert(toks.length > 3, "unseen word must split into pieces")
    assert(tok.detokenize(toks) === "stream loader zzz",
      "byte-level BPE round-trips regardless of merges")
  }

  test("fertility is monotone in distance from the training " +
      "distribution: seen words whole, unseen words decomposed") {
    val rows = graft.queries.FixtureQueries
      .q144BpeFertility(spark, "").collect()
      .map(r => r.getAs[String]("probe") ->
        ((r.getAs[Double]("fertility"), r.getAs[Long]("n_whole_words"),
          r.getAs[Long]("n_words")))).toMap
    val (fSeen, wSeen, nSeen) = rows("a_seen")
    val (fMorph, _, _) = rows("b_morph")
    val (fUnseen, wUnseen, _) = rows("c_unseen")
    assert(fSeen === 1.0, "every training word must stay whole")
    assert(wSeen === nSeen)
    assert(fSeen < fMorph && fMorph < fUnseen,
      s"fertility must be monotone: $fSeen, $fMorph, $fUnseen")
    assert(wUnseen === 0L, "unseen vocabulary must not match whole")
  }

  test("maxTypes pruning keeps the highest-frequency types and stays " +
      "deterministic") {
    val df = corpus("aa aa aa aa bb bb cc")
    val pruned = Tokenizers.trainBpe(df, "text", numMerges = 1,
      maxTypes = 2)
    // kept types: " aa":3 and one of count-1 ties by word order —
    // ("Ġaa" marked form) dominates the pair counts either way
    assert(pruned.head === (("a", "a")))
  }
}
