package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Trained multiclass NB language-ID: learns real decision
  * boundaries (including zh, where the marker heuristic has no
  * coverage at all), deterministic under repartitioning, and
  * strictly beats the heuristic's confusion diagonal on the same
  * held-out docs — the claim that justifies replacing the heuristic
  * in per-language curation chains. */
class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private val markers = Map(
    "en" -> "the quick brown fox jumps over the lazy dog",
    "es" -> "el veloz zorro marron salta sobre el perro",
    "de" -> "der schnelle braune fuchs springt über den hund",
    "fr" -> "le renard brun rapide saute par dessus le chien",
    "zh" -> "敏捷的棕色狐狸跳过懒狗")

  private def corpus(n: Int) = {
    val langs = markers.keys.toSeq.sorted
    (0 until n).map { i =>
      val l = langs(i % langs.size)
      (i.toLong, l, s"${markers(l)} filler text row $i")
    }.toDF("doc_id", "lang", "text")
  }

  test("trained NB identifies all five languages on held-out docs — " +
      "including zh, which the marker heuristic cannot emit at all") {
    val docs = Split.hashSplit(corpus(200), "doc_id",
      Seq("train" -> 0.8, "test" -> 0.2))
    val scored = LangId.trainScore(
        docs.filter(col("split") === "train"),
        docs.filter(col("split") === "test"),
        "doc_id", "text", "lang")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val rows = scored.select("lang", "guess").collect()
    assert(rows.nonEmpty)
    val acc = rows.count(r => r.getString(0) == r.getString(1))
      .toDouble / rows.length
    assert(acc === 1.0, s"trained LID must be exact on marked docs " +
      s"(got $acc over ${rows.length})")
    val zh = rows.filter(_.getString(0) == "zh")
    assert(zh.nonEmpty && zh.forall(_.getString(1) == "zh"),
      "zh diagonal must be populated")
    // the heuristic structurally CANNOT answer zh (no marker list)
    val heur = docs.filter(col("split") === "test")
      .select(col("lang"),
        graft.functions.TextFunctions.langIdHeuristic(col("text"))
          .as("guess"))
      .collect()
    assert(heur.filter(_.getString(0) == "zh")
      .forall(_.getString(1) != "zh"))
    // and the trained diagonal dominates the heuristic's overall
    val heurDiag = heur.count(r => r.getString(0) == r.getString(1))
    val nbDiag = rows.count(r => r.getString(0) == r.getString(1))
    assert(nbDiag > heurDiag,
      s"trained ($nbDiag) must beat heuristic ($heurDiag)")
  }

  test("charNgrams slices by CODE POINT (substr parity with SQL " +
      "engines), caps the prefix, and emits all 1-3-grams") {
    val out = Seq(("ab", 10), ("敏捷x", 10), ("abcd", 2), ("", 10))
      .toDF("t", "c")
      .select(LangId.charNgrams(col("t"), 200).as("g200"),
        LangId.charNgrams(col("t"), 2).as("g2"))
      .collect()
    assert(out(0).getSeq[String](0).toSet === Set("a", "b", "ab"))
    // CJK codepoints are single grams (not UTF-16 halves)
    assert(out(1).getSeq[String](0).toSet ===
      Set("敏", "捷", "x", "敏捷", "捷x", "敏捷x"))
    // cap = 2 sees only the first two codepoints
    assert(out(2).getSeq[String](1).toSet === Set("a", "b", "ab"))
    assert(out(3).getSeq[String](0).isEmpty)
  }

  test("deterministic under repartitioning and exact decimal " +
      "tie-breaks (argmax is max(struct(score DESC, cls DESC)))") {
    val docs = Split.hashSplit(corpus(100), "doc_id",
      Seq("train" -> 0.8, "test" -> 0.2))
    def run(parts: Int) = LangId.trainScore(
        docs.filter(col("split") === "train").repartition(parts),
        docs.filter(col("split") === "test").repartition(parts),
        "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getDouble(3))).toSeq
    assert(run(1) === run(7))
  }

  test("only classes present in training can be guessed (closed " +
      "world), and empty-text docs drop out") {
    val train = Seq((1L, "en", "the fox"), (2L, "en", "the dog"),
      (3L, "de", "der hund")).toDF("doc_id", "lang", "text")
    val score = Seq((10L, "zh", "敏捷的棕色"), (11L, "en", ""))
      .toDF("doc_id", "lang", "text")
    val out = LangId.trainScore(train, score, "doc_id", "text",
      "lang").collect()
    assert(out.length === 1) // the empty doc dropped
    assert(Set("en", "de").contains(out(0).getString(2)))
  }
}
