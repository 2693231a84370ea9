package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Hand-computed Gopher §A1.2 repetition signals over planted docs
  * (values derived on paper — see each case's comment). */
class RepetitionSpec extends SparkTestBase {

  private def sig(text: String): Row = {
    import spark.implicits._
    Repetition.signals(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").head()
  }

  test("duplicate line and paragraph fractions (occurrences and chars)") {
    // lines: "first line repeated"×3 (len 19) + "second line once"
    // (len 16), blank excluded; paras (\n\n): two distinct.
    val r = sig("first line repeated\nfirst line repeated\nsecond " +
      "line once\n\nfirst line repeated")
    assert(r.getAs[Double]("dup_line_frac") === 2.0 / 4.0)
    assert(r.getAs[Double]("dup_line_char_frac") === 57.0 / 73.0)
    assert(r.getAs[Double]("dup_para_frac") === 0.0)
    assert(r.getAs[Double]("dup_para_char_frac") === 0.0)
  }

  test("duplicate paragraphs: occurrence and char fractions") {
    // paras: "para block one"×2 (len 14) + "para block two".
    val r = sig("para block one\n\npara block one\n\npara block two")
    assert(r.getAs[Double]("dup_para_frac") === 1.0 / 3.0)
    assert(r.getAs[Double]("dup_para_char_frac") === 28.0 / 42.0)
  }

  test("top n-gram char mass and overlapping dup-gram coverage on " +
      "an alternating 2-word text") {
    // "one two"×4 of 7 bigrams; text len 31; every word position is
    // covered by a duplicated 5-gram AND 6-gram; no 7-gram repeats.
    val r = sig("one two one two one two one two")
    assert(r.getAs[Double]("top2_frac") === 28.0 / 31.0)
    // 3-gram tie ("one two one"×3, "two one two"×3) broken by text
    assert(r.getAs[Double]("top3_frac") === 33.0 / 31.0)
    assert(r.getAs[Double]("dup5_frac") === 1.0)
    assert(r.getAs[Double]("dup6_frac") === 1.0)
    assert(r.getAs[Double]("dup7_frac") === 0.0)
  }

  test("coverage counts overlapping duplicated grams once") {
    // "a b c d e f g" repeats at word 0 and 7: three dup 5-grams per
    // copy cover positions 0..6 and 7..13 — 14 of 17 unit-length
    // words, NOT 3×5×2/17 (the double-counting shortcut exceeds it).
    val r = sig("a b c d e f g a b c d e f g h i j")
    assert(r.getAs[Double]("dup5_frac") === 14.0 / 17.0)
    assert(r.getAs[Double]("dup6_frac") === 14.0 / 17.0)
    assert(r.getAs[Double]("dup7_frac") === 14.0 / 17.0)
    assert(r.getAs[Double]("dup8_frac") === 0.0)
    assert(r.getAs[Double]("top2_frac") === 6.0 / 33.0)
    assert(r.getAs[Double]("top4_frac") === 14.0 / 33.0)
  }

  test("single-line doc has zero line/para repetition and null-safe " +
      "gram signals") {
    val r = sig("just one line")
    assert(r.getAs[Double]("dup_line_frac") === 0.0)
    assert(r.getAs[Double]("dup_para_frac") === 0.0)
    (5 to 10).foreach(n =>
      assert(r.getAs[Double](s"dup${n}_frac") === 0.0))
  }
}
