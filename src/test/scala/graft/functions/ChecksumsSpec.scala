package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Checksums]] — Luhn and ISO 7064 mod-97 against published test
  * vectors, the check-digit constructors as round-trip properties,
  * and the checksum-gated redaction semantics. */
class ChecksumsSpec extends SparkTestBase {
  import spark.implicits._

  private def bools(c: Seq[String],
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Boolean] =
    c.toDF("s").select(f(col("s"))).collect().map(_.getBoolean(0)).toSeq

  test("Luhn: published vectors") {
    // 79927398713 is the worked example in the Luhn literature;
    // 4532015112830366 a standard valid test PAN; off-by-one digits
    // must fail.
    assert(bools(Seq("79927398713", "4532015112830366"),
      Checksums.luhnValid) === Seq(true, true))
    assert(bools(Seq("79927398710", "4532015112830367",
      "1234567812345678"), Checksums.luhnValid) ===
      Seq(false, false, false))
  }

  test("luhnCheckDigit round-trips: body || digit is always valid, " +
      "any other digit never is") {
    val bodies = Seq("7992739871", "453201511283036", "000000000000",
      "999999999999999", "1")
    val rows = bodies.toDF("b")
      .select(col("b"), Checksums.luhnCheckDigit(col("b")).as("cd"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    for ((b, cd) <- rows) {
      val ok = bools(Seq(b + cd.toString), Checksums.luhnValid)
      assert(ok === Seq(true), s"body=$b cd=$cd")
      val bad = bools((0L to 9L).filter(_ != cd)
        .map(d => b + d.toString), Checksums.luhnValid)
      assert(bad.forall(!_), s"body=$b non-check digits must fail")
    }
  }

  test("IBAN: published vectors incl. letters in the BBAN") {
    // DE75... is the ECB example IBAN; GB82 WEST... the ISO 13616
    // worked example (letters in the bank code exercise expansion).
    assert(bools(Seq("DE75512108001245126199",
      "GB82WEST12345698765432"), Checksums.ibanValid) ===
      Seq(true, true))
    assert(bools(Seq("DE76512108001245126199",
      "GB82WEST12345698765431", "GB82WEST12345698765433"),
      Checksums.ibanValid) === Seq(false, false, false))
  }

  test("ibanCheckDigits round-trips for digit and letter BBANs") {
    val rows = Seq(("DE", "512108001245126199"),
        ("GB", "WEST12345698765432"), ("FR", "0000000000000000000"))
      .toDF("cc", "bban")
      .select(col("cc"), col("bban"),
        Checksums.ibanCheckDigits(col("cc"), col("bban")).as("cd"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    for ((cc, bban, cd) <- rows) {
      val iban = cc + f"$cd%02d" + bban
      assert(bools(Seq(iban), Checksums.ibanValid) === Seq(true),
        s"iban=$iban")
    }
    // the ECB example must reproduce its own published check digits
    assert(rows.find(_._1 == "DE").get._3 === 75L)
  }

  test("candidate extraction: boundaries keep embedded runs out") {
    val df = Seq(
      ("pay 4532015112830366 now", 1),       // clean 16-digit run
      ("id 45320151128303661234567 x", 0),   // 23-digit run: too long
      ("ibanDE75512108001245126199", 0))     // glued to a word
      .toDF("t", "expect")
    val got = df.select(
        size(Checksums.cardCandidates(col("t"))) +
          size(Checksums.ibanCandidates(col("t"))),
        col("expect"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    got.foreach { case (n, e) => assert(n === e) }
  }

  test("checksum-gated redaction leaves invalid candidates intact") {
    val t = "a 4532015112830366 b 1234567812345678 c"
    val out = Seq(t).toDF("t")
      .select(Checksums.redactValid(col("t"),
        filter(Checksums.cardCandidates(col("t")),
          c => Checksums.luhnValid(c)), "<CARD>"))
      .collect()(0).getString(0)
    assert(out === "a <CARD> b 1234567812345678 c")
  }

  test("redaction is \\b-anchored: a valid card embedded in a " +
      "longer non-candidate digit run stays untouched (r10 advice)") {
    // 21-digit run (too long to be a candidate) contains the valid
    // card as a substring; only the standalone occurrence redacts
    val t = "x 004532015112830366000 y 4532015112830366 z"
    val out = Seq(t).toDF("t")
      .select(Checksums.redactValid(col("t"),
        filter(Checksums.cardCandidates(col("t")),
          c => Checksums.luhnValid(c)), "<CARD>"))
      .collect()(0).getString(0)
    assert(out === "x 004532015112830366000 y <CARD> z")
  }
}
