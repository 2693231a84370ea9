package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Checksum validators for structured-PII detection — the
  * false-positive killers every production PII pipeline runs before
  * redacting: a 16-digit run is only a payment card if it passes the
  * Luhn mod-10 check (ISO/IEC 7812), and an IBAN-shaped token is only
  * an account number if its ISO 7064 mod-97 check digits verify.
  * Redacting every digit run would destroy order ids, hashes, and
  * timestamps; validating first is what presidio-class scrubbers do.
  * (The reference's scrub surface is regex-only — this extends the
  * q108 family with the validation layer.)
  *
  * Everything here is pure codegen-able builtin composition
  * (`transform`/`aggregate`/`sequence` higher-order functions over
  * the char positions — no UDF, no regex beyond candidate
  * extraction), and every formula is exact integer arithmetic, so a
  * DuckDB oracle replays it bit-identically via the same
  * `list_transform`/`list_reduce` folds.
  *
  * Scale shape: all per-row expressions — no shuffle, no join, no
  * state; candidates per document are bounded by text length.
  */
object Checksums {

  /** Digit value of `s` at 1-based position `i` (callers guarantee
    * the char class). */
  private def dig(s: Column, i: Column): Column =
    (ascii(s.substr(i, lit(1))) - lit(48)).cast("long")

  /** Luhn mod-10 sum: from the RIGHT, every second digit (distance
    * 1, 3, 5, … from the last) is doubled, digits > 9 reduced by 9. */
  private def luhnSum(s: Column): Column =
    aggregate(
      sequence(lit(1), length(s)),
      lit(0L),
      (acc, i) => {
        val d = dig(s, i)
        val dd = d * 2L
        acc + when((length(s).cast("long") - i) % 2 === 1,
          when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
      })

  /** True iff the digit string passes the Luhn check (sum ≡ 0 mod
    * 10) — the ISO/IEC 7812 payment-card condition. */
  def luhnValid(s: Column): Column = luhnSum(s) % 10 === 0

  /** The check digit that makes `body || digit` Luhn-valid. Once the
    * check digit is appended, each body digit sits one position
    * further from the right, so doubling flips to EVEN
    * distance-in-body. */
  def luhnCheckDigit(body: Column): Column = {
    val sum = aggregate(
      sequence(lit(1), length(body)),
      lit(0L),
      (acc, i) => {
        val d = dig(body, i)
        val dd = d * 2L
        acc + when((length(body).cast("long") - i) % 2 === 0,
          when(dd > 9, dd - 9).otherwise(dd)).otherwise(d)
      })
    (lit(10L) - sum % 10L) % 10L
  }

  /** ISO 7064 mod-97 of a (possibly very long) digit string via the
    * left fold (acc·10 + digit) mod 97 — no big integer at any
    * length, and the same fold a DuckDB `list_reduce` replays. */
  def mod97(digits: Column): Column =
    aggregate(sequence(lit(1), length(digits)), lit(0L),
      (acc, i) => (acc * 10L + dig(digits, i)) % 97L)

  /** IBAN letter expansion: A→10 … Z→35, digits unchanged —
    * `transform` + `array_join`, position-exact. */
  def ibanExpand(s: Column): Column =
    array_join(
      transform(sequence(lit(1), length(s)), i => {
        val c = s.substr(i, lit(1))
        when(ascii(c) >= 65, (ascii(c) - lit(55)).cast("string"))
          .otherwise(c)
      }), "")

  /** Full ISO 13616 IBAN check: move the first four chars (country +
    * check digits) to the end, expand letters, verify mod-97 ≡ 1.
    * Works for any country/length — the caller's candidate regex
    * decides the shape. */
  def ibanValid(s: Column): Column =
    mod97(ibanExpand(
      concat(s.substr(lit(5), length(s) - 4), s.substr(lit(1), lit(4))
      ))) === 1

  /** The two check digits that make `cc || '00' || bban` a valid
    * IBAN for country code `cc` (two A–Z letters): 98 − mod97(bban ∥
    * expand(cc) ∥ "00"), zero-padded by the caller. */
  def ibanCheckDigits(cc: Column, bban: Column): Column =
    lit(98L) - mod97(ibanExpand(concat(bban, cc, lit("00"))))

  /** Payment-card candidates: standalone 13–19 digit runs. `\b`
    * keeps runs embedded in longer digit strings or identifiers out
    * (shared Java-regex ∩ RE2 syntax, the q108 contract). */
  val CardCandidatePattern = "\\b[0-9]{13,19}\\b"

  /** IBAN-shaped candidates: 2 letters + 2 digits + 11–30
    * alphanumerics (ISO 13616 length envelope). */
  val IbanCandidatePattern = "\\b[A-Z]{2}[0-9]{2}[0-9A-Z]{11,30}\\b"

  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit(CardCandidatePattern), lit(0))

  def ibanCandidates(text: Column): Column =
    regexp_extract_all(text, lit(IbanCandidatePattern), lit(0))

  /** Replace every candidate in `valid` (a string array) with
    * `token` — the checksum-gated redaction: candidates that FAIL
    * validation are left untouched, which is the operator's whole
    * reason to exist. The replacement is anchored with the SAME
    * `\b` word boundary the candidate extraction used, so a valid
    * value that also occurs EMBEDDED inside a longer digit/alnum
    * run (a run that was never a candidate, e.g. a 17-digit string
    * containing a valid 16-digit card) is NOT rewritten there —
    * failing/non-candidate text stays byte-identical (r10 advice).
    * Precondition (both on-board candidate families satisfy it):
    * candidates consist of word characters only, so they need no
    * regex quoting and `\b` anchors exactly. */
  def redactValid(text: Column, valid: Column, token: String): Column =
    aggregate(valid, text, (acc, c) => regexp_replace(acc,
      concat(lit("\\b"), c, lit("\\b")), lit(token)))
}
