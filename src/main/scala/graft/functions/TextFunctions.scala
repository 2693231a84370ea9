package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (SURVEY §2.2 quality-predicate family
  * + the training-data-pipeline extensions: token counting, quality
  * scoring, language ID, shingling).
  *
  * Everything here is a pure Catalyst column expression (codegen'd,
  * pushdown-friendly) — no UDFs in the hot path.
  */
object TextFunctions {

  /** Whitespace tokenization (the engine's test-mode tokenizer;
    * reference's HF tokenizer stays behind the Tokenizer trait). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (F6 analog, `text_utils.py:142-147`). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: letter runs + digit runs + individual
    * punctuation marks — the regex approximation of a byte-pair
    * tokenizer's piece count. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Unique-word ratio — repetition detector core (F7,
    * `text_utils.py:150-168`). */
  def uniqueWordRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / tokenCount(text)

  /** Mean word length (F8, `text_utils.py:171-183`). */
  def meanWordLength(text: Column): Column =
    aggregate(transform(tokens(text), w => length(w)), lit(0),
      (acc, x) => acc + x).cast("double") / tokenCount(text)

  /** Fraction of words appearing in `stop` (stopword-density quality
    * signal; language-agnostic core of F9/F10 scoring). */
  def stopwordRatio(text: Column, stop: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stop.map(lit(_)): _*)))
      .cast("double") / tokenCount(text)

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", ""))

  /** Latin-script character ratio (F2, `text_utils.py:74-79`). */
  def latinScriptRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{IsLatin}\\p{M}]", ""))
      .cast("double") / length(text)

  /** Printable-ASCII ratio (F5, `text_utils.py:130-139`). */
  def printableAsciiRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\x20-\\x7E]", ""))
      .cast("double") / length(text)

  /** Mojibake indicator (F3, `text_utils.py:82-89`). */
  def isVisiblyCorrupt(text: Column): Column =
    text.rlike("[âã¢£™žÂÃ]")

  /** Repetition predicate (F7 thresholds 0.3 lines / 0.2 words,
    * `text_utils.py:150-168`). */
  def isRepetitive(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val lineRatio = size(array_distinct(lines)).cast("double") / size(lines)
    (size(lines) > 3 && lineRatio < 0.3) ||
      (tokenCount(text) > 10 && uniqueWordRatio(text) < 0.2)
  }

  /** Abnormal word-length predicate (F8 bounds [2,20], >10% over 30,
    * `text_utils.py:171-183`). */
  def hasAbnormalWordLengths(text: Column): Column = {
    val mean = meanWordLength(text)
    val longFrac = size(filter(tokens(text), w => length(w) > 30))
      .cast("double") / tokenCount(text)
    mean < 2.0 || mean > 20.0 || longFrac > 0.1
  }

  /** Low-quality predicate (F6: fewer than 5 tokens). */
  def isLowQuality(text: Column): Column = tokenCount(text) < 5

  /** Composite OCR quality gate (F9 = F3 ∨ F6 ∨ F7 ∨ F8,
    * `text_utils.py:186-203`) — the predicate that routes pages to the
    * expensive LLM-normalization tier (SURVEY §4 short-circuit). */
  def isBadOcr(text: Column): Column =
    isVisiblyCorrupt(text) || isLowQuality(text) ||
      isRepetitive(text) || hasAbnormalWordLengths(text)

  /** Invalid-text predicate (F10: short / unprintable / non-Latin,
    * `text_utils.py:206-224`). */
  def isInvalidText(text: Column): Column =
    length(text) < 20 || printableAsciiRatio(text) < 0.5 ||
      latinScriptRatio(text) < 0.5

  /** Composite [0,1] quality score for training-data filtering:
    * penalizes repetition, abnormal word lengths, and low stopword
    * density. Deterministic double arithmetic. */
  def qualityScore(text: Column, stop: Seq[String]): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 64.0, lit(1.0))
    val uniq = uniqueWordRatio(text)
    val stopScore = least(stopwordRatio(text, stop) * 10.0, lit(1.0))
    (lenScore + uniq + stopScore) / 3.0
  }

  /** Word n-gram shingles, `concat_ws(" ")` of n consecutive tokens —
    * the unit of MinHash / Jaccard near-dup detection. Empty array if
    * the document has fewer than n tokens. */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(t, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Single-pass shingle UDF: identical output to [[wordShingles]],
    * but the tokenization runs exactly once per row. The column-
    * expression form re-evaluates the `split` subtree on every lambda
    * reference under interpreted higher-order functions — measured 5×
    * slower on the dedup paths at sf0.1. Hot paths use this; the
    * expression form remains for pure-column contexts. */
  private val wordShinglesUdfImpl =
    udf { (s: String, n: Int) =>
      if (s == null) Array.empty[String]
      else {
        val t = s.split(" ", -1)
        if (t.length < n) Array.empty[String]
        else Array.tabulate(t.length - n + 1)(i =>
          t.slice(i, i + n).mkString(" "))
      }
    }

  def wordShinglesFast(text: Column, n: Int): Column =
    wordShinglesUdfImpl(text, lit(n))

  /** Character n-gram language-ID heuristic: scores a text against
    * per-language marker n-gram lists and returns the argmax language
    * code. A deterministic stand-in for fasttext-style LID over the
    * same column contract. */
  def langIdHeuristic(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq(" the ", " and ", " of ", " is "),
      "es" -> Seq(" el ", " la ", " de ", " que "),
      "de" -> Seq(" der ", " und ", " die ", " ist "),
      "fr" -> Seq(" le ", " la ", " et ", " est "),
    )
    val padded = concat(lit(" "), text, lit(" "))
    val scores = markers.map { case (lang, ms) =>
      val sc = ms.map(m =>
        (length(padded) - length(regexp_replace(padded,
          java.util.regex.Pattern.quote(m), ""))) / m.length)
        .reduce(_ + _)
      struct(sc.cast("int").as("score"), lit(lang).as("lang"))
    }
    array_max(array(scores: _*)).getField("lang")
  }

  /** F1: mojibake repair (the reference shells to ftfy,
    * `text_utils.py:66-71`): fixes the common UTF-8-read-as-latin1
    * double-encoding by round-tripping when the re-encoding is valid.
    * Scalar UDF — inherently a black-box repair, not expressible as a
    * column formula. */
  val fixMojibakeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else {
        try {
          val bytes = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
          val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          val repaired = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
          // only accept the round-trip when it removed mojibake marks
          if (repaired.length < s.length && !repaired.contains('�'))
            repaired
          else s
        } catch { case _: Exception => s }
      }
    }

  def fixMojibake(text: Column): Column = fixMojibakeUdf(text)

  /** F4: gibberish detector (`text_utils.py:92-127`): NFC/NFKD
    * normalize, printable ratio < 0.75, or Latin-gated non-alpha noise
    * ratio > 0.6. Needs a Unicode-category walk → scalar UDF. */
  val isGibberishUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null || s.isEmpty) true
      else {
        val norm = java.text.Normalizer.normalize(s,
          java.text.Normalizer.Form.NFC)
        val printable = norm.count(c => !Character.isISOControl(c))
        val printableRatio = printable.toDouble / norm.length
        val letters = norm.count(Character.isLetter)
        val latin = norm.count(c =>
          Character.UnicodeScript.of(c) == Character.UnicodeScript.LATIN)
        // the noise clause applies to letterless or mostly-Latin text;
        // non-Latin scripts are legitimately "noisy" by this metric
        val latinGated = letters == 0 || latin.toDouble / letters > 0.5
        val noAlphaNoise =
          norm.count(c => !Character.isLetterOrDigit(c) &&
            !Character.isWhitespace(c)).toDouble / norm.length
        printableRatio < 0.75 || (latinGated && noAlphaNoise > 0.6)
      }
    }

  def isGibberish(text: Column): Column = isGibberishUdf(text)

  /** F11: PDF validity predicate over raw bytes (`%PDF` magic,
    * `text_utils.py:227-249`; the page-open probe lives behind the
    * extractor service boundary). */
  def isValidPdf(bytes: Column): Column =
    bytes.isNotNull && length(bytes) > 4 &&
      substring(bytes.cast("binary"), 1, 5) === lit("%PDF-".getBytes)

  /** Polynomial rolling-hash document fingerprint (base 131 mod
    * 1e9+7) over characters — cheap content identity for exact dedup
    * at scale without md5's cost. Accumulator stays < 2^38 so long
    * arithmetic never overflows. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(text)),
        i => ascii(text.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 131L + c, lit(1000000007L)))
}
