package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Snowball English ("Porter2") stemmer, implemented from the
  * published algorithm description (snowballstem.org's English
  * stemmer definition — the same algorithm fastembed's `Qdrant/bm25`
  * pipeline applies via rust-stemmers). This closes the one
  * documented divergence in [[graft.operators.SparseBm25]]: with
  * [[graft.operators.SparseBm25.embedStemmed]] the engine's sparse
  * token ids match fastembed's on stem-bearing vocabulary too.
  *
  * Reference behavior: `services/database_qdrant_sparse_testing.py:
  * 154-163` loads `SparseTextEmbedding("Qdrant/bm25")`, whose
  * document-side pipeline is lowercase → `\w` tokens → NLTK stopwords
  * → SNOWBALL STEM → |mmh3| id.
  *
  * Implementation notes (the algorithm's own structure, restated):
  *  - y is a vowel unless marked consonant (`Y`): initial y and y
  *    after a vowel are consonant-y.
  *  - R1 = region after the first non-vowel following a vowel
  *    (special-cased to the remainder after a `gener`/`commun`/
  *    `arsen` prefix); R2 = same rule applied inside R1. Both are
  *    positions fixed after the prelude — every rewrite below only
  *    touches the word's tail, so suffix-start-vs-region comparisons
  *    stay valid as the word shrinks or grows.
  *  - Each step is longest-suffix-match THEN condition: a matched
  *    suffix whose region/side condition fails ends the step without
  *    trying shorter suffixes (Snowball `[substring] R among` — this
  *    is why `agreement` survives step 4 although bare `ent` lies in
  *    its R2).
  *
  * Validation: StemmerSpec pins ~70 published input/output pairs
  * across every step plus the whole-word exception lists. No stemmer
  * library exists in this container to diff against exhaustively;
  * the spec's vectors are the contract.
  */
object Stemmer {

  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  private val Doubles =
    Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val ValidLi = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  /** Whole-word special forms + invariants, checked first. */
  private val Exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
    "lying" -> "lie", "tying" -> "tie", "idly" -> "idl",
    "gently" -> "gentl", "ugly" -> "ugli", "early" -> "earli",
    "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe",
    "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
    "andes" -> "andes")

  /** Invariants after step 1a. */
  private val Exception2 = Set("inning", "outing", "canning", "herring",
    "earring", "proceed", "exceed", "succeed")

  /** Region start: after the first non-vowel following a vowel in
    * [from, end), else end. */
  private def regionAfterVC(s: CharSequence, from: Int): Int = {
    var i = from
    val n = s.length
    while (i < n && !isVowel(s.charAt(i))) i += 1
    while (i < n && isVowel(s.charAt(i))) i += 1
    if (i < n) i + 1 else n
  }

  /** Word (or word-prefix) ends in a short syllable: vowel + non-wxY
    * non-vowel preceded by a non-vowel, or initial vowel + non-vowel. */
  private def endsShortSyllable(s: CharSequence): Boolean = {
    val n = s.length
    if (n >= 3) {
      val c = s.charAt(n - 1)
      if (!isVowel(c) && c != 'w' && c != 'x' && c != 'Y' &&
        isVowel(s.charAt(n - 2)) && !isVowel(s.charAt(n - 3))) return true
    }
    n == 2 && isVowel(s.charAt(0)) && !isVowel(s.charAt(1))
  }

  /** Longest suffix of `s` present in `sufs` (caller orders the list
    * longest-first), or null. */
  private def longest(s: String, sufs: Array[String]): String = {
    var i = 0
    while (i < sufs.length) {
      if (s.endsWith(sufs(i))) return sufs(i)
      i += 1
    }
    null
  }

  // step 2/3/4 tables: longest-first (ties impossible — distinct ends)
  private val Step2 = Array(
    "ational", "ization", "iveness", "fulness", "ousness",
    "biliti", "lessli", "tional",
    "alism", "aliti", "ation", "entli", "fulli", "ousli", "iviti",
    "enci", "anci", "abli", "izer", "ator", "alli",
    "bli", "ogi", "li")
  private val Step2Map = Map(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "biliti" -> "ble",
    "lessli" -> "less", "tional" -> "tion", "alism" -> "al",
    "aliti" -> "al", "ation" -> "ate", "entli" -> "ent",
    "fulli" -> "ful", "ousli" -> "ous", "iviti" -> "ive",
    "enci" -> "ence", "anci" -> "ance", "abli" -> "able",
    "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble", "ogi" -> "og", "li" -> "")
  private val Step3 = Array(
    "ational", "tional", "alize", "icate", "iciti", "ative",
    "ical", "ness", "ful")
  private val Step3Map = Map(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ative" -> "",
    "ical" -> "ic", "ness" -> "", "ful" -> "")
  private val Step4 = Array(
    "ement",
    "ance", "ence", "able", "ible", "ment",
    "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
    "al", "er", "ic")

  /** Stem one token. Input is expected lowercase (the BM25 pipeline
    * lowercases first); uppercase input is lowercased defensively.
    * Null-safe (null → null) for UDF use. */
  def stem(wordIn: String): String = {
    if (wordIn == null) return null
    val lower = wordIn.toLowerCase(java.util.Locale.ROOT)
    Exception1.get(lower) match {
      case Some(out) => return out
      case None =>
    }
    if (lower.length < 3) return lower

    // prelude: strip initial apostrophe; mark consonant-y as Y
    var w = if (lower.charAt(0) == '\'') lower.substring(1) else lower
    if (w.length < 3) return w
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var yi = 1
    while (yi < sb.length) {
      if (sb.charAt(yi) == 'y' && isVowel(sb.charAt(yi - 1)))
        sb.setCharAt(yi, 'Y')
      yi += 1
    }
    w = sb.toString

    // regions (fixed positions; see scaladoc)
    val r1 =
      if (w.startsWith("gener")) 5
      else if (w.startsWith("commun")) 6
      else if (w.startsWith("arsen")) 5
      else regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)

    var s = w
    def inR1(sufLen: Int): Boolean = s.length - sufLen >= r1
    def inR2(sufLen: Int): Boolean = s.length - sufLen >= r2
    def hasVowelBefore(endExcl: Int): Boolean = {
      var i = 0
      while (i < endExcl) {
        if (isVowel(s.charAt(i))) return true
        i += 1
      }
      false
    }

    // step 0: longest of ' / 's / 's'
    if (s.endsWith("'s'")) s = s.dropRight(3)
    else if (s.endsWith("'s")) s = s.dropRight(2)
    else if (s.endsWith("'")) s = s.dropRight(1)

    // step 1a
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ied") || s.endsWith("ies"))
      s = if (s.length - 3 > 1) s.dropRight(2) else s.dropRight(1)
    else if (s.endsWith("us") || s.endsWith("ss")) ()
    else if (s.endsWith("s") && hasVowelBefore(s.length - 2))
      s = s.dropRight(1)

    if (Exception2.contains(s)) return s

    // step 1b
    longest(s, Array("eedly", "ingly", "edly", "eed", "ing", "ed")) match {
      case "eedly" => if (inR1(5)) s = s.dropRight(3)
      case "eed" => if (inR1(3)) s = s.dropRight(1)
      case suf if suf != null =>
        if (hasVowelBefore(s.length - suf.length)) {
          s = s.dropRight(suf.length)
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz"))
            s += "e"
          else if (s.length >= 2 && Doubles.contains(s.takeRight(2)))
            s = s.dropRight(1)
          else if (endsShortSyllable(s) && r1 >= s.length)
            s += "e"
        }
      case _ =>
    }

    // step 1c: y/Y → i after a non-vowel that is not the first letter
    if (s.length > 2 && (s.last == 'y' || s.last == 'Y') &&
      !isVowel(s.charAt(s.length - 2)))
      s = s.dropRight(1) + "i"

    // step 2 (longest match, then R1 + side conditions)
    longest(s, Step2) match {
      case null =>
      case suf if !inR1(suf.length) =>
      case "ogi" =>
        if (s.length > 3 && s.charAt(s.length - 4) == 'l')
          s = s.dropRight(1) // ogi → og
      case "li" =>
        if (s.length > 2 && ValidLi.contains(s.charAt(s.length - 3)))
          s = s.dropRight(2)
      case suf =>
        s = s.dropRight(suf.length) + Step2Map(suf)
    }

    // step 3 (R1; `ative` additionally R2)
    longest(s, Step3) match {
      case null =>
      case suf if !inR1(suf.length) =>
      case "ative" =>
        if (inR2(5)) s = s.dropRight(5)
      case suf =>
        s = s.dropRight(suf.length) + Step3Map(suf)
    }

    // step 4 (R2; `ion` only after s/t)
    longest(s, Step4) match {
      case null =>
      case suf if !inR2(suf.length) =>
      case "ion" =>
        if (s.length > 3 &&
          (s.charAt(s.length - 4) == 's' || s.charAt(s.length - 4) == 't'))
          s = s.dropRight(3)
      case suf =>
        s = s.dropRight(suf.length)
    }

    // step 5
    if (s.endsWith("e") &&
      (inR2(1) || (inR1(1) && !endsShortSyllable(s.dropRight(1)))))
      s = s.dropRight(1)
    else if (s.endsWith("l") && inR2(1) && s.length >= 2 &&
      s.charAt(s.length - 2) == 'l')
      s = s.dropRight(1)

    // postlude
    s.replace('Y', 'y')
  }

  /** Column form for token streams (post-explode — a scalar UDF is
    * the right tool here: the algorithm is a ~40-rule procedural
    * rewrite with no expression form; it runs on DISTINCT-ish token
    * rows after the explode, not on documents). */
  val stemUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => stem(t))

  def stemCol(tok: Column): Column = stemUdf(tok)
}
