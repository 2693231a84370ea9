package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Snowball English (Porter2) vectors — the published algorithm's own
  * worked examples plus step-targeted derivations. No stemmer library
  * ships in this container to diff against exhaustively, so this
  * table IS the contract: every step, both region exceptions, and the
  * whole-word exception lists are pinned. */
class StemmerSpec extends AnyFunSuite {

  private def check(pairs: (String, String)*): Unit =
    pairs.foreach { case (in, want) =>
      assert(Stemmer.stem(in) === want, s"stem($in)")
    }

  test("whole-word exceptions and short words") {
    check(
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
      "lying" -> "lie", "tying" -> "tie", "idly" -> "idl",
      "gently" -> "gentl", "ugly" -> "ugli", "early" -> "earli",
      "only" -> "onli", "singly" -> "singl",
      "sky" -> "sky", "news" -> "news", "atlas" -> "atlas",
      "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes",
      // post-1a invariants ("innings" reaches the list via 1a)
      "inning" -> "inning", "innings" -> "inning",
      "outing" -> "outing", "proceed" -> "proceed",
      "exceed" -> "exceed", "succeed" -> "succeed",
      // <= 2 letters: untouched
      "a" -> "a", "is" -> "is", "by" -> "by")
  }

  test("step 0 + 1a: plurals and possessives") {
    check(
      "boy's" -> "boy", "boys'" -> "boy",
      "caresses" -> "caress", "ponies" -> "poni",
      "ties" -> "tie", "cries" -> "cri", "dies" -> "die",
      "gas" -> "gas", "this" -> "this",
      "gaps" -> "gap", "kiwis" -> "kiwi",
      "dress" -> "dress", "caress" -> "caress")
  }

  test("step 1b: ed/ing with undoubling and e-restoration") {
    check(
      // step 5 then strips agree's final e (R1, no short syllable)
      "agreed" -> "agre", "feed" -> "feed",
      "plastered" -> "plaster", "bled" -> "bled",
      "motoring" -> "motor", "sing" -> "sing",
      "hopping" -> "hop", "hoping" -> "hope",
      "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz",
      "failing" -> "fail", "filing" -> "file",
      "running" -> "run", "knitting" -> "knit",
      "sized" -> "size", "moving" -> "move",
      "rating" -> "rate", "stating" -> "state",
      "exciting" -> "excit")
  }

  test("step 1c: y -> i after an interior non-vowel") {
    check("happy" -> "happi", "cry" -> "cri",
      "say" -> "say", "enjoy" -> "enjoy", "crying" -> "cri")
  }

  test("step 2: the -li/-ation/-ization family") {
    check(
      "relational" -> "relat", "conditional" -> "condit",
      // 'ational'/'tional' are both out of rational's R1, but step 4
      // still deletes the bare 'al' (it IS in R2)
      "rational" -> "ration",
      "valenci" -> "valenc", "hesitanci" -> "hesit",
      "digitizer" -> "digit", "conformabli" -> "conform",
      "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit")
  }

  test("step 3: -icate/-ative/-alize/-ical/-ful/-ness") {
    check(
      "triplicate" -> "triplic", "informative" -> "inform",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good")
  }

  test("step 4: R2 suffix deletion, longest-match-then-test") {
    check(
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "bowdlerize" -> "bowdler", "effective" -> "effect",
      "luxuriated" -> "luxuri",
      // 'ement' matches but is outside R2 — no fallback to 'ent'
      "agreement" -> "agreement")
  }

  test("step 5 + gener/commun/arsen region exception") {
    check(
      "probate" -> "probat", "rate" -> "rate",
      "cease" -> "ceas", "controll" -> "control",
      "roll" -> "roll",
      "generate" -> "generat", "generously" -> "generous",
      "communication" -> "communic")
  }

  test("never throws and always returns lowercase on arbitrary input") {
    val rnd = new scala.util.Random(20260813L)
    val alphabets = Seq("abcdefghijklmnopqrstuvwxyz", "aeiouy'",
      "bcdfg'", "xyz", "ss'ies'eed")
    val inputs = (0 until 2000).map { i =>
      val a = alphabets(i % alphabets.length)
      (0 until rnd.nextInt(20)).map(_ => a(rnd.nextInt(a.length)))
        .mkString
    } ++ Seq("", "'", "''", "'''s'", "yyy", "sses", "ied", "eedly",
      "ies", "ational", "ization", "ATIONAL", "ööö", "日本語")
    inputs.foreach { w =>
      val s = Stemmer.stem(w)
      assert(s != null, s"stem($w)")
      assert(s == s.toLowerCase(java.util.Locale.ROOT), s"stem($w)=$s")
      assert(!s.contains("Y"), s"marker leaked: stem($w)=$s")
    }
  }

  test("null-safety, case folding, and corpus vocabulary") {
    assert(Stemmer.stem(null) === null)
    check("TABLE" -> "tabl",
      // the documents-table stem-bearing words
      "table" -> "tabl", "value" -> "valu", "customer" -> "custom",
      // and stem-neutral ones stay put
      "hash" -> "hash", "merge" -> "merg", "window" -> "window")
  }
}
