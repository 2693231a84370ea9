package graft.operators

import graft.SparkTestBase

/** [[Code]] — diff accounting distinguishes structure from content
  * lines; function chunking splits only at top level. */
class CodeSpec extends SparkTestBase {
  import spark.implicits._

  test("diffStats: file headers and hunks are structure, a bare '+' " +
      "is an added empty line, non-diff docs are all-zero") {
    val patch = "--- a/x.py\n+++ b/x.py\n@@ -1 +1,3 @@\n ctx\n" +
      "-gone\n+added one\n+\n+added two"
    val out = Code.diffStats(
      Seq((1L, patch), (2L, "just prose, no diff at all"))
        .toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toMap
    assert(out(1L) === ((1L, 1L, 3L, 1L, "added one\n\nadded two")))
    assert(out(2L) === ((0L, 0L, 0L, 0L, "")))
  }

  test("imports: plain/aliased/from/dotted/indented forms extract " +
      "their module; relative and non-import lines don't") {
    val src = "import os\nimport sys as system\n" +
      "from json import loads\nimport collections.abc\n" +
      "    import math\nfrom . import sibling\n" +
      "x = 'import fake'\n# import comment"
    val out = Code.imports(
      Seq((1L, src)).toDF("id", "text"), "id", "text")
      .orderBy("line_id")
      .collect().map(_.getString(2))
    assert(out.toSeq === Seq("os", "sys", "json",
      "collections.abc", "math"))
  }

  test("functionChunks: prelude is chunk 0, indented defs never " +
      "split, chunks rebuild byte-exactly in order") {
    val src = "import a\n\ndef f(x):\n    return x\n\n" +
      "class C:\n    def m(self):\n        pass"
    val out = Code.functionChunks(
      Seq((1L, src)).toDF("id", "text"), "id", "text")
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, "import a\n"),
      (1L, 2L, 3L, "def f(x):\n    return x\n"),
      (2L, 5L, 3L, "class C:\n    def m(self):\n        pass")))
  }

  test("identifierSubtokens: snake/camel/acronym splits, keyword " +
      "exclusion, digit tails, double-underscore edges") {
    val src = "def loadUserData(x):\n" +
      "    userName2 = getHTTPResponse(x)\n" +
      "    MAX_RETRY = 3\n    __init__ = None\n    return userName2"
    val out = Code.identifierSubtokens(
      Seq((1L, src)).toDF("id", "text"), "id", "text")
      .groupBy("subtoken").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "load" -> 1, "user" -> 3, "data" -> 1,
      "x" -> 2, "name2" -> 2,
      "get" -> 1, "http" -> 1, "response" -> 1,
      "max" -> 1, "retry" -> 1, "init" -> 1))
    // keywords def/return/None never appear
    assert(!out.contains("def") && !out.contains("return") &&
      !out.contains("none"))
  }

  test("commentStats: docstring parity, comment/blank/code classes, " +
      "trailing # stays code, ratio null on all-blank docs") {
    val src = "\"\"\"top\ninside\n\"\"\"\n# c\nimport os\n\n" +
      "def f():  # trailing\n    \"\"\"one-liner\"\"\"\n    return 1"
    val out = Code.commentStats(
      Seq((1L, src), (2L, "\n\n")).toDF("id", "text"), "id", "text")
      .orderBy("id").collect()
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getLong(4)) === (3L, 1L, 4L, 1L),
      "code=3 comment=1 docstring=4 blank=1")
    assert(r1.getDouble(5) === 5.0 / 8.0)
    val r2 = out(1) // all-blank doc: zero denominator, NULL ratio
    assert(r2.getLong(4) === 3L && r2.isNullAt(5))
  }
}
