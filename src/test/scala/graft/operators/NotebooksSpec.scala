package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Notebook materialization: source-line arrays reassemble with
  * their embedded newlines, code cells keep document order, and
  * malformed notebooks fail CLOSED (absent, never partial). */
class NotebooksSpec extends SparkTestBase {
  import spark.implicits._

  private val nb =
    """{"nbformat":4,"cells":[
      |{"cell_type":"markdown","source":["# t"]},
      |{"cell_type":"code","source":["a = 1\n","b = 2"]},
      |{"cell_type":"markdown","source":["mid"]},
      |{"cell_type":"code","source":["print(a + b)"]}]}"""
      .stripMargin.replace("\n", "")

  test("cells: order, types, and line-array reassembly with " +
      "decoded newlines") {
    val out = Notebooks.cells(
      Seq((1L, nb)).toDF("id", "nb"), "id", "nb")
      .orderBy("cell_id")
      .collect().map(r => (r.getLong(1), r.getString(2),
        r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, "markdown", "# t"),
      (1L, "code", "a = 1\nb = 2"),
      (2L, "markdown", "mid"),
      (3L, "code", "print(a + b)")))
  }

  test("script: code cells only, document order, blank-line joined; " +
      "malformed notebooks are absent (fail closed)") {
    val out = Notebooks.script(
      Seq((1L, nb), (2L, "{not json"), (3L, "[]"))
        .toDF("id", "nb"), "id", "nb")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((2L, 2L, "a = 1\nb = 2\n\nprint(a + b)")))
    assert(!out.contains(2L) && !out.contains(3L))
  }
}
