package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Jupyter-notebook (.ipynb JSON) materialization — the
  * notebook→script step code corpora run before anything else sees
  * the file (The-Stack-class pipelines either convert or drop
  * notebooks; raw ipynb JSON is boilerplate-dominated and poisons
  * dedup/quality signals). Parsing is Spark's native `from_json`
  * against the minimal nbformat-4 projection (cells → cell_type +
  * source lines); everything stays a per-row expression chain + one
  * bounded explode.
  *
  * Fail-closed: a malformed notebook parses to NULL and its doc is
  * ABSENT from the output (no partial scripts) — callers anti-join
  * if they need the reject list. Attachments/outputs are ignored by
  * schema projection, which is the point: only authored source
  * survives. */
object Notebooks {

  private val NbSchema: StructType = DataType.fromDDL(
    "cells ARRAY<STRUCT<cell_type: STRING, source: ARRAY<STRING>>>"
  ).asInstanceOf[StructType]

  /** One row per cell: (idCol, cell_id, cell_type, src) with `src`
    * the cell's source lines joined (nbformat stores source as a
    * line array whose entries keep their trailing newlines). */
  def cells(df: DataFrame, idCol: String,
      jsonCol: String): DataFrame =
    df.select(col(idCol), posexplode(
        from_json(col(jsonCol), NbSchema).getField("cells"))
        .as(Seq("cell_id", "c")))
      .select(col(idCol), col("cell_id").cast("long").as("cell_id"),
        col("c.cell_type").as("cell_type"),
        array_join(col("c.source"), "").as("src"))

  /** The executable script: code cells only, document order, joined
    * with a blank line. Output: (idCol, n_code, n_markdown,
    * script). */
  def script(df: DataFrame, idCol: String,
      jsonCol: String): DataFrame =
    cells(df, idCol, jsonCol)
      .groupBy(col(idCol))
      .agg(
        sum(when(col("cell_type") === "code", 1L).otherwise(0L))
          .as("n_code"),
        sum(when(col("cell_type") === "markdown", 1L).otherwise(0L))
          .as("n_markdown"),
        concat_ws("\n\n", transform(
          array_sort(collect_list(when(col("cell_type") === "code",
            struct(col("cell_id"), col("src"))))),
          s => s.getField("src"))).as("script"))
}
