package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Pipeline observability via the Observation API: data-quality
  * metrics (row counts, null rates, gate pass rates) collected in
  * THE SAME PASS as the pipeline action — the production alternative
  * to re-scanning 100 TB for a monitoring query. */
class ObservationSpec extends SparkTestBase {

  test("quality metrics ride along the ingest pass — no second scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val obs = Observation("quality")
    val gated = docs
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_text"),
        sum(when(TextFunctions.tokenCount(col("text")) >= 10, 1L)
          .otherwise(0L)).as("gate_pass"))
      .filter(TextFunctions.tokenCount(col("text")) >= 10)
    val kept = gated.count() // the one action
    val m = obs.get
    assert(m("rows") === docs.count())
    assert(m("null_text") === 0L)
    assert(m("gate_pass") === kept,
      "observed gate-pass count must equal the filter's survivors")
  }
}
