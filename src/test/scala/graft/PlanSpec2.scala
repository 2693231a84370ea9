package graft

/** Continued plan pins (see PlanSpec). */
class PlanSpec2 extends SparkTestBase {

  test("q37: doc length and corpus stats derive from the tf exchange " +
      "— no independent re-tokenization of the corpus text") {
    val p = SparkEntry.queries("q37_hybrid_search")(spark, sf)
      .queryExecution.executedPlan.toString
    // the 3-pass shape tokenized text independently for docLen and
    // avgdl via tokenCount = size(split(text)); deriving dl = Σtf
    // removes every such site (9 of them in the old physical plan).
    // Query-text tokenization uses split over a substring, so this
    // marker is specific to the corpus branches.
    assert(!p.contains("size(split("),
      "corpus text is being re-tokenized outside the tf lineage")
  }

  test("q65: the interval range join plans as an equi-join on " +
      "(key, bucket) — never a nested-loop inequality scan") {
    val p = SparkEntry.queries("q65_range_join")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
