package graft

/** Every registered query runs on sf0.001 and yields a sane result;
  * every query has either an oracle or a documented reason not to.
  * (The value-level correctness gate is the driver's DuckDB compare;
  * this guards against regressions between verify runs.) */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose CORRECT sf0.001 answer is the empty relation (the
    * driver's value gate runs at sf0.01, where each is non-empty):
    * q190's 80-core — the sf0.001 co-order graph peels entirely
    * (documented semantics: "empty when the whole graph peels"). */
  private val emptyOkAtSf0001 = Set("q190_kcore")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sf)
      if (emptyOkAtSf0001(name)) df.count() // must still execute
      else assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle entry or a documented rows-only reason") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- SparkEntry.rowsOnlyQueries
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("oracle keys all correspond to queries") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }
}
