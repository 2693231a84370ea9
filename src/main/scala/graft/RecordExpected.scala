package graft

/** One-shot recorder for the fixture-identity expected outputs
  * (committed under `fixtures/`): runs each
  * [[graft.queries.FixtureQueries]] query and writes its result as
  * the parquet the oracle reads back. Run ONLY when an operator's
  * semantics intentionally change; the whole point of the recorded
  * parquet is that unintentional drift flips the driver's gate red.
  * Usage: `sbt "runMain graft.RecordExpected [outDir]"`. */
object RecordExpected {
  def main(args: Array[String]): Unit = {
    val out = args.headOption
      .getOrElse(graft.queries.FixtureQueries.FixturesDir)
    val spark = GraftSession.build("local[8]", 8)
    graft.queries.FixtureQueries.queries.toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        fn(spark, "").coalesce(1).write.mode("overwrite")
          .parquet(s"$out/$name")
        println(s"[record] $name -> $out/$name")
      }
    spark.stop()
  }
}
