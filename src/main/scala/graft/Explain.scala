package graft

/** Plan-inspection entry point: prints the formatted physical plan of
  * selected queries so pushdown / broadcast / codegen properties can
  * be audited (and regressions spotted) without a debugger.
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q04_revenue_by_nation",
        "q08_top3_orders_per_customer", "q28_jaccard_pairs",
        "q31_knn_bruteforce", "q49_stream_barrier",
        "q51_shipping_priority")
    val spark = GraftSession.build("local[4]", 4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
