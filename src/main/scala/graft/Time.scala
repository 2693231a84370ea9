package graft

/** Per-query wall-clock micro-benchmark: runs named queries N times
  * each and prints per-run + median seconds, with optional SQL-conf
  * overrides (`k=v` args) so AQE/partition hypotheses can be tested
  * without editing [[GraftSession]].
  * Usage: runMain graft.Time [sfDir] [n] [q ...] [conf.key=value ...]
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val (confs, names) = args.drop(2).partition(_.contains("="))
    val spark = GraftSession.build("local[32]", 32)
    confs.foreach { c =>
      val Array(k, v) = c.split("=", 2)
      spark.conf.set(k, v)
    }
    for (q <- names) {
      val secs = (1 to n).map { _ =>
        // bench parity: leaked checkpoint blocks from earlier
        // queries/runs otherwise evict live blocks mid-measurement
        GraftSession.clearPool(spark)
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(q)(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  $q run: $s%.3f s ($cnt rows)")
        s
      }
      val med = secs.sorted.apply(secs.length / 2)
      println(f"$q median: $med%.3f s")
    }
    spark.stop()
  }
}
