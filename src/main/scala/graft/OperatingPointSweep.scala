package graft

import graft.operators.SimilaritySearch

/** Operating-point sweep for the margin-mining candidate device
  * (r14: picking the RECALL-HOLDING q331 point by measurement, not
  * guess): runs [[SimilaritySearch.annCandidateRecallGate]] over a
  * grid of (probe-sizing rule × corpus multi-assignment) at one SF
  * dir and prints one JSON line per (config, direction) with the
  * measured exact-truth candidate recall. The q330 gate showed the
  * fixed-probe devices decay 0.95→0.68 from sf0.01→sf1; this sweep
  * is how the n-growing probe rule's constant is fit to data
  * before the rule is frozen into a registered oracle.
  *
  * Usage: runMain graft.OperatingPointSweep <sfDir> [configCsv]
  * configCsv filters by name (default: all).
  */
object OperatingPointSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val only = if (args.length > 1) Some(args(1).split(",").toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbrt: Long => Int = SimilaritySearch.coarseCellCountScaled(_)
    val noP: Long => Int = _ => 0
    val pA64: Long => Int = SimilaritySearch.probeCountScaled(_, a = 64)
    val pA729: Long => Int =
      SimilaritySearch.probeCountScaled(_, a = 729)
    // (name, cellsOf, probesOf, corpusAssign, graphK, graphIters)
    val configs
        : Seq[(String, Long => Int, Long => Int, Int, Int, Int)] = Seq(
      ("cbrt_p4_ca1_g12x3", cbrt, noP, 1, 12, 3),
      ("cbrt_p4_ca2_g12x3", cbrt, noP, 2, 12, 3),
      ("cbrt_pA64_ca1_g12x3", cbrt, pA64, 1, 12, 3),
      ("cbrt_pA64_ca2_g12x3", cbrt, pA64, 2, 12, 3),
      ("cbrt_pA729_ca1_g12x3", cbrt, pA729, 1, 12, 3),
      ("cbrt_pA729_ca2_g12x3", cbrt, pA729, 2, 12, 3),
      ("cbrt_p4_ca1_g12x5", cbrt, noP, 1, 12, 5),
      ("cbrt_pA64_ca2_g12x4", cbrt, pA64, 2, 12, 4),
      ("cbrt_pA64_ca2_g12x5", cbrt, pA64, 2, 12, 5),
      ("cbrt_pA64_ca2_g16x5", cbrt, pA64, 2, 16, 5),
      ("cbrt_pA729_ca2_g12x5", cbrt, pA729, 2, 12, 5),
      ("cbrt_pA729_ca2_g16x5", cbrt, pA729, 2, 16, 5),
      ("cbrt_pA64_ca2_g24x5", cbrt, pA64, 2, 24, 5),
      ("cbrt_pA729_ca2_g24x5", cbrt, pA729, 2, 24, 5),
      ("cbrt_pA729_ca3_g16x5", cbrt, pA729, 3, 16, 5))
    val n = emb.count()
    configs.filter(c => only.forall(_(c._1))).foreach {
      case (name, cellsOf, probesOf, ca, gk, gi) =>
        val t0 = System.nanoTime()
        val rows = SimilaritySearch.annCandidateRecallGate(emb,
          "vec_id", "embedding", k = 4, queryCap = 512,
          threshold = 0.9, cellsOf = cellsOf, probesOf = probesOf,
          corpusAssign = ca, graphK = gk, graphIters = gi).collect()
        val secs = math.rint((System.nanoTime() - t0) / 1e7) / 100
        val p = { val x = probesOf(n); if (x > 0) x else 4 }
        rows.foreach { r =>
          val recall = r.getAs[Long]("n_hit").toDouble /
            math.max(1L, r.getAs[Long]("n_exact"))
          println(s"""{"config":"$name","dir":"${
            r.getAs[String]("direction")}","n":$n,"cells":${
            cellsOf(n)},"probes":$p,"corpus_assign":$ca,"graph_k":$gk,"graph_iters":$gi,"recall":${
            math.rint(recall * 1000) / 1000},"ok":${
            r.getAs[Boolean]("recall_ok")},"secs":$secs}""")
        }
    }
    spark.stop()
  }
}
