package graft

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import scala.collection.mutable
import graft.operators.{NnDescent, SimilaritySearch}

/** Segment timer for the margin-mining/ANN family: forces each
  * pipeline segment through the noop sink (guide §1.4) under a job
  * description (§1.5), and attributes every STAGE's wall/cpu/gc to
  * its segment via the job-start properties — so the wall of
  * q305/q331-class rows is measured per operator stage, not guessed.
  * Cold-JVM; relative shares are the signal.
  * Usage: runMain graft.SegProbe <sfDir> [graphK] [graphIters]
  */
object SegProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val graphK = args.drop(1).headOption.map(_.toInt).getOrElse(24)
    val graphIters = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.build("local[32]", 32)
    val jobDesc = mutable.Map[Int, String]()   // jobId -> desc
    val stageJob = mutable.Map[Int, Int]()     // stageId -> jobId
    case class Row(seg: String, stage: Int, ms: Long, cpu: Long,
      gc: Long, srMB: Long, swMB: Long, tasks: Int)
    val rows = mutable.ArrayBuffer[Row]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("?")
        jobDesc(j.jobId) = d
        j.stageIds.foreach(s => stageJob(s) = j.jobId)
      }
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(0L)
        val seg = stageJob.get(si.stageId)
          .flatMap(jobDesc.get).getOrElse("?")
        rows += Row(seg, si.stageId, wall, m.executorCpuTime / 1000000,
          m.jvmGCTime, m.shuffleReadMetrics.totalBytesRead >> 20,
          m.shuffleWriteMetrics.bytesWritten >> 20, si.numTasks)
      }
    })
    def seg[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"SEG $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    seg("warm")(force(emb))
    val n = seg("count")(emb.count())
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id",
      "embedding", SimilaritySearch.coarseCellCountScaled(n))
    val probes = SimilaritySearch.probeCountScaled(n, a = 64)
    val l = emb.filter(col("vec_id") % 2 === 0)
    val r = emb.filter(col("vec_id") % 2 === 1)
    val lr = SimilaritySearch.ivfKnnLists(l, "vec_id", r, "vec_id",
      "embedding", cents, 8, probes, corpusAssign = 2)
    seg("ivf_lr")(force(lr))
    val rl = SimilaritySearch.ivfKnnLists(r, "vec_id", l, "vec_id",
      "embedding", cents, 8, probes, corpusAssign = 2)
    seg("ivf_rl")(force(rl))
    val init = seg("nn_init")(
      NnDescent.initGraph(emb, "vec_id", "embedding", graphK)
        .localCheckpoint())
    // round-1 decomposition: closure vs candidate distinct vs
    // score join+dot vs window
    locally {
      import graft.functions.VectorFunctions.{dotF64, l2Norm}
      val v = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("e"))
      val und = init.select(col("u"), col("v"))
        .union(init.select(col("v").as("u"), col("u").as("v")))
        .distinct()
        .repartition(32)
      seg("r1_closure")(force(und))
      val cand = und.as("a")
        .join(und.as("b"), col("a.v") === col("b.u"))
        .select(col("a.u").as("u"), col("b.v").as("v"))
        .filter(col("u") =!= col("v"))
        .union(init.select(col("u"), col("v"))).distinct()
      seg("r1_cand")(force(cand))
      val ck = cand.localCheckpoint()
      val vn = v.select(col("id"), col("e"), l2Norm(col("e")).as("n2"))
      val scored = ck
        .join(vn.select(col("id").as("u"), col("e").as("ue"),
          col("n2").as("un")), "u")
        .join(vn.select(col("id").as("v"), col("e").as("ve"),
          col("n2").as("vn")), "v")
        .withColumn("score",
          dotF64(col("ue"), col("ve")) / (col("un") * col("vn")))
        .select(col("u"), col("v"), col("score"))
      seg("r1_score")(force(scored))
      val sck = scored.localCheckpoint()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("u")).orderBy(col("score").desc, col("v"))
      seg("r1_window")(force(sck.withColumn("rnk",
        row_number().over(w)).filter(col("rnk") <= graphK)))
    }
    var cur = init
    for (i <- 1 to graphIters) {
      cur = seg(s"nn_round_$i")(
        NnDescent.refine(cur, emb, "vec_id", "embedding", graphK)
          .localCheckpoint())
    }
    val und = cur.select(col("u"), col("v"))
      .union(cur.select(col("v").as("u"), col("u").as("v")))
    val cand = lr.select(col("qid").as("lid"), col("cid").as("rid"))
      .union(rl.select(col("cid").as("lid"), col("qid").as("rid")))
      .union(und.filter(col("u") % 2 === 0 && col("v") % 2 === 1)
        .select(col("u").as("lid"), col("v").as("rid")))
    val mined = SimilaritySearch.marginMiningShortlist(
      l, "vec_id", r, "vec_id", "embedding", cand, k = 4,
      marginThreshold = 1.0)
    seg("margin_rank")(force(mined))
    Thread.sleep(1500)
    println("\nseg | stage | wall_ms | cpu_ms | gc_ms | shR | shW | tasks")
    rows.sortBy(-_.ms).take(40).foreach { s =>
      println(f"${s.seg}%-14s | ${s.stage}%5d | ${s.ms}%7d | " +
        f"${s.cpu}%6d | ${s.gc}%5d | ${s.srMB}%4d | ${s.swMB}%4d | " +
        f"${s.tasks}%5d")
    }
    val bySeg = rows.groupBy(_.seg).map { case (k, v) =>
      (k, v.map(_.ms).sum, v.map(_.cpu).sum, v.size) }
    println("\nseg totals (wall_ms, cpu_ms, stages):")
    bySeg.toSeq.sortBy(-_._2).foreach { case (k, w, c, ns) =>
      println(f"$k%-16s $w%7d $c%7d $ns%4d") }
    spark.stop()
  }
}
