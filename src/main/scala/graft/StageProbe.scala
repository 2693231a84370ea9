package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Per-stage diagnostic for the large-SF scale probes: runs ONE
  * registered query under a SparkListener and prints each stage's
  * wall / task-CPU / task-GC / shuffle / spill totals, so scale
  * attributions are measured instead of guessed (the r13.2 device
  * that refuted the "agg hash tables spill at 32-partition width"
  * hypothesis: zero spill anywhere; the super-linear wall term was
  * single-JVM GC pause share — PLANS.md "sf10 flagged-row root
  * cause"). Cold-JVM by design (no Bench warm-up): absolute walls
  * are NOT comparable to bench artifacts, but same-probe sf-vs-sf
  * comparisons are apples-to-apples, with the ~40 s codegen/JIT
  * constant visible at both points.
  *
  * Usage: SPARK_DRIVER_MEM=64g [SPARK_GRAFT_JVM_OPTS=-XX:+UseParallelGC]
  *   runMain graft.StageProbe <queryName> <sfDir>
  */
object StageProbe {
  case class St(id: Int, name: String, ms: Long, cpuMs: Long, gcMs: Long,
    srMB: Long, swMB: Long, spillMemMB: Long, spillDiskMB: Long, tasks: Int)
  def main(args: Array[String]): Unit = {
    val q = args(0); val dir = args(1)
    val spark = GraftSession.build("local[32]", 32)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        // wall only when BOTH timestamps exist — a stage missing
        // submissionTime would otherwise read epoch-completion-minus-0
        // and corrupt both the sort and wall_sum
        val wallMs = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(0L)
        stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60),
          wallMs,
          m.executorCpuTime / 1000000, m.jvmGCTime,
          m.shuffleReadMetrics.totalBytesRead >> 20,
          m.shuffleWriteMetrics.bytesWritten >> 20,
          m.memoryBytesSpilled >> 20, m.diskBytesSpilled >> 20,
          si.numTasks)
      }
    })
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(q)(spark, dir)
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000)
    println(f"PROBE query=$q rows=$n wall=$secs%.1f s")
    println("stage | wall_ms | cpu_ms | gc_ms | shufR_MB | shufW_MB | spillMem_MB | spillDisk_MB | tasks | name")
    stages.sortBy(-_.ms).take(25).foreach { s =>
      println(f"${s.id}%5d | ${s.ms}%7d | ${s.cpuMs}%7d | ${s.gcMs}%6d | ${s.srMB}%8d | ${s.swMB}%8d | ${s.spillMemMB}%11d | ${s.spillDiskMB}%12d | ${s.tasks}%5d | ${s.name}")
    }
    val totMs = stages.map(_.ms).sum; val totCpu = stages.map(_.cpuMs).sum
    val totGc = stages.map(_.gcMs).sum
    println(f"TOTALS stages=${stages.size} wall_sum=${totMs / 1000.0}%.1f s cpu_sum=${totCpu / 1000.0}%.1f s gc_sum=${totGc / 1000.0}%.1f s shufR=${stages.map(_.srMB).sum} MB shufW=${stages.map(_.swMB).sum} MB spillDisk=${stages.map(_.spillDiskMB).sum} MB")
    spark.stop()
  }
}
