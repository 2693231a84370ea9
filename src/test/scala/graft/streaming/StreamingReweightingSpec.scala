package graft.streaming

import graft.SparkTestBase
import graft.operators.Reweighting
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming RHO excess-loss monitor (22nd streaming suite): the
  * live per-excess-value counters must equal the batch
  * distinct-excess aggregate on the same prefix across any
  * micro-batch split, replays and same-batch duplicates must drop
  * exactly-once, and
  * [[Reweighting.excessThresholdFromCounts]] over the counter
  * snapshot must equal the batch [[Reweighting.excessLossSelect]]
  * threshold row — the auditFromCounts device. */
class StreamingReweightingSpec extends SparkTestBase {
  import spark.implicits._

  private val Rho = 0.3

  // deterministic losses with repeated excess values (ties at the
  // threshold exercise the all-ties-kept contract); seq is the
  // global ingest offset
  private val events: Seq[(Long, Double, Double, Long)] =
    (0 until 300).map { i =>
      val loss = (i % 13).toDouble / 7.0 + 0.31
      val ref = (i % 5).toDouble / 3.0
      (i.toLong, loss, ref, i.toLong)
    }

  private def batchDf =
    events.toDF("id", "loss", "ref_loss", "seq")

  /** Latest counter row per excess value from the memory sink. */
  private def streamed(
      chunks: Seq[Seq[(Long, Double, Double, Long)]],
      name: String): Map[Double, Long] = {
    val input = MemoryStream[(Long, Double, Double, Long)](spark, 1)
    val out = StreamingOps.streamingExcessCounters(
      input.toDF().toDF("id", "loss", "ref_loss", "seq"),
      "seq", "loss", "ref_loss")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (x, rows) => x -> rows.maxBy(_._2)._3 }
  }

  private def batchCounts: Map[Double, Long] =
    Reweighting.excessLossSelect(batchDf, "id", "loss", "ref_loss",
        Rho)
      .groupBy("excess").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap

  test("streamed excess counters == batch distinct-excess table, " +
      "fed whole / chunked / with replayed and same-batch dups") {
    val want = batchCounts
    assert(streamed(Seq(events), "rho_a") === want)
    assert(streamed(events.grouped(41).toSeq, "rho_b") === want)
    val withDups = events.grouped(35).toSeq.flatMap(c => Seq(c, c))
    assert(streamed(withDups, "rho_c") === want)
    assert(streamed(Seq(events.flatMap(e => Seq(e, e))), "rho_d")
      === want)
  }

  test("excessThresholdFromCounts over the live snapshot == the " +
      "batch excessLossSelect threshold row, and reapplying the " +
      "threshold reproduces the batch selection flags") {
    val snap = streamed(events.grouped(29).toSeq, "rho_e").toSeq
    val thr = Reweighting.excessThresholdFromCounts(
        snap.toDF("excess", "cnt"), "excess", "cnt", Rho)
      .collect()(0)
    val batch = Reweighting.excessLossSelect(batchDf, "id", "loss",
      "ref_loss", Rho)
    val bthr = batch
      .select("threshold", "k_target", "n_total").distinct().collect()
    assert(bthr.length === 1)
    assert(thr.getDouble(0) === bthr(0).getDouble(0))
    assert(thr.getLong(1) === bthr(0).getLong(1))
    assert(thr.getLong(2) === bthr(0).getLong(2))
    // selection contract replay: every row with excess >= threshold
    // is selected, all threshold ties kept, n_selected >= k_target
    val rows = batch.collect()
    assert(rows.forall(r =>
      r.getBoolean(4) === (r.getDouble(3) >= thr.getDouble(0))))
    assert(rows.count(_.getBoolean(4)) >= thr.getLong(1))
  }

  test("null loss rows are dropped, matching batch") {
    val input =
      MemoryStream[(java.lang.Double, java.lang.Double, Long)](
        spark, 1)
    val out = StreamingOps.streamingExcessCounters(
      input.toDF().toDF("loss", "ref_loss", "seq"),
      "seq", "loss", "ref_loss")
    val q = out.writeStream.format("memory").queryName("rho_null")
      .outputMode("update").start()
    input.addData((1.5, 0.5, 0L), (null, 0.5, 1L), (1.5, null, 2L),
      (1.5, 0.5, 3L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("rho_null").collect()
      .map(r => r.getDouble(0) -> r.getLong(2)).toMap
    assert(got === Map(1.0 -> 2L))
  }
}
