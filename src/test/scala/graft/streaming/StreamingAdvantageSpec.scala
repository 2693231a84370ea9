package graft.streaming

import graft.SparkTestBase
import graft.operators.Eval
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming GRPO-advantage monitor (23rd streaming suite): the
  * live (problem, scaled reward) counters must equal the batch
  * aggregate on the same prefix across any micro-batch split,
  * replays and same-batch duplicates must drop exactly-once, and
  * [[Eval.advantageFromCounts]] over the counter snapshot must
  * equal the batch [[Eval.groupNormalizedAdvantage]] rows — the
  * auditFromCounts device. */
class StreamingAdvantageSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic rewards with repeats per problem (the counter
  // state grain) and one constant-reward problem (the degenerate
  // group); seq is the global ingest offset
  private val events: Seq[(String, Long, Double, Long)] =
    (0 until 240).map { i =>
      val p = s"p${i % 6}"
      val r = if (i % 6 == 5) 0.5 else (i * 7 % 13).toDouble / 13.0
      (p, (i / 6).toLong, r, i.toLong)
    }

  private def batchDf = events.toDF("problem", "sample", "r", "seq")

  /** Latest counter row per (problem, r9) from the memory sink. */
  private def streamed(
      chunks: Seq[Seq[(String, Long, Double, Long)]],
      name: String): Map[(String, Long), Long] = {
    val input = MemoryStream[(String, Long, Double, Long)](spark, 1)
    val out = StreamingOps.streamingRewardCounters(
      input.toDF().toDF("problem", "sample", "r", "seq"),
      "problem", "seq", "r")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, rows) => k -> rows.maxBy(_._3)._4 }
  }

  private def batchCounts: Map[(String, Long), Long] =
    batchDf.select(col("problem"),
        floor(col("r") * 1e9).cast("long").as("r9"))
      .groupBy("problem", "r9").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streamed reward counters == batch, fed whole / chunked / " +
      "with replayed and same-batch duplicates") {
    val want = batchCounts
    assert(streamed(Seq(events), "adv_a") === want)
    assert(streamed(events.grouped(37).toSeq, "adv_b") === want)
    val withDups = events.grouped(30).toSeq.flatMap(c => Seq(c, c))
    assert(streamed(withDups, "adv_c") === want)
    assert(streamed(Seq(events.flatMap(e => Seq(e, e))), "adv_d")
      === want)
  }

  test("advantageFromCounts over the live snapshot == the batch " +
      "groupNormalizedAdvantage at (problem, reward) grain, " +
      "including the degenerate group") {
    val snap = streamed(events.grouped(41).toSeq, "adv_e").toSeq
      .map { case ((p, r9), c) => (p, r9, c) }
    val live = Eval.advantageFromCounts(
        snap.toDF("problem", "r9", "cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    val batch = Eval.groupNormalizedAdvantage(batchDf,
        col("problem"), col("sample"), col("r"))
      .select(col("problem"),
        floor(col("reward") * 1e9).cast("long").as("r9"),
        col("reward"), col("n"), col("mean"), col("std"),
        col("advantage"), col("degenerate"))
      .distinct().collect()
    assert(batch.map(r => (r.getString(0), r.getLong(1))).toSet ===
      live.keySet)
    batch.foreach { b =>
      val l = live((b.getString(0), b.getLong(1)))
      assert(l.getDouble(2) === b.getDouble(2))   // reward
      assert(l.getLong(3) === b.getLong(3))       // n
      assert(l.getDouble(4) === b.getDouble(4))   // mean
      assert(l.getDouble(5) === b.getDouble(5))   // std
      assert(l.isNullAt(6) === b.isNullAt(6))     // advantage
      if (!b.isNullAt(6)) assert(l.getDouble(6) === b.getDouble(6))
      assert(l.getBoolean(7) === b.getBoolean(7)) // degenerate
    }
    // the constant-reward problem is present and degenerate
    assert(live.keys.exists(_._1 === "p5"))
    assert(live(("p5", 500000000L)).getBoolean(7))
  }

  test("null reward rows are dropped, matching batch") {
    val input =
      MemoryStream[(String, java.lang.Double, Long)](spark, 1)
    val out = StreamingOps.streamingRewardCounters(
      input.toDF().toDF("problem", "r", "seq"),
      "problem", "seq", "r")
    val q = out.writeStream.format("memory").queryName("adv_null")
      .outputMode("update").start()
    input.addData(("a", 0.5, 0L), ("a", null, 1L), ("a", 0.5, 2L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("adv_null").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got === Map(("a", 500000000L) -> 2L))
  }
}
