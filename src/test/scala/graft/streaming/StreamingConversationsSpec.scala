package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous conversation assembly: the streamed latest transcript
  * per (user, session) — closed rows final, open rows at max
  * version — must be string- and md5-identical to the batch
  * operator on the same events, across micro-batch splits. */
class StreamingConversationsSpec extends SparkTestBase {
  import spark.implicits._

  // (user, seconds-offset, ord, text): u1 has two sessions split by
  // a 31-min gap; u2 has 11 events (cap exercises); u3 one event
  private val events: Seq[(Long, Long, Long, String)] =
    Seq((1L, 0L, 1L, "a"), (1L, 60L, 2L, "b"), (1L, 100L, 3L, "c"),
      (1L, 100L + 31 * 60, 4L, "d"), (1L, 100L + 32 * 60, 5L, "e"),
      (3L, 500L, 30L, "only")) ++
      (0 until 11).map(i => (2L, i * 20L, 100L + i, s"m$i"))

  private val baseUs = 1700000000000000L

  private def streamed(chunks: Seq[Seq[(Long, Long, Long, String)]])
      : Map[(String, Long), (Long, Long, String, String)] = {
    val input = MemoryStream[(Long, Long, Long, String)](spark, 1)
    val out = StreamingOps.streamingConversations(
      input.toDF().toDF("user", "off", "ord", "text")
        .withColumn("ts_us", col("off") * 1000000L + baseUs),
      "user", "ts_us", "ord", "text")
    val name = s"conv_out_${chunks.map(_.size).mkString("_")}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5), r.getString(6),
        r.getString(7)))
    rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      val last = rs.maxBy(_._3)
      k -> ((last._5, last._6, last._7, last._8))
    }
  }

  private def batch(data: Seq[(Long, Long, Long, String)])
      : Map[(String, Long), (Long, Long, String, String)] =
    graft.operators.Sft.assembleConversations(
        data.toDF("user", "off", "ord", "text")
          .withColumn("ts",
            timestamp_micros(col("off") * 1000000L + baseUs)),
        "user", "ts", "ord", "text")
      .collect().map(r => (r.getLong(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap

  test("streamed == batch on the full event set, fed in 3 " +
      "chronological micro-batches") {
    val sorted = events.sortBy(e => (e._2, e._3))
    val s = streamed(sorted.grouped(6).toSeq)
    val b = batch(events)
    assert(s === b)
  }

  test("mid-stream open sessions equal the batch answer for that " +
      "prefix; a later gap closes them with the same transcript") {
    val sorted = events.sortBy(e => (e._2, e._3))
    val prefix = sorted.take(8)
    val s1 = streamed(Seq(prefix))
    assert(s1 === batch(prefix))
    val s2 = streamed(Seq(prefix, sorted.drop(8)))
    assert(s2 === batch(events))
  }

  test("a late event (ts before the open session's lastTs) arriving " +
      "in a later micro-batch is dropped, keeping streamed == batch " +
      "on the in-order prefix") {
    val inOrder = Seq((9L, 0L, 1L, "a"), (9L, 60L, 2L, "b"),
      (9L, 120L, 3L, "c"), (9L, 180L, 4L, "d"))
    val late = (9L, 30L, 9L, "LATE") // ts 30 < lastTs 120 at arrival
    val s = streamed(Seq(inOrder.take(3), late +: inOrder.drop(3)))
    assert(s === batch(inOrder))
  }
}
