package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Native session_window as a CONTINUOUS query (the q110 operator in
  * streaming mode): sessions merge across micro-batch boundaries and
  * the final emitted sessions equal the batch computation on the
  * same rows. */
class StreamingSessionWindowSpec extends SparkTestBase {

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("streamed session windows equal batch on the same rows, " +
      "merging across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val q = input.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n_events"))
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()

    // user 1: events at 10:00 and 10:15 (two sessions) — then a
    // LATER batch adds 10:07, bridging them into ONE session
    input.addData((1L, ts(0)), (1L, ts(15)), (2L, ts(30)))
    q.processAllAvailable()
    input.addData((1L, ts(7)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).sortBy(t => (t._1, t._2))

    val batch = Seq((1L, ts(0)), (1L, ts(15)), (2L, ts(30)), (1L, ts(7)))
      .toDF("user_id", "ts")
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getTimestamp(2), r.getLong(3))).sortBy(t => (t._1, t._2))

    assert(streamed.toSeq === batch.toSeq)
    // the bridge collapsed user 1 into one session spanning 0..15+gap
    assert(streamed.count(_._1 == 1L) === 1)
    assert(streamed.find(_._1 == 1L).get._4 === 3L)
  }
}
