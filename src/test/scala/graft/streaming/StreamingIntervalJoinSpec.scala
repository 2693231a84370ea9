package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream interval join: streamed pairs == the batch interval
  * join on the same rows, across micro-batch boundaries. */
class StreamingIntervalJoinSpec extends SparkTestBase {

  private def ts(minute: Int, second: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$second%02d")

  // views within the hour BEFORE a purchase (the attribution shape):
  // [purchase_ts - 60 min, purchase_ts - 1 ms]
  private val lower = -3600000L
  private val upper = -1L

  private val purchases = Seq(
    (1L, 100L, ts(30)),   // user 100 buys at 10:30
    (2L, 200L, ts(45)),   // user 200 buys at 10:45
    (3L, 100L, ts(50)))   // user 100 buys again at 10:50
  private val views = Seq(
    (10L, 100L, ts(0)),   // -> purchase 1 (30 min before) and 3
    (11L, 100L, ts(29)),  // -> purchases 1 and 3
    (12L, 200L, ts(45)),  // simultaneous: NOT in [-1h, -1ms]
    (13L, 200L, ts(44)),  // -> purchase 2
    (14L, 300L, ts(10)))  // no purchase for user 300

  private def batchExpected: Set[(Long, Long)] = {
    import spark.implicits._
    val p = purchases.toDF("purchase_id", "user_id", "p_ts")
    val v = views.toDF("view_id", "user_id", "v_ts")
    p.join(v, p("user_id") === v("user_id") &&
        v("v_ts") >= p("p_ts") + org.apache.spark.sql.functions
          .expr(s"INTERVAL '$lower' MILLISECOND") &&
        v("v_ts") <= p("p_ts") + org.apache.spark.sql.functions
          .expr(s"INTERVAL '$upper' MILLISECOND"), "inner")
      .select(p("purchase_id"), v("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("streamed interval join equals the batch join across " +
      "micro-batch boundaries") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val vIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingOps.streamingIntervalJoin(
      pIn.toDS().toDF("purchase_id", "user_id", "p_ts"),
      vIn.toDS().toDF("view_id", "user_id", "v_ts"),
      Seq("user_id"), "p_ts", "v_ts", lower, upper,
      delay = "2 hours")
    val q = joined.select("purchase_id", "view_id")
      .writeStream.format("memory").queryName("sij_out")
      .outputMode("append").start()

    // arrivals deliberately split so pairs must form across batches
    vIn.addData(views(0), views(4))          // views before purchases
    q.processAllAvailable()
    pIn.addData(purchases(0))                // purchase 1 arrives
    q.processAllAvailable()
    vIn.addData(views(1), views(2), views(3)) // late views
    pIn.addData(purchases(1))
    q.processAllAvailable()
    pIn.addData(purchases(2))
    q.processAllAvailable()

    val streamed = spark.table("sij_out")
      .as[(Long, Long)].collect().toSet
    val expected = batchExpected
    assert(expected.nonEmpty && expected.contains((2L, 13L)))
    assert(!expected.exists(_ == ((2L, 12L))),
      "simultaneous view must not attribute")
    assert(streamed === expected)
    q.stop()
  }

  test("join output carries left and right payload columns with " +
      "right key columns dropped") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val pIn = MemoryStream[(Long, Long, Timestamp)]
    val vIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingOps.streamingIntervalJoin(
      pIn.toDS().toDF("purchase_id", "user_id", "p_ts"),
      vIn.toDS().toDF("view_id", "user_id", "v_ts"),
      Seq("user_id"), "p_ts", "v_ts", lower, upper,
      delay = "2 hours")
    assert(joined.columns.toSeq ===
      Seq("purchase_id", "user_id", "p_ts", "view_id", "v_ts"))
  }
}
