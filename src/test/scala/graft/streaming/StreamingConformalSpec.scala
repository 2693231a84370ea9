package graft.streaming

import graft.SparkTestBase
import graft.operators.Calibration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming split-conformal monitor (20th streaming suite): the
  * live per-group thresholds must equal the batch
  * [[Calibration.conformalThresholds]] calibration leg on the same
  * prefix across any micro-batch split, replays must drop
  * exactly-once, and the +∞ small-sample convention must hold
  * mid-stream. */
class StreamingConformalSpec extends SparkTestBase {
  import spark.implicits._

  private val Alphas = Seq(0.05, 0.1, 0.2)

  // two calibration groups with different nonconformity scales;
  // seq is the per-group monotone ingest offset
  private val events: Seq[(String, Long, Double)] =
    (0 until 300).flatMap { i =>
      Seq(
        ("en", i.toLong, ((i * 37) % 101).toDouble / 10.0),
        ("de", i.toLong, ((i * 53) % 89).toDouble / 5.0))
    }

  /** Latest threshold row per (group, alpha) from the memory sink. */
  private def streamed(chunks: Seq[Seq[(String, Long, Double)]],
      name: String): Map[(String, Double), (Long, Long, Double)] = {
    val input = MemoryStream[(String, Long, Double)](spark, 1)
    val out = StreamingOps.streamingConformalThresholds(
      input.toDF().toDF("g", "seq", "nc"), "g", "seq", "nc", Alphas)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, rows) =>
        val last = rows.maxBy(_._3) // largest n_cal = latest batch
        k -> ((last._3, last._4, last._5))
      }
  }

  /** Batch thresholds per (group, alpha) for a prefix — the
    * calibration leg of [[Calibration.conformalThresholds]]; the
    * test slice is a dummy (coverage is a batch concern). */
  private def batch(rows: Seq[(String, Long, Double)])
      : Map[(String, Double), (Long, Long, Double)] =
    rows.groupBy(_._1).flatMap { case (g, xs) =>
      val cal = xs.map { case (_, seq, nc) => (seq, nc) }
        .toDF("id", "nc")
      val test = Seq((0L, 0.0)).toDF("id", "nc")
      Calibration.conformalThresholds(cal, test, col("nc"),
          col("id"), Alphas)
        .collect()
        .map(r => (g, r.getDouble(0)) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    }

  test("streamed thresholds == batch, fed whole / chunked / " +
      "with replayed and same-batch duplicates") {
    val want = batch(events)
    assert(streamed(Seq(events), "cf_a") === want)
    assert(streamed(events.grouped(71).toSeq, "cf_b") === want)
    val withDups = events.grouped(50).toSeq.flatMap(c => Seq(c, c))
    assert(streamed(withDups, "cf_c") === want)
    assert(streamed(Seq(events.flatMap(e => Seq(e, e))), "cf_d")
      === want)
  }

  test("mid-stream prefix equals the batch answer for that prefix") {
    val prefix = events.filter(_._2 < 80)
    assert(streamed(Seq(prefix), "cf_e") === batch(prefix))
  }

  test("small-sample alphas report +Infinity (the conformal " +
      "convention), then converge to finite thresholds") {
    // 5 rows: alpha=0.05 needs k=ceil(0.95*6)=6 > 5 -> +inf
    val tiny = (0 until 5).map(i => ("en", i.toLong, i.toDouble))
    val got = streamed(Seq(tiny), "cf_f")
    assert(got(("en", 0.05))._3.isPosInfinity)
    assert(got(("en", 0.2)) === ((5L, 5L, 4.0)))
    // after 59 more rows k=ceil(0.95*65)=62 <= 64 -> finite
    val more = (5 until 64).map(i => ("en", i.toLong, i.toDouble))
    val got2 = streamed(Seq(tiny, more), "cf_g")
    assert(!got2(("en", 0.05))._3.isPosInfinity)
    assert(got2 === batch(tiny ++ more))
  }

  test("null nonconformities are dropped, matching batch") {
    val input = MemoryStream[(String, Long, java.lang.Double)](spark, 1)
    val out = StreamingOps.streamingConformalThresholds(
      input.toDF().toDF("g", "seq", "nc"), "g", "seq", "nc", Seq(0.2))
    val q = out.writeStream.format("memory").queryName("cf_null")
      .outputMode("update").start()
    input.addData(("en", 0L, 1.0), ("en", 1L, null),
      ("en", 2L, 2.0), ("en", 3L, 3.0), ("en", 4L, 4.0))
    q.processAllAvailable()
    q.stop()
    val r = spark.table("cf_null").collect()
      .map(x => (x.getLong(2), x.getLong(3), x.getDouble(4))).head
    // 4 non-null values; k = ceil(0.8*5) = 4 -> threshold = 4.0
    assert(r === ((4L, 4L, 4.0)))
  }
}
