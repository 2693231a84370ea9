package graft.streaming

import graft.SparkTestBase
import graft.operators.Calibration
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming isotonic-calibration monitor (19th streaming suite):
  * the live per-bin counters must equal the batch binning aggregate
  * on the same prefix across any micro-batch split, replays must
  * drop exactly-once, and
  * [[Calibration.isotonicFromBinCounts]] over the counter snapshot
  * must equal the batch [[Calibration.isotonicFit]]. */
class StreamingCalibrationSpec extends SparkTestBase {
  import spark.implicits._

  private val Bins = 8

  // deterministic scores spanning every bin with a miscalibrated
  // (non-monotone raw rate) label profile so the isotonic pooling
  // actually pools; seq is the global ingest offset
  private val events: Seq[(Double, Boolean, Long)] =
    (0 until 400).map { i =>
      val s = (i % 97).toDouble / 97.0
      val y = (i * 31 % 100) < (20 + 60 * ((7 - i % 8) / 7.0)).toInt
      (s, y, i.toLong)
    }

  private def batchCounts(rows: Seq[(Double, Boolean, Long)])
      : Map[Long, (Long, Long)] =
    rows.groupBy { case (s, _, _) =>
      math.min(math.floor(s * Bins).toLong, (Bins - 1).toLong)
    }.map { case (b, xs) =>
      b -> ((xs.size.toLong, xs.count(_._2).toLong))
    }

  /** Latest counter row per bin from the memory sink. */
  private def streamed(chunks: Seq[Seq[(Double, Boolean, Long)]],
      name: String): Map[Long, (Long, Long)] = {
    val input = MemoryStream[(Double, Boolean, Long)](spark, 1)
    val out = StreamingOps.streamingCalibrationBins(
      input.toDF().toDF("score", "label", "seq"),
      "score", "label", "seq", Bins)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .groupBy(_._1)
      .map { case (b, rows) =>
        val last = rows.maxBy(_._2)
        b -> ((last._3, last._4))
      }
  }

  test("streamed bin counters == batch, fed whole / chunked / " +
      "with replayed and same-batch duplicates") {
    val want = batchCounts(events)
    assert(streamed(Seq(events), "cal_a") === want)
    assert(streamed(events.grouped(53).toSeq, "cal_b") === want)
    val withDups = events.grouped(40).toSeq.flatMap(c => Seq(c, c))
    assert(streamed(withDups, "cal_c") === want)
    assert(streamed(Seq(events.flatMap(e => Seq(e, e))), "cal_d")
      === want)
  }

  test("null score/label rows are dropped, matching the batch fit") {
    val input =
      MemoryStream[(java.lang.Double, java.lang.Boolean, Long)](
        spark, 1)
    val out = StreamingOps.streamingCalibrationBins(
      input.toDF().toDF("score", "label", "seq"),
      "score", "label", "seq", Bins)
    val q = out.writeStream.format("memory").queryName("cal_null")
      .outputMode("update").start()
    input.addData((0.10, true, 0L), (null, true, 1L),
      (0.11, null, 2L), (0.12, false, 3L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("cal_null").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
    assert(got.toMap === Map(0L -> ((2L, 1L))))
  }

  test("isotonicFromBinCounts over the live snapshot == batch " +
      "isotonicFit, and the curve is monotone") {
    val snap = streamed(events.grouped(37).toSeq, "cal_e").toSeq
      .map { case (b, (n, p)) => (b, n, p) }
      .toDF("bin", "n", "pos")
    val live = Calibration.isotonicFromBinCounts(snap)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    val batch = Calibration.isotonicFit(
        events.toDF("score", "label", "seq"),
        col("score"), col("label"), Bins)
      .orderBy("bin").collect().map(_.toSeq).toSeq
    assert(live === batch)
    val iso = live.map(_(4).asInstanceOf[Double])
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      "iso_rate must be non-decreasing in bin")
    val raw = live.map(_(3).asInstanceOf[Double])
    assert(raw.zip(raw.tail).exists { case (a, b) => a > b },
      "fixture must be miscalibrated or the test proves nothing")
  }

  test("mid-stream prefix equals the batch answer for that prefix") {
    val prefix = events.take(150)
    assert(streamed(Seq(prefix), "cal_f") === batchCounts(prefix))
  }
}
