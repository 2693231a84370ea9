package graft.streaming

import graft.SparkTestBase
import graft.operators.Cusum
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CUSUM (17th streaming suite): the live per-group drift
  * alarm must be bit-identical to the batch window-identity form on
  * the same prefix, across micro-batch splits; duplicate buckets are
  * dropped exactly-once. */
class StreamingCusumSpec extends SparkTestBase {
  import spark.implicits._

  private val K = 5L
  private val H = 12L

  // two groups with different drift shapes, 40 buckets each
  private val series: Seq[(String, Long, Long)] =
    (for (t <- 0L until 40L) yield Seq(
      ("a", t, (t * 13) % 11),
      ("b", t, if (t >= 25) 9L else 2L))).flatten

  private def batch(rows: Seq[(String, Long, Long)])
      : Map[(String, Long), (Long, Boolean)] =
    Cusum.upperCusum(rows.toDF("g", "t", "x"), Seq("g"), "t", "x",
        K, H)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm")))).toMap

  private def streamed(chunks: Seq[Seq[(String, Long, Long)]],
      name: String): Map[(String, Long), (Long, Boolean)] = {
    val input = MemoryStream[(String, Long, Long)](spark, 1)
    val out = StreamingOps.streamingCusum(
      input.toDF().toDF("g", "t", "x"), "g", "t", "x", K, H)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getBoolean(4)))).toMap
  }

  test("streamed == batch, fed whole / in 5 chunks / per-bucket") {
    val want = batch(series)
    assert(streamed(Seq(series), "cu_a") === want)
    assert(streamed(series.grouped(16).toSeq, "cu_b") === want)
    assert(streamed(series.grouped(2).toSeq, "cu_c") === want)
  }

  test("mid-stream prefix equals the batch answer for that prefix") {
    val prefix = series.filter(_._2 < 17)
    assert(streamed(Seq(prefix), "cu_d") === batch(prefix))
  }

  test("the drifting group alarms, the healthy one never does") {
    val got = streamed(Seq(series), "cu_e")
    assert(got.collect { case ((g, _), (_, true)) => g }.toSet
      === Set("b"))
  }

  test("re-sent (duplicate) buckets are dropped exactly-once") {
    val withDups = series.grouped(10).toSeq
      .flatMap(c => Seq(c, c)) // every chunk sent twice
    assert(streamed(withDups, "cu_f") === batch(series))
  }

  test("duplicate buckets WITHIN one micro-batch apply once") {
    // the r11 review case: a strict pre-pass filter against the
    // pre-batch watermark would apply same-batch duplicates twice
    val doubled = Seq(series.flatMap(e => Seq(e, e)))
    assert(streamed(doubled, "cu_g") === batch(series))
  }
}
