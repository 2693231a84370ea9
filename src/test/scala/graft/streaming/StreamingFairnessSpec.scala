package graft.streaming

import graft.SparkTestBase
import graft.operators.Fairness
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming disparate-impact monitor (18th streaming suite): the
  * live acceptance counters must equal the batch aggregate on the
  * same prefix across any micro-batch split, replays must drop
  * exactly-once, and [[Fairness.auditFromCounts]] over the counter
  * snapshot must equal the batch [[Fairness.disparateImpact]]. */
class StreamingFairnessSpec extends SparkTestBase {
  import spark.implicits._

  // four language groups with distinct acceptance profiles; seq is
  // the per-group monotone ingest offset
  private val events: Seq[(String, Long, Boolean)] =
    (0 until 200).flatMap { i =>
      Seq(
        ("en", i.toLong, i % 10 != 0),          // 90%
        ("de", i.toLong, i % 2 == 0),           // 50%
        ("zh", i.toLong, i % 5 == 0),           // 20%
        ("zz", i.toLong, false))                // 0%
    }

  private def batchCounts(rows: Seq[(String, Long, Boolean)])
      : Map[String, (Long, Long)] =
    rows.groupBy(_._1).map { case (g, xs) =>
      g -> ((xs.size.toLong, xs.count(_._3).toLong))
    }

  /** Latest counter row per group from the memory sink. */
  private def streamed(chunks: Seq[Seq[(String, Long, Boolean)]],
      name: String): Map[String, (Long, Long)] = {
    val input = MemoryStream[(String, Long, Boolean)](spark, 1)
    val out = StreamingOps.streamingAcceptanceCounters(
      input.toDF().toDF("g", "seq", "ok"), "g", "seq", "ok")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .groupBy(_._1)
      .map { case (g, rows) =>
        val last = rows.maxBy(_._2)
        g -> ((last._3, last._4))
      }
  }

  test("streamed counters == batch, fed whole / chunked / per-event") {
    val want = batchCounts(events)
    assert(streamed(Seq(events), "fa_a") === want)
    assert(streamed(events.grouped(77).toSeq, "fa_b") === want)
    assert(streamed(events.grouped(9).toSeq, "fa_c") === want)
  }

  test("replayed chunks are dropped exactly-once") {
    val withDups = events.grouped(50).toSeq.flatMap(c => Seq(c, c))
    assert(streamed(withDups, "fa_d") === batchCounts(events))
  }

  test("duplicates WITHIN one micro-batch are dropped exactly-once") {
    // an at-least-once source whose redelivery coalesces into a
    // single trigger: every event appears twice in the same chunk
    val doubled = Seq(events.flatMap(e => Seq(e, e)))
    assert(streamed(doubled, "fa_g") === batchCounts(events))
  }

  test("null acceptance counts as rejected, matching the batch " +
      "audit (not a deserialization crash)") {
    // java.lang.Boolean events so the acceptance column is genuinely
    // nullable; batch disparateImpact's when().otherwise(0) counts
    // null as rejected, and the stream must agree
    val input = MemoryStream[(String, Long, java.lang.Boolean)](spark, 1)
    val out = StreamingOps.streamingAcceptanceCounters(
      input.toDF().toDF("g", "seq", "ok"), "g", "seq", "ok")
    val q = out.writeStream.format("memory").queryName("fa_null")
      .outputMode("update").start()
    input.addData(("en", 0L, true), ("en", 1L, null),
      ("en", 2L, false), ("de", 0L, null))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("fa_null").collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map("en" -> ((3L, 1L)), "de" -> ((1L, 0L))))
  }

  test("mid-stream prefix equals the batch answer for that prefix") {
    val prefix = events.filter(_._2 < 60)
    assert(streamed(Seq(prefix), "fa_e") === batchCounts(prefix))
  }

  test("auditFromCounts over the live snapshot == batch " +
      "disparateImpact") {
    val snap = streamed(events.grouped(31).toSeq, "fa_f").toSeq
      .map { case (g, (n, a)) => (g, n, a) }
      .toDF("lang", "n_total", "n_accepted")
    val live = Fairness.auditFromCounts(snap, "lang")
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val batch = Fairness.disparateImpact(
        events.toDF("lang", "seq", "ok"), col("lang"), "lang",
        col("ok"))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    assert(live === batch)
    // and the audit itself says what it should: zh and zz fail the
    // four-fifths bar against en
    val flags = live.map(r => r.head -> r(6)).toMap
    assert(flags("en") === true && flags("de") === false &&
      flags("zh") === false && flags("zz") === false)
  }
}
