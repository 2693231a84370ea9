package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming exact dedup (D2's streaming form): first-wins across
  * micro-batches, watermark-bounded state, agreement with the batch
  * dedup on the distinct-content set. */
class StreamingDedupSpec extends SparkTestBase {

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("one row per content hash, duplicates dropped across " +
      "micro-batches, first arrival wins") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDS()
      .toDF("doc_id", "text", "event_ts")
    val q = StreamingOps.streamingExactDedup(docs, "text", "event_ts",
        delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    input.addData((1L, "alpha", ts(0)), (2L, "alpha", ts(1)),
      (3L, "beta", ts(1)))
    q.processAllAvailable()
    // same-batch duplicate collapsed
    val b1 = spark.table("dedup_out").select("doc_id", "text")
      .as[(Long, String)].collect().sorted.toSeq
    assert(b1.map(_._2).sorted === Seq("alpha", "beta"))
    assert(b1.contains((1L, "alpha")), "first arrival must win")

    // cross-batch duplicate dropped while state is inside the
    // watermark window
    input.addData((4L, "alpha", ts(2)), (5L, "gamma", ts(2)))
    q.processAllAvailable()
    val b2 = spark.table("dedup_out").select("text")
      .as[String].collect().sorted.toSeq
    assert(b2 === Seq("alpha", "beta", "gamma"))
    q.stop()

    // batch agreement: the streamed distinct-content hash set equals
    // the batch exact dedup's on the same rows
    val streamedHashes = spark.table("dedup_out").select("content_md5")
      .as[String].collect().sorted.toSeq
    val batch = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"),
      (4L, "alpha"), (5L, "gamma")).toDF("doc_id", "text")
    val batchHashes = graft.operators.Dedup
      .exactDedup(batch, "doc_id", "text")
      .select("content_hash").as[String].collect().sorted.toSeq
    assert(batchHashes === streamedHashes)
  }

  test("canonical-URL dedup: alias URLs (params/case/port/fragment) " +
      "collapse across micro-batches; streamed set == batch " +
      "canonical dedup") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "HTTPS://Ex.COM/a?b=2&a=1", ts(0)),
      (2L, "https://ex.com:443/a?a=1&b=2&utm_source=f#x", ts(1)),
      (3L, "https://ex.com/other", ts(1)),
      (4L, "https://ex.com/a?b=2&a=1&gclid=9", ts(2)),
      (5L, "http://other.net:8080/p", ts(2)),
      // two DIFFERENT unparseable urls: both must pass (the raw-url
      // fallback key — a shared NULL key would drop the second)
      (6L, "not a url", ts(2)),
      (7L, "also not a url", ts(2)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDS().toDF("doc_id", "url", "event_ts")
    val q = StreamingOps.streamingCanonicalUrlDedup(docs, "url",
        "event_ts", delay = "10 minutes")
      .writeStream.format("memory").queryName("canon_out")
      .outputMode("append").start()
    input.addData(rows.take(3): _*)
    q.processAllAvailable()
    input.addData(rows.drop(3): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("canon_out")
      .filter($"canon_url".isNotNull).select("canon_url")
      .as[String].collect().sorted.toSeq
    assert(streamed === Seq("http://other.net:8080/p",
      "https://ex.com/a?a=1&b=2", "https://ex.com/other"))
    // first arrival wins for the alias family; BOTH distinct
    // garbage rows pass through (raw-url fallback key)
    assert(spark.table("canon_out").select("doc_id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 3L, 5L, 6L, 7L))
    // batch agreement on the distinct canonical set
    val batch = rows.toDF("doc_id", "url", "event_ts")
      .select(graft.operators.Corpus.canonicalizeUrl($"url")
        .as("c")).filter($"c".isNotNull).distinct()
      .as[String].collect().sorted.toSeq
    assert(batch === streamed)
  }

  test("state is watermark-bounded: content re-emits once its " +
      "original has aged out (the documented at-least-once boundary)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "event_ts")
    val q = StreamingOps.streamingExactDedup(docs, "text", "event_ts",
        delay = "5 minutes")
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()

    input.addData((1L, "alpha", ts(0)))
    q.processAllAvailable()
    // advance event time far past the watermark delay so the alpha
    // state expires, then replay the same content
    input.addData((2L, "filler", ts(30)))
    q.processAllAvailable()
    input.addData((3L, "alpha", ts(31)))
    q.processAllAvailable()
    val out = spark.table("dedup_ttl_out").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(out === Seq(1L, 2L, 3L),
      "expired state must re-admit the content (bounded state, " +
        "at-least-once)")
    q.stop()
  }
}
