package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming corpus materialization: the continuous quality-funnel +
  * exact-dedup must admit exactly the docs the batch funnel admits,
  * however the stream is split into micro-batches. */
class StreamingCorpusSpec extends SparkTestBase {

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  // 24 distinct long-enough english words — passes every gate
  private val good = "the quick brown fox jumps over lazy dogs while " +
    "seventeen astronauts deliberate about quantum chromodynamics " +
    "beneath shimmering aurora curtains during protracted antarctic " +
    "expeditions yesterday"
  private val short = "too short"
  private val repetitive = Array.fill(30)("spam").mkString(" ")

  test("streamed survivors == batch funnel survivors across " +
      "micro-batch splits, including cross-batch duplicates") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "en", good, ts(0)),
      (2L, "de", good, ts(0)),            // language gate
      (3L, "en", short, ts(1)),           // word-count gate
      (4L, "en", repetitive, ts(1)),      // diversity gate
      (5L, "en", good + " addendum", ts(2)),
      (6L, "en", good, ts(2)),            // dup of 1 (cross-batch)
      (7L, "en", good + " addendum", ts(3))) // dup of 5

    val input = MemoryStream[(Long, String, String, Timestamp)]
    val q = StreamingOps.streamingCorpusMaterialize(
        input.toDS().toDF("doc_id", "lang", "text", "event_ts"),
        "event_ts", delay = "30 minutes")
      .writeStream.format("memory").queryName("corpus_out")
      .outputMode("append").start()
    // three micro-batches split mid-duplicate
    input.addData(rows.take(3)); q.processAllAvailable()
    input.addData(rows.slice(3, 6)); q.processAllAvailable()
    input.addData(rows.drop(6)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("corpus_out").select("doc_id")
      .as[Long].collect().sorted.toSeq

    // batch replay: same gates, md5-keyed first-wins keeper
    val batch = rows.toDF("doc_id", "lang", "text", "event_ts")
    val w = graft.functions.TextFunctions.tokens(col("text"))
    val mwl =
      (length(col("text")) - (size(w) - 1)).cast("double") / size(w)
    val div = size(array_distinct(w)).cast("double") / size(w)
    val batchIds = batch
      .filter(col("lang") === "en" && size(w) >= 20 && mwl >= 3.9 &&
        div >= 0.35)
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select("doc_id").as[Long].collect().sorted.toSeq

    assert(streamed === Seq(1L, 5L))
    assert(streamed === batchIds,
      "continuous funnel must equal the batch funnel")
  }

  test("quality gates carry no state: a gated-out doc leaves nothing " +
      "behind, and its later identical copy is still gated out") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val q = StreamingOps.streamingCorpusMaterialize(
        input.toDS().toDF("doc_id", "lang", "text", "event_ts"),
        "event_ts", delay = "30 minutes")
      .writeStream.format("memory").queryName("corpus_gate_out")
      .outputMode("append").start()
    input.addData((1L, "en", short, ts(0))); q.processAllAvailable()
    input.addData((2L, "en", short, ts(1)),
      (3L, "en", good, ts(1))); q.processAllAvailable()
    q.stop()
    val out = spark.table("corpus_gate_out").select("doc_id")
      .as[Long].collect().toSeq
    assert(out === Seq(3L))
  }
}
