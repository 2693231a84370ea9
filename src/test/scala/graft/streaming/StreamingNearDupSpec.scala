package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import graft.operators.Dedup
import graft.queries.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming banded near-dup: the row-local signature must equal the
  * batch explode/agg simhash bitwise, and the streamed candidate set
  * must cover exactly the batch near-dup pairs on the same rows. */
class StreamingNearDupSpec extends SparkTestBase {

  private def ts(minute: Int) =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("row-local simhash is bit-identical to the batch explode/agg " +
      "signature over the documents table") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = Dedup.simhash(docs, "doc_id", "text")
      .withColumnRenamed("simhash", "batch_sig")
    val row = docs.select(col("doc_id"),
      Dedup.simhashRowUdf(col("text")).as("row_sig"))
    val mismatches = batch.join(row, "doc_id")
      .filter(col("batch_sig") =!= col("row_sig")).count()
    assert(mismatches === 0)
    assert(batch.count() === docs.count())
  }

  test("streamed candidates across micro-batches equal the batch " +
      "near-dup pair set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // real docs (first 40) + two planted near-identical twins so the
    // pair set is guaranteed non-empty
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val twins = base.take(2).map { case (id, text) =>
      (id + 10000L, text + " tail")
    }
    val all = (base ++ twins).zipWithIndex.map { case ((id, text), i) =>
      (id, text, ts(i % 8)) // event times inside one watermark window
    }

    val input = MemoryStream[(Long, String, Timestamp)]
    val docs = input.toDS().toDF("doc_id", "text", "event_ts")
    val q = StreamingOps.streamingNearDupCandidates(docs, "doc_id",
        "text", "event_ts", delay = "30 minutes",
        bands = 6, maxHamming = 5)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    val (b1, b2) = all.splitAt(all.length / 2)
    input.addData(b1.toSeq)
    q.processAllAvailable()
    input.addData(b2.toSeq)
    q.processAllAvailable()
    val streamed = spark.table("neardup_out")
      .select("idA", "idB", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    q.stop()

    val batchPairs = Dedup.simhashNearDups(
        all.map(t => (t._1, t._2)).toSeq.toDF("doc_id", "text"),
        "doc_id", "text", bands = 6, maxHamming = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    assert(streamed === batchPairs)
    assert(batchPairs.nonEmpty, "planted twins must produce pairs")
  }

  test("chained stateful dedup emits each pair exactly once") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // see streamingNearDups scaladoc: the emission pattern cannot
    // produce late rows, so the conservative chain check is safe to
    // lift for this query
    val checkKey =
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(checkKey)
    spark.conf.set(checkKey, "false")
    try {
    // twins differing in one trailing token: hamming 0-3, and most
    // bands collide -> the candidate path emits multiple rows per
    // pair, the chained dedup must collapse them to one
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", ts(0)),
      (2L, "alpha beta gamma delta epsilon zeta x", ts(1)),
      (3L, "alpha beta gamma delta epsilon zeta y", ts(2)))
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingOps.streamingNearDups(
        input.toDS().toDF("doc_id", "text", "event_ts"),
        "doc_id", "text", "event_ts", delay = "30 minutes")
      .writeStream.format("memory").queryName("neardup_once")
      .outputMode("append").start()
    input.addData(docs)
    q.processAllAvailable()
    // force watermark far forward so in-flight dedup rows flush
    input.addData(Seq((99L, "unrelated completely different words",
      Timestamp.valueOf("2026-01-01 12:00:00"))))
    q.processAllAvailable()
    val rows = spark.table("neardup_once")
      .select("idA", "idB").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    assert(rows.distinct.sorted === rows.sorted,
      s"duplicate pair emissions survived: $rows")
    val expected = Dedup.simhashNearDups(
        docs.map(t => (t._1, t._2)).toDF("doc_id", "text"),
        "doc_id", "text", bands = 6, maxHamming = 5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.toSet === expected)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(checkKey, v)
        case None => spark.conf.unset(checkKey)
      }
    }
  }
}
