package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous Misra-Gries: streamed summaries must equal a scalar
  * replay of the same per-shard streams, across micro-batch splits,
  * and the MG survival guarantee must hold for planted heavies. */
class StreamingHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private val capacity = 4
  private val shards = 2

  /** the engine's shard assignment, recomputed for the replay */
  private def shardOf(t: String): Int =
    spark.range(1).select(
      pmod(xxhash64(lit(t)), lit(shards)).cast("int")).head.getInt(0)

  /** scalar MG fold mirroring mgUpdate */
  private def replay(stream: Seq[String]): Map[String, Long] = {
    val m = scala.collection.mutable.LinkedHashMap[String, Long]()
    stream.foreach { t =>
      m.get(t) match {
        case Some(c) => m(t) = c + 1
        case None if m.size < capacity => m(t) = 1L
        case None =>
          val dead = m.iterator.filter(_._2 == 1L).map(_._1).toList
          m.keys.toList.foreach(k => m(k) = m(k) - 1)
          dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  test("streamed MG summary == scalar replay, heavies survive") {
    // a heavy term (every 3rd arrival) over a wide light vocabulary
    val events = (0 until 300).map { i =>
      val t = if (i % 3 == 0) "heavy" else s"light${i % 40}"
      (i.toLong, t)
    }
    val input = MemoryStream[(Long, String)](spark, 1)
    val out = StreamingOps.streamingHeavyHitters(
      input.toDF().toDF("seq", "term"), "term", "seq",
      capacity, shards)
    val q = out.writeStream.format("memory").queryName("mg_out")
      .outputMode("update").start()
    // three micro-batches — state must carry across them
    events.grouped(100).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("mg_out").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val maxVer = all.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(_._2).max }
    val latest = all
      .filter { case (s, v, _, _) => v == maxVer(s) }
      .map { case (s, _, t, c) => (s, t) -> c }.toMap
    // scalar replay per shard (same arrival order = seq order)
    val byShard = events.map(_._2).groupBy(shardOf)
    val expected = byShard.flatMap { case (s, ts) =>
      replay(ts).map { case (t, c) => (s, t) -> c } }
    assert(latest === expected)
    // the planted heavy clears its shard's MG threshold and survives
    val hs = shardOf("heavy")
    assert(latest.contains((hs, "heavy")))
    assert(byShard(hs).count(_ == "heavy") >
      byShard(hs).size.toLong / capacity)
  }
}
