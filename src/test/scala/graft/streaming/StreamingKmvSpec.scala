package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous KMV distinct estimation: the streamed latest estimate
  * must be bit-identical to the batch sketch on the same values, with
  * the bounded k-smallest state carrying across micro-batches. */
class StreamingKmvSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed kmv == batch kmvDistinct on the same values, " +
      "across micro-batches") {
    val values = (1 to 900).map(i => (s"g${i % 3}", (i * 131) % 400))
    val input = MemoryStream[(String, Int)](spark, 1)
    val out = StreamingOps.streamingKmvDistinct(
      input.toDF().toDF("g", "v"), "g", "v", k = 64)
    val q = out.writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    values.grouped(300).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("kmv_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val maxVer = all.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).max }
    val latest = all
      .filter { case (g, v, _, _) => v == maxVer(g) }
      .map { case (g, _, n, est) => g -> ((n, est)) }.toMap
    // batch operator hashes the INT value cast to string — feed the
    // same column type so the md5 input strings match
    val batch = graft.operators.Sketches.kmvDistinct(
        values.toDF("g", "v"), "g", "v", k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(latest === batch)
    assert(maxVer.values.toSet === Set(3L))
  }

  test("mid-stream prefixes are exact below k and the state stays " +
      "bounded at k") {
    val input = MemoryStream[(String, Int)](spark, 1)
    val out = StreamingOps.streamingKmvDistinct(
      input.toDF().toDF("g", "v"), "g", "v", k = 8)
    val q = out.writeStream.format("memory").queryName("kmv_pfx")
      .outputMode("update").start()
    input.addData((1 to 5).map(("a", _)): _*); q.processAllAvailable()
    input.addData((1 to 50).map(("a", _)): _*); q.processAllAvailable()
    q.stop()
    val rows = spark.table("kmv_pfx").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // prefix {1..5}: below k=8, so the sketch is exact
    assert(rows(1L) === ((5L, 5.0)))
    // after 50 distinct: fill is capped at k, estimate is an estimate
    assert(rows(2L)._1 === 8L)
    assert(rows(2L)._2 > 10.0)
  }
}
