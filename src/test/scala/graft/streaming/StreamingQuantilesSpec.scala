package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous exact quantiles: the streamed latest summary must be
  * bit-identical to the batch histogram operator run on the same
  * values, with state carrying across micro-batch splits. */
class StreamingQuantilesSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed quantiles == batch exactQuantiles on the same " +
      "values, across micro-batches") {
    val values = (1 to 300).map { i =>
      (s"g${i % 3}", ((i * 97) % 53 + 1).toLong)
    }
    val input = MemoryStream[(String, Long)](spark, 1)
    val out = StreamingOps.streamingQuantiles(
      input.toDF().toDF("g", "v"), "g", "v")
    val q = out.writeStream.format("memory").queryName("sq_out")
      .outputMode("update").start()
    values.grouped(100).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("sq_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
    val maxVer = all.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(_._2).max }
    val latest = all
      .filter { case (g, v, _, _, _, _, _) => v == maxVer(g) }
      .map { case (g, _, n, p25, p50, p75, p875) =>
        g -> ((n, p25, p50, p75, p875)) }.toMap
    val batch = graft.operators.Corpus.exactQuantiles(
        values.toDF("g", "v"), "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
          "p875" -> 0.875))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    assert(latest === batch)
    // every group emitted once per micro-batch it appeared in
    assert(maxVer.values.toSet === Set(3L))
  }

  test("mid-stream prefix summaries are the batch answer for that " +
      "prefix (versioned emission)") {
    val input = MemoryStream[(String, Long)](spark, 1)
    val out = StreamingOps.streamingQuantiles(
      input.toDF().toDF("g", "v"), "g", "v")
    val q = out.writeStream.format("memory").queryName("sq_pfx")
      .outputMode("update").start()
    input.addData(("a", 1L), ("a", 3L)); q.processAllAvailable()
    input.addData(("a", 5L)); q.processAllAvailable()
    q.stop()
    val rows = spark.table("sq_pfx").collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(4))))
      .toMap
    // after {1,3}: n=2, median = 1 + (3-1)*0.5 = 2; after {1,3,5}: 3
    assert(rows(1L) === ((2L, 2.0)))
    assert(rows(2L) === ((3L, 3.0)))
  }
}
