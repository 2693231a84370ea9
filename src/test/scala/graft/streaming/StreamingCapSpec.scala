package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps.GroupedDoc

/** Streaming per-group cap: first n arrivals pass, the cap holds
  * across micro-batch splits, and state admits no further rows once
  * full. */
class StreamingCapSpec extends SparkTestBase {

  test("cap admits exactly n per group across micro-batches, " +
      "earliest arrivals first") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[GroupedDoc]
    val q = StreamingOps.streamingCapPerGroup(input.toDS(), n = 3)
      .writeStream.format("memory").queryName("cap_out")
      .outputMode("append").start()

    // batch 1: two groups, a already at 2/3
    input.addData(GroupedDoc("a", 2L), GroupedDoc("a", 1L),
      GroupedDoc("b", 10L))
    q.processAllAvailable()
    // batch 2: a gets one more admitted (3/3), then the rest drop
    input.addData(GroupedDoc("a", 4L), GroupedDoc("a", 3L),
      GroupedDoc("b", 11L))
    q.processAllAvailable()
    // batch 3: a is full — nothing admitted; b reaches 3/3
    input.addData(GroupedDoc("a", 5L), GroupedDoc("b", 12L),
      GroupedDoc("b", 13L))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("cap_out").as[GroupedDoc].collect()
      .groupBy(_.group).map { case (g, rs) => g -> rs.map(_.id).sorted.toSeq }
    // within-batch ties sort by id, so batch 2 admits a=3 (not 4)
    assert(got("a") === Seq(1L, 2L, 3L))
    assert(got("b") === Seq(10L, 11L, 12L))
  }
}
