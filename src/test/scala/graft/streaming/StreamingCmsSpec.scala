package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous count-min counters: the streamed latest counter table
  * must be bucket-for-bucket identical to the batch CMS build on the
  * same terms, with per-row state carrying across micro-batches. */
class StreamingCmsSpec extends SparkTestBase {
  import spark.implicits._

  test("streamed cms counters == batch counter table across " +
      "micro-batches, and point estimates agree") {
    val terms = (1 to 600).map(i => s"term${i % 37}")
    val input = MemoryStream[String](spark, 1)
    val out = StreamingOps.streamingCmsCounters(
      input.toDF().toDF("t"), "t", d = 4, w = 64)
    val q = out.writeStream.format("memory").queryName("cms_out")
      .outputMode("update").start()
    terms.grouped(200).foreach { b =>
      input.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val all = spark.table("cms_out").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getMap[Long, Long](2).toMap))
    val latest = all.groupBy(_._1).map { case (row, rs) =>
      row -> rs.maxBy(_._2)._3 }
    // batch counter table: same hash, same buckets
    val batch = terms.toDF("t")
      .select(col("t"), explode(sequence(lit(0), lit(3))).as("row"))
      .select(col("row"),
        (conv(substring(md5(concat(col("row").cast("string"),
          lit(":"), col("t"))), 1, 8), 16, 10).cast("long") % 64)
          .as("b"))
      .groupBy("row", "b").count().collect()
      .groupBy(_.getInt(0))
      .map { case (row, rs) =>
        row -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    assert(latest === batch)
    // every row-group emitted once per micro-batch
    assert(all.groupBy(_._1).values.forall(_.map(_._2).max == 3L))
    // point estimate from the streamed counters >= exact count
    val exact = terms.groupBy(identity).map { case (t, ts) =>
      t -> ts.size.toLong }
    exact.foreach { case (t, c) =>
      val est = (0 until 4).map { row =>
        // recompute the bucket the way the operator does: first 8
        // md5 hex chars (= 4 bytes) as an integer, mod w
        val bucket = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"$row:$t".getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString, 16) % 64
        latest(row).getOrElse(bucket, 0L)
      }.min
      assert(est >= c, s"cms underestimated $t: $est < $c")
    }
  }
}
