package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.queries.Tables.davg

/** Continuous moments: the streamed latest (n, μ, E[v²], σ²) per
  * group must be bit-identical to the batch decimal-exact moments
  * (the q95 discipline) on the same prefix, across micro-batch
  * splits and arrival orders. */
class StreamingMomentsSpec extends SparkTestBase {
  import spark.implicits._

  private val values: Seq[(String, Double)] =
    (1 to 300).map(i => (s"u${i % 5}", ((i * 37) % 97) / 7.0 - 3.5))

  private def batchStats(data: Seq[(String, Double)])
      : Map[String, (Long, Double, Double, Double)] =
    data.toDF("g", "v")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), davg(col("v"), 6).as("mu"),
        davg(col("v") * col("v"), 6).as("m2"))
      .withColumn("sigma2", col("m2") - col("mu") * col("mu"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))).toMap

  private def streamedStats(chunks: Seq[Seq[(String, Double)]],
      name: String): Map[String, (Long, Double, Double, Double)] = {
    val input = MemoryStream[(String, Double)](spark, 1)
    val out = StreamingOps.streamingMoments(
      input.toDF().toDF("g", "v"), "g", "v")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    rows.groupBy(_._1).map { case (g, rs) =>
      val last = rs.maxBy(_._2)
      g -> ((last._3, last._4, last._5, last._6))
    }
  }

  test("streamed latest moments == batch decimal-exact moments, " +
      "fed in 4 micro-batches") {
    val s = streamedStats(values.grouped(80).toSeq, "mom_a")
    assert(s === batchStats(values))
  }

  test("arrival order inside and across batches does not change " +
      "the result (associative exact state)") {
    val shuffled = new scala.util.Random(3).shuffle(values)
    val s1 = streamedStats(Seq(shuffled), "mom_b1")
    val s2 = streamedStats(shuffled.reverse.grouped(37).toSeq,
      "mom_b2")
    assert(s1 === s2)
    assert(s1 === batchStats(values))
  }

  test("mid-stream prefix equals the batch answer for that prefix") {
    val prefix = values.take(100)
    val s = streamedStats(Seq(prefix), "mom_c")
    assert(s === batchStats(prefix))
  }
}
