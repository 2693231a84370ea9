package graft.operators

import graft.SparkTestBase
import graft.queries.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Packing invariants: total preservation, the overflow bound, and
  * contiguity of bins within a shard. */
class PackingSpec extends SparkTestBase {

  private val budget = 512

  private lazy val packed = Packing.packSequences(
    Tables.documents(spark, sf).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
    "doc_id", "n_tokens", budget, shards = 8).cache()

  test("every document lands in exactly one bin; tokens preserved") {
    val docs = Tables.documents(spark, sf)
    assert(packed.count() === docs.count())
    val total = packed.agg(sum("n_tokens")).head.getLong(0)
    val orig = docs.select(TextFunctions.tokenCount(col("text"))
      .cast("long").as("t")).agg(sum("t")).head.getLong(0)
    assert(total === orig)
  }

  test("bins overflow by less than one document's tokens") {
    val maxDoc = packed.agg(max("n_tokens")).head.getLong(0)
    val worst = packed.groupBy("bin").agg(sum("n_tokens").as("t"))
      .agg(max("t")).head.getLong(0)
    assert(worst < budget + maxDoc,
      s"bin of $worst tokens exceeds budget $budget + max doc $maxDoc")
  }

  test("bins within a shard are contiguous, non-decreasing in key " +
      "order") {
    // within a shard, sort docs by id: the bin sequence must be
    // non-decreasing and start at the shard's base id
    val rows = packed
      .withColumn("shard", pmod(col("doc_id"), lit(8)))
      .orderBy("shard", "doc_id")
      .select("shard", "doc_id", "bin").collect()
    rows.groupBy(_.getLong(0)).foreach { case (shard, rs) =>
      val bins = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(bins.head === shard * 1000000L,
        s"shard $shard must start at its base bin")
      bins.sliding(2).foreach {
        case Array(a, b) => assert(a <= b)
        case _ =>
      }
    }
  }
}
