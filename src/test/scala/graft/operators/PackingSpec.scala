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

  test("next-fit packing never overflows the budget and loses no " +
      "documents") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val nf = Packing.packSequencesNextFit(docs, "doc_id", "n_tokens",
      budget, shards = 8).cache()
    assert(nf.count() === docs.count())
    val maxDoc = docs.agg(max("n_tokens")).head.getLong(0)
    val over = nf.groupBy("bin").agg(sum("n_tokens").as("t"),
        count(lit(1)).as("n"))
      .filter(col("t") > budget && col("n") > 1).count()
    assert(over === 0,
      "multi-doc next-fit bin exceeded the budget")
    // single oversized docs (if any) sit alone
    val single = nf.groupBy("bin").agg(sum("n_tokens").as("t"),
        count(lit(1)).as("n"))
      .filter(col("t") > budget).select("n").collect()
    assert(single.forall(_.getLong(0) === 1L))
    assert(maxDoc > 0)
  }

  test("next-fit and window-cumsum agree on totals; next-fit " +
      "respects the hard cap the approximation trades away") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val nf = Packing.packSequencesNextFit(docs, "doc_id", "n_tokens",
      budget, shards = 8)
    assert(nf.agg(sum("n_tokens")).head.getLong(0) ===
      packed.agg(sum("n_tokens")).head.getLong(0))
    // both are deterministic: re-run bit-equal
    val again = Packing.packSequencesNextFit(docs, "doc_id",
        "n_tokens", budget, shards = 8)
      .select("doc_id", "bin").collect().map(r =>
        r.getLong(0) -> r.getLong(1)).toMap
    val first = nf.select("doc_id", "bin").collect().map(r =>
      r.getLong(0) -> r.getLong(1)).toMap
    assert(again === first)
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

  test("context-fit report: hand-computed truncation and padding " +
      "fractions, one row per context") {
    import spark.implicits._
    // lengths 10, 100, 300: totals 410
    val lens = Seq(10L, 100L, 300L).toDF("n_tok")
    val r = Packing.contextFitReport(lens, "n_tok", Seq(64, 256))
      .collect().map(x => x.getAs[Int]("ctx") -> x).toMap
    assert(r.keySet === Set(64, 256))
    val c64 = r(64)
    assert(c64.getAs[Long]("n_docs") === 3L)
    assert(c64.getAs[Long]("n_tokens") === 410L)
    assert(c64.getAs[Long]("docs_over") === 2L)
    // trunc: (100-64) + (300-64) = 272; kept: 10+64+64 = 138
    assert(c64.getAs[Long]("trunc_tokens") === 272L)
    assert(c64.getAs[Double]("trunc_frac") === 272.0 / 410.0)
    assert(c64.getAs[Double]("pad_frac") === 1.0 - 138.0 / 192.0)
    val c256 = r(256)
    assert(c256.getAs[Long]("docs_over") === 1L)
    assert(c256.getAs[Long]("trunc_tokens") === 44L)
    // kept: 10+100+256 = 366 of 768 slots
    assert(c256.getAs[Double]("pad_frac") === 1.0 - 366.0 / 768.0)
  }

  test("lengthBucketedBatches: longest-first batches, ragged tail, " +
      "hand-computed padding, sorted waste beats a scrambled order") {
    import spark.implicits._
    // lengths 9,8,5,4,2 in scrambled id order; batchSize 2 ->
    // batches [9,8], [5,4], [2]
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 2L), (4L, 8L),
      (5L, 4L)).toDF("id", "n_tok")
    val out = Packing.lengthBucketedBatches(docs, "id", "n_tok", 2)
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (0L, 2L, 9L, 17L, 1L, 1.0 / 18.0),
      (1L, 2L, 5L, 9L, 1L, 1.0 / 10.0),
      (2L, 1L, 2L, 2L, 0L, 0.0)))
    // total sorted padding (2) < the id-order batching's ([5,9]
    // pads 4, [2,8] pads 6, [4] pads 0 -> 10)
    assert(out.map(_._5).sum === 2L)
  }
}
