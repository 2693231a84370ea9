package graft.operators

import graft.SparkTestBase
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** PQ invariants: code shape/range, ADC score = dot against the
  * reconstructed (codeword-concatenated) vector, and recall of the
  * compressed-domain scan vs the exact float scan on the testdata
  * embeddings. */
class ProductQuantizationSpec extends SparkTestBase {

  private val m = 8

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val cb =
    ProductQuantization.codebooks(emb, "label", "embedding", m).cache()
  private lazy val kCodes = cb.agg(max(col("code"))).head.getInt(0) + 1
  private lazy val enc =
    ProductQuantization.encode(emb, "vec_id", "embedding", cb, m).cache()

  test("codes are dense, in-range, m per vector") {
    val n = emb.count()
    assert(enc.count() === n)
    val bad = enc.filter(size(col("codes")) =!= m ||
      exists(col("codes"), c => c < 0 || c >= kCodes)).count()
    assert(bad === 0)
    assert(kCodes === emb.select("label").distinct().count().toInt)
  }

  test("ADC score equals dot(query, reconstructed corpus vector)") {
    // reconstruct each corpus vector from its codewords and check the
    // ADC lookup-sum against a direct dot product (associativity of
    // the two fold orders differs → 1e-9 tolerance, not bitwise)
    val queries = emb.filter(col("vec_id") < 3)
    val adc = ProductQuantization.adcTopK(
      queries, "vec_id", enc, cb, "embedding", m, kCodes,
      k = emb.count().toInt)
    val codesLong = enc.select(col("id"),
        posexplode(col("codes")).as(Seq("sub", "code")))
      .join(cb, Seq("sub", "code"))
      .groupBy(col("id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cw")))),
        x => x.getField("cw"))).as("rvec"))
    val expected = queries
      .select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .crossJoin(codesLong)
      .withColumn("edot",
        aggregate(zip_with(col("qv"), col("rvec"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x))
      .select(col("qid"), col("id"), col("edot"))
    val joined = adc.join(expected,
      adc("qid") === expected("qid") && adc("cid") === expected("id"))
      .select(abs(col("score") - col("edot")).as("err"))
    val maxErr = joined.agg(max(col("err"))).head.getDouble(0)
    assert(maxErr < 1e-9, s"ADC score drifted from reconstruction: $maxErr")
  }

  test("rerank with a full-corpus shortlist equals the exact scan") {
    // shortlist cap >= corpus size → the shortlist IS the corpus, so
    // the exact re-rank must reproduce the float scan bit-for-bit
    val queries = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val k = 4
    val exact = SimilaritySearch.bruteForceTopKHeap(
        queries, "vec_id", emb, "vec_id", "embedding", k)
      .select("qid", "cid", "score", "rnk").collect()
      .map(_.toSeq).toSet
    val reranked = ProductQuantization.adcTopKRerank(queries, "vec_id",
        emb, "vec_id", "embedding", enc, cb, m, kCodes, k, rerank = n)
      .select("qid", "cid", "score", "rnk").collect()
      .map(_.toSeq).toSet
    assert(reranked === exact)
  }

  test("IVFADC with all cells probed and a full-corpus rerank " +
      "equals the exact scan") {
    val queries = emb.filter(col("vec_id") < 5)
    val n = emb.count().toInt
    val k = 4
    val nCells = 4
    val cents = SimilaritySearch.kmeansCentroids(
      emb, "vec_id", "embedding", k = nCells, maxIter = 2)
    val rcb = ProductQuantization.codebooksKmeans(
      emb, "vec_id", "embedding", m, kCodes = 8, maxIter = 2)
    val idx = ProductQuantization.ivfadcIndex(
      emb, "vec_id", "embedding", cents, rcb, m)
    assert(idx.count() === n)
    assert(idx.filter(size(col("codes")) =!= m).count() === 0)
    val exact = SimilaritySearch.bruteForceTopKHeap(
        queries, "vec_id", emb, "vec_id", "embedding", k)
      .select("qid", "cid", "score", "rnk").collect()
      .map(_.toSeq).toSet
    val got = ProductQuantization.ivfadcTopK(queries, "vec_id",
        emb, "vec_id", "embedding", cents, rcb, idx, m, kCodes = 8,
        k = k, nProbe = nCells, rerank = n)
      .select("qid", "cid", "score", "rnk").collect()
      .map(_.toSeq).toSet
    assert(got === exact)
  }

  test("compressed-domain recall vs exact float scan") {
    val queries = emb.filter(col("vec_id") < 10)
    val k = 5
    val exact = SimilaritySearch.bruteForceTopKHeap(
        queries, "vec_id", emb, "vec_id", "embedding", k = k)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = ProductQuantization.adcTopK(
        queries, "vec_id", enc, cb, "embedding", m, kCodes, k = k)
      .select(col("qid"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    // 8 label-mean codewords per subspace is a coarse quantizer; the
    // bar asserts the scan is better than chance (random top-5 over
    // 100 vectors ≈ 0.05), deterministic corpus → deterministic value
    assert(recall >= 0.2, s"PQ recall@5 collapsed: $recall")
  }
}
