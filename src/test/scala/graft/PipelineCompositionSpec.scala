package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Packing, Split}
import graft.functions.TextFunctions

/** The training-data pipeline END TO END on real testdata — quality
  * gate → PII scrub → exact dedup → leakage-aware split →
  * temperature resampling → sequence packing — asserting the
  * conservation invariants each published pipeline stage promises.
  * Individual operators are oracle-checked by their own queries;
  * this spec proves they COMPOSE (ids survive, splits stay total and
  * leak-free, packing loses no tokens). */
class PipelineCompositionSpec extends SparkTestBase {

  test("quality gate → scrub → dedup → split → resample → pack " +
      "composes with conservation invariants") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // 1. quality gate (Gopher-style floor) — monotone row filter
    val gated = docs.filter(TextFunctions.tokenCount(col("text")) >= 10)
    val nGated = gated.count()
    assert(nGated > 0 && nGated <= docs.count())

    // 2. PII scrub — row-count preserving rewrite
    val scrubbed = gated.withColumn("text",
      TextFunctions.redactPii(col("text")))
    assert(scrubbed.count() === nGated)

    // 3. exact dedup — representatives are a subset of surviving ids
    val reps = Dedup.exactDedup(scrubbed, "doc_id", "text")
    val keptIds = reps.select("doc_id").collect().map(_.getLong(0)).toSet
    val gatedIds = gated.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(keptIds.subsetOf(gatedIds))
    val deduped = scrubbed.join(reps.select("doc_id"), Seq("doc_id"),
      "left_semi")

    // 4. leakage-aware split over simhash near-dup pairs: total, and
    // no near-dup pair straddles splits
    val pairs = Dedup.simhashNearDups(deduped, "doc_id", "text",
      bands = 6, maxHamming = 5)
      .select(col("id_a"), col("id_b"))
    val split = Split.clusterAwareSplit(deduped, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.count() === deduped.count(), "split must be total")
    val splitOf = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(splitOf(a) === splitOf(b),
        s"near-dup pair ($a,$b) straddles splits")
    }

    // 5. temperature resampling of train by language — kept ⊆ train
    val train = split.filter(col("split") === "train")
    val sampled = Split.temperatureSample(train, "doc_id", "lang",
      targetTotal = train.count() / 2)
    val trainIds = train.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val sampledIds = sampled.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(sampledIds.subsetOf(trainIds) && sampledIds.nonEmpty)

    // 6. sequence packing — token mass is conserved across bins
    val withTokens = sampled.withColumn("n_tokens",
      TextFunctions.tokenCount(col("text")).cast("long"))
    val packed = Packing.packSequences(withTokens, "doc_id",
      "n_tokens", budget = 512)
    val totalIn = withTokens.agg(sum("n_tokens")).collect()(0).getLong(0)
    val totalOut = packed.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(totalIn === totalOut, "packing must not drop tokens")
    assert(packed.select("bin").distinct().count() > 0)
  }
}
