package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Skip-gram training-pair extraction with unigram^0.75 negative
  * sampling (Mikolov et al. 2013 §2.2) — the contrastive-pair
  * materialization step for word2vec-class embedding training, and
  * the token-level sibling of the retrieval hard-negative miner
  * ([[SimilaritySearch]]): every (center, context) pair inside a
  * ±window drawn as a positive, plus `negatives` tokens drawn from
  * the smoothed unigram distribution as negatives.
  *
  * Determinism (every draw replayable by the oracle):
  *  - the smoothed weight is floor(sqrt(sqrt(cnt³))·1000) — an exact
  *    LONG: x^0.75 = √√(x³) uses only IEEE-exact correctly-rounded
  *    ops (pow(x, 0.75) differs across libm in the last ulp, which a
  *    floor boundary would amplify); cnt³ must stay < 2^53, i.e.
  *    per-token counts ≤ ~2M — beyond that drop the ·1000 scale;
  *  - cumulative interval per vocab token by an exact integer sum in
  *    token order (the window runs over the VOCAB table, bounded by
  *    the tokenizer-vocab cap, never over the data — the
  *    temperatureSample precedent);
  *  - draw j for a pair = md5-prefix hash of (doc, pos, off, j) mod
  *    total weight → the token whose [cw0, cw1) interval contains
  *    it.
  *
  * Scale: pairs come from an OFFSET EXPLODE (±window rows per token)
  * equi-joined back on (doc, target position) — linear in tokens,
  * never a per-document token² self-join. The negative lookup
  * equi-joins on a 1024-slice bucketing of the cumulative space
  * (each vocab interval exploded to the slices it covers), so the
  * interval containment is a hash join plus a filter — no
  * broadcast-nested-loop against the vocab. A negative may
  * coincide with the pair's own center/context (standard word2vec
  * behavior — callers filter if they care).
  *
  * Output: one row per (pair, negative slot): (doc, pos, off,
  * center, context, neg_idx, negative). */
object SkipGram {

  private val Slices = 1024

  def pairsWithNegatives(docs: DataFrame, idCol: String,
      textCol: String, window: Int = 2, negatives: Int = 2)
      : DataFrame = {
    require(window >= 1 && negatives >= 0,
      s"window >= 1, negatives >= 0 ($window, $negatives)")
    val toks = docs.select(col(idCol).as("doc"),
        posexplode(filter(split(col(textCol), " "),
          x => length(x) > 0)).as(Seq("pos", "w")))
      .localCheckpoint() // feeds pairs (twice) and the vocab counts
    val offs = (-window to window).filter(_ != 0)
    val targets = toks.select(col("doc"), col("pos"), col("w"),
        explode(array(offs.map(lit(_)): _*)).as("off"))
      .select(col("doc"), col("pos"), col("w").as("center"),
        col("off"), (col("pos") + col("off")).as("tpos"))
    val pairs = targets.join(
        toks.select(col("doc"), col("pos").as("tpos"),
          col("w").as("context")),
        Seq("doc", "tpos"))
      .select(col("doc"), col("pos"), col("off"), col("center"),
        col("context"))
    if (negatives == 0)
      return pairs.withColumn("neg_idx", lit(-1))
        .withColumn("negative", lit(null).cast("string"))
        .orderBy(col("doc"), col("pos"), col("off"), col("neg_idx"))
    // vocab with exact integer cumulative weights in token order;
    // the global window is over the BOUNDED vocab table
    val wholeVocab = Window.orderBy(col("w"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val vocab = toks.groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("wgt",
        floor(sqrt(sqrt(col("cnt").cast("double") * col("cnt") *
          col("cnt"))) * lit(1000)).cast("long"))
      .withColumn("cw1", sum(col("wgt")).over(wholeVocab))
      .withColumn("cw0", col("cw1") - col("wgt"))
      .localCheckpoint()
    val tot = vocab.agg(max(col("cw1")).as("total"))
    // slice the cumulative space; explode each interval to its slices
    val sliced = vocab.crossJoin(broadcast(tot))
      .withColumn("sw", expr(s"(total + ${Slices - 1}) div $Slices"))
      .select(col("w").as("negative"), col("cw0"), col("cw1"),
        explode(sequence(expr("cw0 div sw"),
          expr("(cw1 - 1) div sw"))).as("slice"))
    val draws = pairs
      .select(col("*"),
        explode(array((0 until negatives).map(lit(_)): _*))
          .as("neg_idx"))
      .crossJoin(broadcast(tot))
      .withColumn("u",
        conv(substring(md5(concat(lit("neg:"), col("doc"), lit(":"),
          col("pos"), lit(":"), col("off"), lit(":"),
          col("neg_idx"))), 1, 15), 16, 10).cast("long") %
          col("total"))
      .withColumn("sw", expr(s"(total + ${Slices - 1}) div $Slices"))
      .withColumn("slice", expr("u div sw"))
    draws
      .join(sliced, Seq("slice"))
      .filter(col("u") >= col("cw0") && col("u") < col("cw1"))
      .select(col("doc"), col("pos"), col("off"), col("center"),
        col("context"), col("neg_idx"), col("negative"))
      .orderBy(col("doc"), col("pos"), col("off"), col("neg_idx"))
  }
}
