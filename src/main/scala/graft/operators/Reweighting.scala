package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-mixture domain reweighting via multiplicative weights
  * over excess loss — the deterministic core of DoReMi (Xie et al.
  * 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining"): domains whose loss exceeds the current
  * weighted-average baseline are UP-weighted exponentially,
  *
  *   w'_d ∝ w_d · exp(η · max(loss_d − Σ_e w_e·loss_e, 0)),
  *
  * iterated T rounds from the uniform mixture. DoReMi runs this
  * with proxy-model excess losses; the operator takes ANY per-domain
  * loss table (the q310 query feeds corpus-LM surprisal), keeping
  * the update rule itself exact and replayable.
  *
  * Exactness (the [[RecordLinkage]] 9-decimal contract): input
  * losses, the uniform start, each weighted-baseline term, and each
  * exp factor are truncated to 9 decimals; the two per-round sums
  * (baseline, normalizer) run over DECIMAL(38,9) so partial-
  * aggregation order cannot move an ulp — T rounds unroll into a
  * bit-identical SQL oracle.
  *
  * Scale shape: the loss table is domain-sized (tens of rows —
  * checkpointed once so rounds never re-derive it); every round is
  * one aggregate of that table plus a broadcast 1-row scalar. The
  * corpus appears only in whatever pass BUILT the loss table. */
object Reweighting {

  private def t9(x: org.apache.spark.sql.Column) =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  private def xsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(38, 9))).cast("double")

  /** Multiplicative-weights reweighting over a (domain, loss) table.
    * Returns the per-round trace: (round, domain, loss, excess,
    * weight) for rounds 1..T, `weight` the post-update normalized
    * mixture weight. */
  def domainReweight(losses: DataFrame, domainCol: String,
      lossCol: String, eta: Double, rounds: Int): DataFrame = {
    require(eta > 0, "eta must be positive")
    require(rounds >= 1, "need at least one round")
    val base = losses.select(col(domainCol).as("domain"),
      t9(col(lossCol)).as("loss")).localCheckpoint()
    val nD = base.agg(count(lit(1)).as("__d"))
    var cur = base.crossJoin(broadcast(nD))
      .withColumn("weight", t9(lit(1.0) / col("__d").cast("double")))
      .select(col("domain"), col("loss"), col("weight"))
    val traces = (1 to rounds).map { t =>
      val bl = cur.agg(xsum(t9(col("weight") * col("loss")))
        .as("__bl"))
      val upd = cur.crossJoin(broadcast(bl))
        .withColumn("excess",
          greatest(col("loss") - col("__bl"), lit(0.0)))
        .withColumn("__wu",
          col("weight") * t9(exp(lit(eta) * col("excess"))))
      val z = upd.agg(xsum(t9(col("__wu"))).as("__z"))
      cur = upd.crossJoin(broadcast(z))
        .withColumn("weight", col("__wu") / col("__z"))
        .select(col("domain"), col("loss"), col("excess"),
          col("weight"))
        .localCheckpoint()
      cur.withColumn("round", lit(t))
    }
    traces.reduce(_ unionByName _)
      .select(col("round"), col("domain"), col("loss"),
        col("excess"), col("weight"))
  }

  /** RHO-style per-example excess-loss selection (Mindermann et al.
    * 2022, "Prioritized Training on Points that are Learnable,
    * Worth Learning, and Not Yet Learnt"): each example's REDUCIBLE
    * loss is its current-model loss minus a reference-model loss —
    * high current loss alone marks noise/unlearnable text; high
    * EXCESS marks learnable-and-not-yet-learnt — and training keeps
    * the top-ρ fraction by excess. The DoReMi companion at example
    * granularity (that one reweights domains; this one selects
    * rows).
    *
    * Selection contract: k_target = ⌈ρ·n⌉; the threshold is the
    * LARGEST excess value v such that |{excess ≥ v}| ≥ k_target,
    * and every row with excess ≥ threshold is selected — ties at
    * the threshold are ALL kept (n_selected ≥ k_target,
    * deterministic, no engine-defined row pick among equal-excess
    * rows; the boundary overshoot is exactly the threshold's tie
    * count). Null losses are dropped (nothing to score).
    *
    * Scale shape: one corpus aggregate to the DISTINCT-excess table
    * (bounded by value cardinality, the ksTwoSample device —
    * checkpointed, so n_total and the cumulative window both read
    * the small table), one cumulative window over THAT table (never
    * the corpus), one 1-row threshold broadcast back over a second
    * corpus scan for the per-row flag — two scans, one shuffle (the
    * groupBy), no corpus-sized window, no corpus-sized cache, no
    * driver-side state beyond the threshold row. Excess is
    * t9-truncated before grouping so the distinct table cannot be
    * inflated by sub-ulp noise across engines. PRECONDITION: `df`
    * must be deterministic under recomputation (every input in this
    * engine is — the md5-device discipline); the two scans must see
    * the same rows or the broadcast threshold describes data the
    * flag pass no longer reads. A rand()-derived input needs the
    * caller to checkpoint it first.
    *
    * Output per surviving input row: (id, loss, ref_loss, excess,
    * selected) plus the constant (n_total, k_target, threshold)
    * columns a datasheet wants alongside. */
  /** The t9-truncated excess expression [[excessLossSelect]] scores
    * with — exposed so the streaming counter twin feeds its state
    * through the IDENTICAL codegen arithmetic (streamed ≡ batch is
    * then a bit-identity, not an approximation). */
  private[graft] def excessColumn(
      loss: org.apache.spark.sql.Column,
      refLoss: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    t9(t9(loss) - t9(refLoss))

  /** Threshold arithmetic over a per-excess COUNT table
    * (`excessCol`, `cntCol`) → one row (threshold, k_target,
    * n_total) under [[excessLossSelect]]'s selection contract —
    * shared by the batch operator and the live counters
    * ([[graft.streaming.StreamingOps.streamingExcessCounters]]),
    * whose snapshot through this function IS the batch threshold
    * (the auditFromCounts device, fourth application). The input is
    * value-cardinality bounded, so the cumulative window runs over
    * the small table, never a corpus. */
  def excessThresholdFromCounts(dist: DataFrame, excessCol: String,
      cntCol: String, rho: Double): DataFrame = {
    require(rho > 0 && rho <= 1, "rho in (0, 1]")
    val d = dist.select(col(excessCol).as("excess"),
      col(cntCol).cast("long").as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("excess").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = d.select(col("excess"),
      sum(col("__cnt")).over(w).as("__cum"))
    val n = d.agg(sum(col("__cnt")).as("n_total"))
    cum.crossJoin(broadcast(n))
      .withColumn("__k",
        ceil(lit(rho) * col("n_total").cast("double")).cast("long"))
      .filter(col("__cum") >= col("__k"))
      .agg(max(col("excess")).as("threshold"),
        max(col("__k")).as("k_target"),
        max(col("n_total")).as("n_total"))
  }

  def excessLossSelect(df: DataFrame, idCol: String, lossCol: String,
      refLossCol: String, rho: Double): DataFrame = {
    require(rho > 0 && rho <= 1, "rho in (0, 1]")
    val scored = df.select(col(idCol).as("id"),
        t9(col(lossCol)).as("loss"),
        t9(col(refLossCol)).as("ref_loss"))
      .filter(col("loss").isNotNull && col("ref_loss").isNotNull)
      // = excessColumn(raw loss, raw ref_loss): the t9 pre-truncation
      // lives in the select above. NOT rewritten as
      // excessColumn(col("loss"), ...) on the truncated columns —
      // floor-truncation is not IEEE-idempotent, a third t9 could
      // shift the last digit
      .withColumn("excess", t9(col("loss") - col("ref_loss")))
    // the checkpoint goes on the VALUE-CARDINALITY-BOUNDED distinct
    // table, never the corpus-sized scored frame (the ksTwoSample
    // discipline; r12 review): n_total derives from the same table,
    // so the corpus is scanned exactly twice (threshold pass + flag
    // pass) and nothing data-sized enters executor storage
    val dist = scored.groupBy(col("excess"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint()
    val thr = excessThresholdFromCounts(dist, "excess", "__cnt", rho)
    scored.crossJoin(broadcast(thr))
      .select(col("id"), col("loss"), col("ref_loss"), col("excess"),
        (col("excess") >= col("threshold")).as("selected"),
        col("n_total"), col("k_target"), col("threshold"))
  }
}
