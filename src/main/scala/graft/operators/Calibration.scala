package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score calibration for curation classifiers (builder brief: a
  * training-data pipeline's quality/language/toxicity scores gate
  * million-document decisions, and raw scores are rarely calibrated
  * probabilities — these are the two standard distribution-free
  * fixes).
  *
  * - [[isotonicFit]] — isotonic regression (Robertson, Wright & Dykstra
  *   1988; Zadrozny & Elkan 2002 for classifier calibration) over
  *   score bins, via the CLOSED-FORM max–min identity
  *       ŷ_i = max_{j≤i} min_{k≥i} mean(y_j..y_k)
  *   rather than the sequential PAVA sweep: the identity is pure
  *   joins/aggregates over the BIN table (≤ bins³ constant-size
  *   work), so the fit is fully declarative, engine-portable, and
  *   trivially oracle-replayable, while the corpus itself is touched
  *   exactly once (the binning aggregate).
  * - [[conformalThresholds]] — split conformal prediction (Vovk et
  *   al. 2005; Lei et al. 2018): the ⌈(1−α)(n+1)⌉-th smallest
  *   calibration nonconformity is a finite-sample threshold with
  *   marginal coverage ≥ 1−α on exchangeable data; the audit reports
  *   the threshold and its empirical held-out coverage per α.
  *
  * Scale shape: isotonic = one corpus aggregate + constant-size bin
  * algebra. Conformal = one filter + ONE global-order window over
  * the calibration slice (inherent to an exact order statistic —
  * the slice is a small split of one class, not the corpus) and one
  * broadcast threshold join back to the held-out slice.
  */
object Calibration {

  /** Isotonic fit of P(label | score) over `bins` equal-width score
    * bins (scores in [0,1]; bin = min(floor(s·bins), bins−1)).
    * Output per NONEMPTY bin: (bin, n, pos, raw_rate, iso_rate),
    * iso_rate non-decreasing in bin. Rows with null score/label are
    * dropped (nothing to calibrate). */
  def isotonicFit(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 64,
      "bins in [2, 64] — the pair/triple algebra is bins^3")
    val binned = df.select(scoreCol.as("__s"),
        labelCol.cast("boolean").as("__y"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
      .select(binIndex(col("__s"), bins).as("bin"),
        when(col("__y"), lit(1L)).otherwise(lit(0L)).as("__yi"))
    // ONE corpus pass: the ≤bins-row bin table feeds the shared
    // fit-from-counts algebra
    isotonicFromBinCounts(binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__yi")).as("pos")))
  }

  /** The equal-width bin index shared by the batch fit and the
    * streaming bin counters ([[graft.streaming.StreamingOps]]) —
    * scores in [0,1], bin = min(floor(s·bins), bins−1). */
  private[graft] def binIndex(score: Column, bins: Int): Column =
    least(floor(score * lit(bins)), lit(bins - 1)).cast("long")

  /** The isotonic max–min algebra over a PRE-AGGREGATED
    * (bin, n, pos) counter table — shared by [[isotonicFit]] and
    * the streaming monitor's live bin-counter snapshots, so the
    * calibration curve a dashboard shows mid-stream is the exact
    * batch fit (the [[Fairness.auditFromCounts]] device). */
  def isotonicFromBinCounts(counts: DataFrame): DataFrame = {
    // the ≤bins-row table is materialized so the pair/triple algebra
    // below (4 consumers) never re-runs the upstream aggregate (the
    // marginRank discipline)
    val b = counts.select(col("bin"), col("n"), col("pos"))
      .localCheckpoint()
    // prefix sums over the ≤bins-row bin table (the single-partition
    // window is constant-size by construction, never corpus-sized)
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = b.select(col("bin"), col("n"), col("pos"),
      sum(col("n")).over(w).as("ncum"),
      sum(col("pos")).over(w).as("pcum"))
    val j = c.select(col("bin").as("jb"), col("n").as("jn"),
      col("pos").as("jp"), col("ncum").as("jnc"), col("pcum").as("jpc"))
    val k = c.select(col("bin").as("kb"), col("ncum").as("knc"),
      col("pcum").as("kpc"))
    val pairs = j.join(k, col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        ((col("kpc") - (col("jpc") - col("jp"))).cast("double") /
          (col("knc") - (col("jnc") - col("jn")))).as("m"))
    val i = c.select(col("bin").as("ib"))
    val mn = i.join(pairs,
        col("jb") <= col("ib") && col("kb") >= col("ib"))
      .groupBy(col("ib"), col("jb"))
      .agg(min(col("m")).as("mmin"))
    val iso = mn.groupBy(col("ib").as("bin"))
      .agg(max(col("mmin")).as("iso_rate"))
    b.join(iso, "bin")
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n")).as("raw_rate"),
        col("iso_rate"))
  }

  /** Split-conformal nonconformity thresholds: for each α in
    * `alphas`, the ⌈(1−α)(n_cal+1)⌉-th smallest value of
    * `nonconformityCol` over `cal`, plus the empirical coverage of
    * `nonconformity ≤ threshold` over `test`. `idCol` breaks order-
    * statistic ties deterministically. Output per α:
    * (alpha, n_cal, k_index, threshold, n_test, n_covered,
    * coverage, guarantee). */
  def conformalThresholds(cal: DataFrame, test: DataFrame,
      nonconformityCol: Column, idCol: Column,
      alphas: Seq[Double]): DataFrame = {
    require(alphas.nonEmpty && alphas.forall(a => a > 0 && a < 1),
      "alphas in (0, 1)")
    // the calibration slice is materialized once (scored + rank
    // consumers), and ALL α thresholds broadcast together so the
    // held-out slice is scanned exactly once regardless of |alphas|
    val scored = cal.select(nonconformityCol.as("__nc"),
        idCol.as("__id"))
      .filter(col("__nc").isNotNull)
      .localCheckpoint()
    val ranked = scored.select(col("__nc"),
      row_number().over(
        Window.orderBy(col("__nc"), col("__id"))).as("__rn"))
      .localCheckpoint()
    val n = scored.agg(count(lit(1)).as("n_cal"))
    val kIdxAll = alphas.map { a =>
      n.select(lit(a).as("alpha"), col("n_cal"),
        ceil(lit(1.0 - a) * (col("n_cal") + lit(1L)))
          .cast("long").as("k_index"))
    }.reduce(_ unionByName _)
    // k_index can EXCEED n_cal when α < 1/(n_cal+1): split conformal
    // defines the threshold as +∞ there (coverage trivially ≥ 1−α) —
    // a LEFT join keeps the α row instead of silently dropping it
    // (r11 review); the rank table is still scanned once for all α
    val found = ranked.join(broadcast(kIdxAll),
        col("__rn") === col("k_index"))
      .select(col("alpha").as("__fa"), col("__nc"))
    val thrAll = kIdxAll.join(broadcast(found),
        col("alpha") === col("__fa"), "left")
      .select(col("alpha"), col("n_cal"), col("k_index"),
        coalesce(col("__nc"), lit(Double.PositiveInfinity))
          .as("threshold"))
    val t = test.select(nonconformityCol.as("__tnc"))
      .filter(col("__tnc").isNotNull)
    t.crossJoin(broadcast(thrAll))
      .groupBy(col("alpha"), col("n_cal"), col("k_index"),
        col("threshold"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__tnc") <= col("threshold"), lit(1L))
          .otherwise(lit(0L))).as("n_covered"))
      .select(col("alpha"), col("n_cal"), col("k_index"),
        col("threshold"), col("n_test"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test"))
          .as("coverage"),
        (lit(1.0) - col("alpha")).as("guarantee"))
  }
}
