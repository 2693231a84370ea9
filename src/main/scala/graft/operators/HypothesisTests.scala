package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-shift and multiple-testing machinery for corpus
  * audits (builder brief: a release pipeline compares snapshots,
  * splits, and sources STATISTICALLY — "the validation split looks
  * different" and "which of 200 sources fail the digit audit" are
  * hypothesis-testing questions, and running 200 tests needs a
  * false-discovery correction, not 200 raw α's).
  *
  *  - [[ksTwoSample]] — exact two-sample Kolmogorov–Smirnov
  *    statistic D = sup_x |F_A(x) − F_B(x)| with the asymptotic
  *    α-level threshold c(α)·√((n_a+n_b)/(n_a·n_b)) (Smirnov 1948;
  *    c(0.05) = 1.358). The sup runs over the DISTINCT-value table
  *    (right-continuous ECDFs step only there), with the gap
  *    numerator kept in exact integers: |c_A·n_B − c_B·n_A|, as
  *    DECIMAL(38,0) products so 10⁹-row samples cannot overflow.
  *  - [[binomialBhAudit]] — per-group EXACT binomial test of a
  *    binary property against the pooled global rate, with
  *    Benjamini–Hochberg FDR control (Benjamini & Hochberg 1995)
  *    across the groups. The pmf is computed by the log-space
  *    recurrence ln pmf(j+1) = ln pmf(j) + ln((n−j)/(j+1)) +
  *    ln(p/(1−p)) — one row per (group, j ≤ n_g), a per-group
  *    prefix sum, NO factorials/lgamma — with every log and pmf
  *    term truncated to 12 decimals and summed over DECIMAL(38,12)
  *    (the BradleyTerry-grade contract), so both tails replay
  *    bit-identically in SQL. Probabilities below 10⁻¹² truncate to
  *    0 — decision-grade (BH thresholds live at α·r/m ≫ 10⁻⁹) and
  *    identical in both engines.
  *
  * Scale shape: KS = one distinct-value aggregate + a cumulative
  * window over that table (callers bin first when the column is
  * near-continuous — the sup over bin edges bounds the exact D
  * within the bin resolution). The binomial audit = one group
  * aggregate + a Σ(n_g+1)-row pmf grid with per-group prefix
  * windows + an m-row BH ranking — linear in the data, windowed
  * only over group-local grids. */
object HypothesisTests {

  private def t12(x: Column): Column =
    floor(x * lit(1e12)).cast("double") / lit(1e12)

  private def xsum12(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  /** Exact two-sample KS over `valueCol`, sample A = rows where
    * `isACol`. Output one row: (n_a, n_b, d_stat, crit, reject)
    * at the given asymptotic c(α) coefficient (1.358 ⇒ α = 0.05). */
  def ksTwoSample(df: DataFrame, valueCol: Column, isACol: Column,
      cAlpha: Double = 1.358): DataFrame = {
    // one distinct-value aggregate serves BOTH the ECDF steps and
    // the sample sizes — n_a/n_b MUST come from the same null-
    // filtered stream as the cumulants, or null values inflate the
    // denominators and understate D exactly when one sample has
    // more missing values (itself a drift symptom; r11 review)
    val vals = df.select(valueCol.as("v"),
        when(isACol, lit(1L)).otherwise(lit(0L)).as("a"))
      .filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(col("a")).as("na_v"),
        sum(lit(1L) - col("a")).as("nb_v"))
      .localCheckpoint()
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals.select(
      sum(col("na_v")).over(w).as("ca"),
      sum(col("nb_v")).over(w).as("cb"))
    val n = vals.agg(
      sum(col("na_v")).as("n_a"),
      sum(col("nb_v")).as("n_b"))
    cum.crossJoin(broadcast(n))
      .select(col("n_a"), col("n_b"),
        abs(col("ca").cast(DecimalType(38, 0)) * col("n_b") -
          col("cb").cast(DecimalType(38, 0)) * col("n_a"))
          .as("gap"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("gap")).as("d_num"))
      // an EMPTY sample (the isACol predicate matched nothing, or
      // everything) has no ECDF: under ANSI the n_a·n_b denominator
      // would THROW a divide-by-zero mid-audit. Emit the diagnostic
      // instead — null d_stat/crit, reject = false ("cannot test"),
      // with n_a/n_b showing WHICH side was empty (r12 advice)
      .select(col("n_a"), col("n_b"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          .otherwise(col("d_num").cast("double") /
            (col("n_a").cast("double") * col("n_b"))).as("d_stat"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          .otherwise(lit(cAlpha) *
            sqrt((col("n_a") + col("n_b")).cast("double") /
              (col("n_a").cast("double") * col("n_b")))).as("crit"))
      .withColumn("reject",
        coalesce(col("d_stat") > col("crit"), lit(false)))
  }

  /** Pearson chi-squared test of INDEPENDENCE between two
    * categorical columns (the family's categorical member next to
    * [[ksTwoSample]]'s continuous drift test and
    * [[binomialBhAudit]]'s per-group rate audit — "is quality-gate
    * acceptance independent of source?" is a contingency-table
    * question). X² = Σ_ij (O_ij·N − R_i·C_j)² / (N·R_i·C_j), the
    * N-scaled identity form that keeps the numerator's inner term
    * EXACT: O·N and R·C are DECIMAL(38,0) integer products (no
    * overflow through 10¹⁸-row tables), their difference casts to
    * double ONCE, and each cell term is t12-truncated and summed
    * over DECIMAL(38,12) — bit-replayable in SQL, no float
    * accumulation. The decision compares X² against a
    * caller-supplied critical value for the table's (r−1)(c−1)
    * degrees of freedom (the [[ksTwoSample]] cAlpha discipline —
    * the χ² inverse CDF is not elementary, and a release gate pins
    * its α and df anyway). Null category values are their own
    * level ("(null)") — a missing label is a category, not a
    * dropped row.
    *
    * Scale shape: ONE aggregate to the r·c-cell contingency table
    * (map-side combined), margins derived from those cells
    * (cell-table-sized aggregates), a broadcast totals row — the
    * corpus is scanned once; nothing downstream exceeds r·c rows.
    * Output one row: (n, n_rows, n_cols, dof, x2, crit, reject). */
  def chiSquaredIndependence(df: DataFrame, rowCol: Column,
      colCol: Column, crit: Double): DataFrame = {
    require(crit > 0, "crit must be positive")
    val Dec38 = DecimalType(38, 0)
    // cells fans out to 4 consumers → materialize once. persist(),
    // not localCheckpoint: the scratch contingency table is consumed
    // only INSIDE the operator, so it is freed below after the eager
    // one-row checkpoint — a localCheckpoint here leaked one
    // corpus-derived RDD per call for library callers outside the
    // Bench/Verify clearPool harnesses (r12 advice).
    val cells = df.select(
        coalesce(rowCol.cast("string"), lit("(null)")).as("__r"),
        coalesce(colCol.cast("string"), lit("(null)")).as("__c"))
      .groupBy(col("__r"), col("__c"))
      .agg(count(lit(1)).as("__o"))
      .persist()
    val rm = cells.groupBy(col("__r")).agg(sum(col("__o")).as("__rn"))
    val cm = cells.groupBy(col("__c")).agg(sum(col("__o")).as("__cn"))
    val tot = cells.agg(sum(col("__o")).as("__n"),
      count_distinct(col("__r")).as("__nr"),
      count_distinct(col("__c")).as("__nc"))
    val out = cells.join(rm, "__r").join(cm, "__c")
      .crossJoin(broadcast(tot))
      // d² via d·d, never pow(d, 2): multiplication is IEEE-exact
      // everywhere while pow is a libm call engines may round
      // differently at the last ulp
      .withColumn("__d",
        (col("__o").cast(Dec38) * col("__n") -
          col("__rn").cast(Dec38) * col("__cn")).cast("double"))
      .select(col("__n"), col("__nr"), col("__nc"),
        t12(col("__d") * col("__d") /
          (col("__n").cast("double") * col("__rn") * col("__cn")))
          .as("__t"))
      .groupBy(col("__n"), col("__nr"), col("__nc"))
      .agg(xsum12(col("__t")).as("x2"))
      .select(col("__n").as("n"), col("__nr").as("n_rows"),
        col("__nc").as("n_cols"),
        ((col("__nr") - 1) * (col("__nc") - 1)).as("dof"),
        col("x2"), lit(crit).as("crit"),
        (col("x2") > lit(crit)).as("reject"))
      // eager ONE-ROW checkpoint forces the cells cache and lets the
      // scratch table free immediately; the surviving block is a
      // single decision row, not a contingency table
      .localCheckpoint()
    cells.unpersist(blocking = false)
    out
  }

  /** [[chiSquaredIndependence]] PER VARIANT: one independence test
    * for every value of `variantCol`, in one pass — the per-segment
    * form ("is acceptance independent of source, per language / per
    * snapshot / per planted effect size?") and the engine the
    * power-sweep query drives (the q147 sweep device: plant a known
    * association at a grid of strengths as variants, and the reject
    * column traces the test's detection threshold at this n and
    * crit). Identical N-scaled exact arithmetic per variant; every
    * aggregate gains the variant key, margins/totals join back on
    * it (variant-sized tables — AQE broadcasts them), the corpus is
    * still scanned once. Output one row per variant:
    * (variant, n, n_rows, n_cols, dof, x2, w, crit, reject) — `w` is
    * the measured Cohen effect size √(X²/n), the scale-free column
    * two sweeps at different n compare by. */
  def chiSquaredIndependenceBy(df: DataFrame, variantCol: Column,
      rowCol: Column, colCol: Column, crit: Double): DataFrame = {
    require(crit > 0, "crit must be positive")
    val Dec38 = DecimalType(38, 0)
    // a null variant is its own segment, same contract as the
    // category columns — and the equi-joins below would silently
    // DROP null keys otherwise (r12.2 review). The literal string
    // "(null)" is RESERVED by this contract: a real variant or
    // category value equal to it merges with the null level, by
    // design and mirrored in every oracle replay — callers with a
    // live "(null)" label must rename it first (r12 advice,
    // documented rather than re-keyed: the sentinel is part of the
    // registered oracle arithmetic).
    // persist(), not localCheckpoint — freed after the eager
    // variant-sized checkpoint below (same leak fix as the
    // single-table variant).
    val cells = df.select(
        coalesce(variantCol.cast("string"), lit("(null)"))
          .as("variant"),
        coalesce(rowCol.cast("string"), lit("(null)")).as("__r"),
        coalesce(colCol.cast("string"), lit("(null)")).as("__c"))
      .groupBy(col("variant"), col("__r"), col("__c"))
      .agg(count(lit(1)).as("__o"))
      .persist()
    val rm = cells.groupBy(col("variant"), col("__r"))
      .agg(sum(col("__o")).as("__rn"))
    val cm = cells.groupBy(col("variant"), col("__c"))
      .agg(sum(col("__o")).as("__cn"))
    val tot = cells.groupBy(col("variant"))
      .agg(sum(col("__o")).as("__n"),
        count_distinct(col("__r")).as("__nr"),
        count_distinct(col("__c")).as("__nc"))
    val out = cells.join(rm, Seq("variant", "__r"))
      .join(cm, Seq("variant", "__c"))
      .join(tot, Seq("variant"))
      .withColumn("__d",
        (col("__o").cast(Dec38) * col("__n") -
          col("__rn").cast(Dec38) * col("__cn")).cast("double"))
      .select(col("variant"), col("__n"), col("__nr"), col("__nc"),
        t12(col("__d") * col("__d") /
          (col("__n").cast("double") * col("__rn") * col("__cn")))
          .as("__t"))
      .groupBy(col("variant"), col("__n"), col("__nr"), col("__nc"))
      .agg(xsum12(col("__t")).as("x2"))
      .select(col("variant"), col("__n").as("n"),
        col("__nr").as("n_rows"), col("__nc").as("n_cols"),
        ((col("__nr") - 1) * (col("__nc") - 1)).as("dof"),
        col("x2"),
        t12(sqrt(col("x2") / col("__n").cast("double"))).as("w"),
        lit(crit).as("crit"),
        (col("x2") > lit(crit)).as("reject"))
      // eager variant-sized checkpoint → cells freed immediately
      .localCheckpoint()
    cells.unpersist(blocking = false)
    out
  }

  /** Per-group exact binomial test of P(property) against the
    * POOLED rate, BH-corrected at FDR `alpha`. Output per group:
    * (groupName, n, k, rate, p_value, bh_rank, rejected) —
    * two-sided p by the doubled-smaller-tail convention, capped at
    * 1. Groups are ranked by (p, group) and BH rejects every rank ≤
    * the largest r with p_(r) ≤ r·α/m. */
  def binomialBhAudit(df: DataFrame, groupCol: Column,
      groupName: String, propertyCol: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0, 1)")
    val g = df.select(groupCol.as(groupName),
        when(propertyCol, lit(1L)).otherwise(lit(0L)).as("__x"))
      .groupBy(col(groupName))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("k"))
      .localCheckpoint()
    val tot = g.agg(sum(col("n")).as("__nt"), sum(col("k")).as("__kt"))
      .select((col("__kt").cast("double") / col("__nt")).as("__p0"))
    // per-group pmf grid j = 0..n under p0, via the log recurrence;
    // lnr(j) = ln((n-j+1)/j) + ln(p0/(1-p0)) is the step INTO j
    val grid = g.crossJoin(broadcast(tot))
      .select(col(groupName), col("n"), col("k"), col("__p0"),
        // ANSI double division THROWS on zero and log(0) is invalid,
        // so a degenerate pooled rate (p0 ∈ {0,1}) needs a sentinel
        // INSIDE the log/division arguments — the downstream p-value
        // override makes every sentinel-derived pmf irrelevant
        when(col("__p0") <= lit(0.0) || col("__p0") >= lit(1.0),
          lit(0.5)).otherwise(col("__p0")).as("__sp0"),
        explode(sequence(lit(0L), col("n"))).as("j"))
    val stepped = grid.withColumn("__lnr",
      when(col("j") === 0L, lit(0.0)).otherwise(
        t12(log((col("n") - col("j") + lit(1L)).cast("double") /
          col("j"))) +
          t12(log(col("__sp0") / (lit(1.0) - col("__sp0"))))))
    val wj = Window.partitionBy(col(groupName)).orderBy(col("j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pmf = stepped
      .withColumn("__lnpmf",
        // n as DECIMAL(12,0): 12+20+1 = 33 keeps scale 12 exact —
        // wider factors would push precision past 38 and Spark
        // trims the SCALE (the q307 lesson)
        (col("n").cast(DecimalType(12, 0)) *
          t12(log(lit(1.0) - col("__sp0"))).cast(DecimalType(20, 12)))
          .cast("double") +
          // over() must attach to the aggregate itself — wrapping
          // the cast makes the analyzer read sum() as a grouped
          // aggregate (MISSING_GROUP_BY)
          sum(col("__lnr").cast(DecimalType(38, 12))).over(wj)
            .cast("double"))
      .withColumn("__pmf", t12(exp(col("__lnpmf"))))
    val tails = pmf.groupBy(col(groupName), col("n"), col("k"),
        col("__p0"))
      .agg(
        xsum12(when(col("j") <= col("k"), col("__pmf"))
          .otherwise(lit(0.0))).as("__lo"),
        xsum12(when(col("j") >= col("k"), col("__pmf"))
          .otherwise(lit(0.0))).as("__hi"))
      .select(col(groupName), col("n"), col("k"),
        (col("k").cast("double") / col("n")).as("rate"),
        // degenerate pooled rate (every row has / lacks the
        // property): ln(p0/(1−p0)) is log-of-zero → NULL pmf → null
        // p-values that bhReject would rank FIRST; the only
        // consistent observation under p0 ∈ {0,1} is the pooled one
        // itself, so p = 1 and nothing rejects (r11 review)
        when(col("__p0") <= lit(0.0) || col("__p0") >= lit(1.0),
          lit(1.0))
          .otherwise(least(lit(1.0),
            lit(2.0) * least(col("__lo"), col("__hi"))))
          .as("p_value"))
    bhReject(tails, groupName, alpha)
  }

  /** Benjamini–Hochberg step-up selection over a (…, p_value) frame:
    * rank by (p, group), reject every rank ≤ the LARGEST r with
    * p_(r) ≤ r·α/m — including any intermediate rank that itself
    * failed its threshold (the step-up property that distinguishes
    * BH from naive per-rank thresholding). All input columns pass
    * through; adds bh_rank and rejected. Group-table-sized. */
  def bhReject(tails: DataFrame, groupName: String,
      alpha: Double): DataFrame = {
    val m = tails.agg(count(lit(1)).as("__m"))
    val ranked = tails.crossJoin(broadcast(m))
      .withColumn("bh_rank", row_number().over(
          Window.orderBy(col("p_value"), col(groupName)))
        .cast("long"))
      .withColumn("__pass",
        col("p_value") <= col("bh_rank").cast("double") *
          lit(alpha) / col("__m"))
    val cutoff = ranked
      .agg(max(when(col("__pass"), col("bh_rank")).otherwise(lit(0L)))
        .as("__cut"))
    ranked.crossJoin(broadcast(cutoff))
      .drop("__m", "__pass")
      .withColumn("rejected", col("bh_rank") <= col("__cut"))
      .drop("__cut")
  }
}
