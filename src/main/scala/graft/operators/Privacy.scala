package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / disclosure-risk auditing for training corpora (builder
  * brief: operations a large-scale training-data pipeline needs —
  * corpora built from user-generated or licensed data ship with a
  * re-identification audit the same way they ship a datasheet).
  *
  * Model (Sweeney 2002, k-anonymity; Machanavajjhala et al. 2007,
  * l-diversity): a row's quasi-identifier (QI) tuple is the
  * combination of externally-linkable attributes (region, segment,
  * binned numeric). A release is k-anonymous when every emitted QI
  * group holds ≥ k rows, and l-diverse when every group carries ≥ l
  * distinct values of the sensitive attribute — k alone does not
  * stop attribute disclosure when a group is sensitive-homogeneous.
  *
  * Scale shape: every audit is ONE hash aggregate over the QI tuple
  * (map-side combined); the generalization ladder is L such
  * aggregates (one per rung) joined back to rows on the grouped key
  * — the group tables are ≤ |distinct QI| rows, far smaller than the
  * corpus, so the joins are standard shuffle-hash/broadcast joins on
  * aggregated frames, never row×row work. No windows, no driver
  * state, no UDFs — all codegen'd native functions, which is also
  * what lets the DuckDB oracle replay every decision value-exactly.
  */
object Privacy {

  /** Deterministic equi-width bin for a numeric quasi-identifier:
    * floor(x / width) — the generalization device both engines
    * reproduce bit-identically (floor of an IEEE division). */
  def bin(c: Column, width: Double): Column =
    floor(c / lit(width)).cast("long")

  /** Per-QI-group disclosure audit: group size, k-anonymity flag,
    * l-diversity (exact distinct count of `sensitiveCol` within the
    * group), and the l-diversity flag. One aggregate pass. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[Column],
      quasiNames: Seq[String], sensitiveCol: Column,
      k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.length == quasiNames.length,
      "one name per quasi-identifier column")
    require(k >= 1 && l >= 1, "k and l must be >= 1")
    df.groupBy(quasiCols.zip(quasiNames).map { case (c, n) => c.as(n) }: _*)
      .agg(
        count(lit(1)).as("group_size"),
        countDistinct(sensitiveCol).as("l_diversity"))
      .withColumn("k_anonymous", col("group_size") >= k)
      .withColumn("l_diverse", col("l_diversity") >= l)
  }

  /** Suppression release: keep only rows whose QI group has ≥ k
    * members (the minimal k-anonymity enforcement — no
    * generalization, rows in small groups are dropped). Implemented
    * as an aggregate on the QI tuple joined back on the same tuple,
    * so the filter decision is exactly the audit's. */
  def suppress(df: DataFrame, quasiCols: Seq[Column], k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val names = quasiCols.indices.map(i => s"__qi_$i")
    val keyed = df.withColumns(names.zip(quasiCols).toMap)
    val big = keyed.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("__gs"))
      .filter(col("__gs") >= k)
      .drop("__gs")
    keyed.join(big, names, "left_semi").drop(names: _*)
  }

  /** Generalization ladder (the Datafly/Incognito full-domain
    * device specialized to one numeric QI): each row is anchored at
    * the FINEST bin width (first element of `widths`, ordered fine →
    * coarse) at which its (categorical QIs × binned numeric) group
    * reaches k; rows failing every rung are `suppressed`. Returns the
    * input plus `anchor_level` ("w<width>" or "suppressed") and
    * `anchor_group_size` (the group size at the anchoring rung; null
    * when suppressed).
    *
    * Monotonicity note: coarser bins merge finer ones, so group size
    * is non-decreasing up the ladder — the first-satisfying rung is
    * well-defined and nested under re-runs with a widths prefix. */
  def generalizationLadder(df: DataFrame, catQuasi: Seq[Column],
      catNames: Seq[String], numCol: Column, widths: Seq[Double],
      k: Int): DataFrame = {
    require(widths.nonEmpty && widths == widths.sorted,
      "widths must be ordered fine to coarse")
    require(k >= 1, "k must be >= 1")
    val catKeyed = df.withColumns(
      catNames.zip(catQuasi).toMap + ("__num" -> numCol))
    val withBins = widths.zipWithIndex.foldLeft(catKeyed) {
      case (d, (w, i)) => d.withColumn(s"__b_$i", bin(col("__num"), w))
    }
    val joined = widths.indices.foldLeft(withBins) { case (d, i) =>
      val keys = catNames :+ s"__b_$i"
      val counts = withBins.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as(s"__gs_$i"))
      d.join(counts, keys)
    }
    val anchor = widths.zipWithIndex
      .foldRight(lit("suppressed")) { case ((w, i), elseCol) =>
        when(col(s"__gs_$i") >= k,
          lit(if (w == w.floor) s"w${w.toLong}" else s"w$w"))
          .otherwise(elseCol)
      }
    val anchorSize = widths.indices
      .foldRight(lit(null).cast("long")) { case (i, elseCol) =>
        when(col(s"__gs_$i") >= k, col(s"__gs_$i")).otherwise(elseCol)
      }
    joined
      .withColumn("anchor_level", anchor)
      .withColumn("anchor_group_size", anchorSize)
      .drop("__num")
      .drop(widths.indices.map(i => s"__b_$i"): _*)
      .drop(widths.indices.map(i => s"__gs_$i"): _*)
  }

  /** Strong-diversity audit (Machanavajjhala et al. 2007, §3-4):
    * distinct-l (q271's check) is the WEAK form — a group can hold l
    * distinct sensitive values yet be 98% one value. This audit adds
    * the paper's two strengthenings per QI group:
    *
    *  - ENTROPY l-diversity: −Σ p_s·ln p_s ≥ ln l, computed as
    *    ln(n_g) − (Σ n_s·ln n_s)/n_g so every aggregation is over
    *    exact terms (trunc9 ln per cell, DECIMAL(18,9) sum — the
    *    [[graft.operators.LanguageModel]] portability discipline);
    *  - RECURSIVE (c,l)-diversity: r₁ < c·(r_l + … + r_m) over the
    *    DESCENDING-sorted cell counts r — pure integer arithmetic
    *    (the tail sum is tie-order invariant: tied counts are equal,
    *    so which tied cell lands on rank l doesn't change the sum).
    *
    * Scale shape: one aggregate to (QI, value) cells, one m-row-per-
    * group window for the rank, one group aggregate — same contract
    * as [[kAnonymityAudit]], never row×row. */
  def diversityAudit(df: DataFrame, quasiCols: Seq[Column],
      quasiNames: Seq[String], sensitiveCol: Column,
      l: Int, c: Int): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.length == quasiNames.length,
      "one name per quasi-identifier column")
    require(l >= 2 && c >= 1, "l >= 2 and c >= 1")
    def ln9(x: Column): Column =
      floor(log(x) * lit(1e9)).cast("double") / lit(1e9)
    val cells = df.select(
        quasiCols.zip(quasiNames).map { case (qc, n) => qc.as(n) } :+
          sensitiveCol.as("__s"): _*)
      .groupBy((quasiNames.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__ns"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiNames.map(col): _*)
      .orderBy(col("__ns").desc, col("__s"))
    val ranked = cells.withColumn("__rk", row_number().over(w))
    val out = ranked.groupBy(quasiNames.map(col): _*)
      .agg(
        sum(col("__ns")).as("group_size"),
        count(lit(1)).as("n_distinct"),
        max(col("__ns")).as("r1"),
        sum(when(col("__rk") >= l, col("__ns")).otherwise(lit(0L)))
          .as("tail_sum"),
        // count factor as DECIMAL(12,0): DECIMAL(18,9) × BIGINT
        // would need precision 18+20+1 > 38, and Spark's
        // allowPrecisionLoss trims the SCALE to 8 — rounding the
        // 9th decimal the oracle keeps. 18+12+1 = 31 stays exact.
        sum((ln9(col("__ns")).cast(DecimalSum) *
            col("__ns").cast(DecimalCnt)))
          .as("__nslnns"))
      .withColumn("entropy",
        ln9(col("group_size")) -
          col("__nslnns").cast("double") / col("group_size"))
      .withColumn("entropy_l_diverse",
        col("entropy") >= lit(math.floor(math.log(l) * 1e9) / 1e9))
      .withColumn("recursive_cl_diverse",
        col("r1") < lit(c) * col("tail_sum"))
      .drop("__nslnns")
    out.select((quasiNames.map(col) :+ col("group_size") :+
      col("n_distinct") :+ col("entropy") :+
      col("entropy_l_diverse") :+ col("r1") :+ col("tail_sum") :+
      col("recursive_cl_diverse")): _*)
  }

  private val DecimalSum =
    org.apache.spark.sql.types.DecimalType(18, 9)
  private val DecimalCnt =
    org.apache.spark.sql.types.DecimalType(12, 0)

  /** Differentially-private count release (Dwork, McSherry, Nissim &
    * Smith 2006 — the Laplace mechanism): per-group counts plus
    * Laplace(Δ/ε) noise with sensitivity Δ=1 (one individual moves
    * one count by one). Noise is DETERMINISTIC given `seed` — the
    * uniform comes from md5 over (seed, group key), mapped through
    * the inverse CDF
    *   noise = −(1/ε)·sgn(u−½)·ln(1 − 2|u−½|),
    * so an auditor (and the oracle) can replay the release bit-
    * exactly; a production release would swap the seed for entropy
    * while keeping the mechanism identical. u = (v+½)/2²⁴ with v a
    * 24-bit md5 slice can never hit ½ exactly nor drive the ln
    * argument to 0. The ln is trunc9'd (engine-portable); the rest
    * is one multiply chain per group. One aggregate pass; the noise
    * projection is map-only over the group table. */
  def laplaceRelease(df: DataFrame, groupCols: Seq[Column],
      groupNames: Seq[String], epsilon: Double,
      seed: String, sensitivity: Double = 1.0): DataFrame = {
    require(groupCols.nonEmpty && groupCols.length == groupNames.length,
      "one name per group column")
    require(epsilon > 0, "epsilon must be positive")
    require(sensitivity > 0, "sensitivity must be positive")
    def ln9(x: Column): Column =
      floor(log(x) * lit(1e9)).cast("double") / lit(1e9)
    val counts = df.groupBy(
        groupCols.zip(groupNames).map { case (gc, n) => gc.as(n) }: _*)
      .agg(count(lit(1)).as("true_count"))
    val key = concat_ws("",
      (lit(seed) +: groupNames.map(n => col(n).cast("string"))): _*)
    val v = conv(substring(md5(key), 1, 6), 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(16777216.0)
    val shifted = u - lit(0.5)
    val sgn = when(shifted >= 0, lit(1.0)).otherwise(lit(-1.0))
    val noise = -(lit(sensitivity) / lit(epsilon)) * sgn *
      ln9(lit(1.0) - lit(2.0) * abs(shifted))
    counts
      .withColumn("noise", noise)
      .withColumn("noisy_count",
        col("true_count").cast("double") + col("noise"))
      .withColumn("released_count",
        // floor(x+½), not round(): both engines floor identically,
        // where round() half-case conventions could differ
        greatest(floor(col("noisy_count") + lit(0.5)).cast("long"),
          lit(0L)))
      .withColumn("epsilon", lit(epsilon))
      .withColumn("sensitivity", lit(sensitivity))
  }

  /** User-level contribution bounding (the practical companion of
    * [[laplaceRelease]] — Wilson et al. 2020, "Differentially
    * private SQL with bounded user contributions"): COUNT sensitivity
    * is "how much can ONE user move the answer", which for raw event
    * tables is unbounded. Capping each user at `cap` rows (a
    * deterministic per-user row_number, `orderCol` as the keep
    * preference) makes the sensitivity exactly `cap`, which the
    * release must then use as its noise scale. Returns the capped
    * frame; the per-user window is the one data-sized operation and
    * shuffles on the user key exactly once. */
  def boundContribution(df: DataFrame, userCol: Column,
      orderCol: Column, cap: Int): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) over an
    * ORDERED sensitive attribute: k/l alone don't stop attribute
    * disclosure when a group's sensitive DISTRIBUTION skews from the
    * corpus's (a group that is 90% top-decile leaks even with l
    * distinct values). Per QI group, the ordered Earth-Mover's
    * Distance between the group's and the global sensitive
    * distribution: EMD = (1/(m−1)) Σ_i |Σ_{j≤i} (Q_j − P_j)|.
    *
    * Exactness device: cross-multiplied INTEGER cumulants
    * D_i = Σ_{j≤i} (n_gj·N − n_j·n_g) — every aggregation is
    * integer and order-free; EMD = Σ|D_i| / (N·n_g·(m−1)) is
    * emitted as its exact num/den pair plus one final double
    * division (the Agreement-family contract).
    *
    * Scale shape: one aggregate to the (QI, value) cell table, a
    * broadcast of the m-row global distribution, a cumulative
    * window PARTITIONED BY the QI group over m rows per group
    * (m = distinct sensitive values, bounded), one final group
    * aggregate. Missing (group, value) cells materialize via the
    * broadcast value grid so cumulants never skip a step. */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[Column],
      quasiNames: Seq[String], sensitiveCol: Column,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.length == quasiNames.length,
      "one name per quasi-identifier column")
    require(t > 0 && t <= 1, "t in (0, 1]")
    val keyed = df.select(
      quasiCols.zip(quasiNames).map { case (c, n) => c.as(n) } :+
        sensitiveCol.as("__s"): _*)
    val cells = keyed.groupBy(
        (quasiNames.map(col) :+ col("__s")): _*)
      .agg(count(lit(1)).as("__ng_s"))
    val groups = cells.groupBy(quasiNames.map(col): _*)
      .agg(sum(col("__ng_s")).as("__ng"))
    val global = cells.groupBy(col("__s"))
      .agg(sum(col("__ng_s")).as("__n_s"))
    val totals = global.agg(sum(col("__n_s")).as("__n"),
      count(lit(1)).as("__m"))
    // dense (group × value) grid so every cumulant step exists
    val grid = groups.crossJoin(broadcast(global))
      .join(cells, quasiNames :+ "__s", "left")
      .withColumn("__ng_s", coalesce(col("__ng_s"), lit(0L)))
      .crossJoin(broadcast(totals))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiNames.map(col): _*)
      .orderBy(col("__s"))
    val cum = grid.withColumn("__d",
      sum(col("__ng_s") * col("__n") - col("__n_s") * col("__ng"))
        .over(w))
    val out = cum.groupBy(
        (quasiNames.map(col) :+ col("__ng").as("group_size") :+
          col("__n") :+ col("__m")): _*)
      .agg(sum(abs(col("__d"))).as("emd_num"))
      .withColumn("emd_den",
        col("__n") * col("group_size") * (col("__m") - 1))
      .withColumn("emd",
        col("emd_num").cast("double") / col("emd_den").cast("double"))
      .withColumn("t_close", col("emd") <= t)
    out.select((quasiNames.map(col) :+ col("group_size") :+
      col("emd_num") :+ col("emd_den") :+ col("emd") :+
      col("t_close")): _*)
  }
}
