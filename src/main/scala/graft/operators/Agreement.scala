package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-rater agreement statistics — the QA gate preference/RLHF
  * label sets pass before training on them: Fleiss' κ (Fleiss 1971)
  * for "how much do R raters agree beyond chance across the corpus"
  * and pairwise Cohen's κ (Cohen 1960) for "which RATER disagrees
  * with whom" (the drifting-annotator detector). The reference has
  * no labeling QA surface; this extends the SFT/preference family
  * (q206–q208) the way real pipelines consume it.
  *
  * Exactness device: both κ statistics are ratios of INTEGER
  * quantities (squared cell counts, marginal products), so every
  * aggregation here is integer — exact and order-free under any
  * partitioning — and the ONLY floating-point step is one final
  * BIGINT→DOUBLE division, which is bit-identical in any IEEE
  * engine. κ is additionally emitted as its integer numerator /
  * denominator pair so the oracle can check the exact rationals.
  *
  * Scale shape: fleiss = two hash aggregates ((item,label) cells →
  * per-item moments) plus label marginals, all map-side-combinable;
  * cohen = one self-join of the (rater,item,label) frame on item
  * (R·N rows, R small) plus a broadcast-sized marginal product. No
  * windows, no driver state; result frames are 1 row / R² rows. */
object Agreement {

  /** Fleiss' κ over `(itemCol, raterCol, labelCol)` rows, one label
    * per (item, rater). Requires the same rater count R per item
    * (the balanced design Fleiss defines; `r_min`/`r_max` are
    * emitted so a caller can SEE a violated precondition rather
    * than trust a silent wrong number).
    *
    * With n_ij = raters giving item i label j, N items, R raters:
    *   A      = Σ_i Σ_j n_ij²
    *   P̄     = (A − N·R) / (N·R·(R−1))
    *   P_e    = Σ_j c_j² / (N·R)²           (c_j = Σ_i n_ij)
    *   κ      = (P̄ − P_e) / (1 − P_e)
    *          = [ (A − NR)·(NR)² − NR(R−1)·Σc_j² ]
    *            / [ NR(R−1)·((NR)² − Σc_j²) ]      — all integer. */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
      labelCol: String): DataFrame = {
    val cells = df.groupBy(col(itemCol), col(labelCol))
      .agg(count(lit(1)).as("n"))
    val perItem = cells.groupBy(col(itemCol))
      .agg(sum(col("n")).as("r"),
        sum(col("n") * col("n")).as("s2"))
    val marg = cells.groupBy(col(labelCol))
      .agg(sum(col("n")).as("c"))
      .agg(sum(col("c") * col("c")).as("sum_c2"),
        count(lit(1)).as("n_labels"))
    val tot = perItem.agg(count(lit(1)).as("n_items"),
      sum(col("r")).as("nr"),
      sum(col("s2")).as("a"),
      min(col("r")).as("r_min"), max(col("r")).as("r_max"))
    tot.crossJoin(broadcast(marg))
      .withColumn("r_raters", col("r_max"))
      .withColumn("num",
        (col("a") - col("nr")) * col("nr") * col("nr") -
          col("nr") * (col("r_raters") - 1) * col("sum_c2"))
      .withColumn("den",
        col("nr") * (col("r_raters") - 1) *
          (col("nr") * col("nr") - col("sum_c2")))
      .withColumn("kappa",
        col("num").cast("double") / col("den").cast("double"))
      .select("n_items", "r_min", "r_max", "n_labels",
        "num", "den", "kappa")
  }

  /** Pairwise Cohen's κ: one row per unordered rater pair (a < b).
    * With n common items, agree = |{i : label_a(i) = label_b(i)}|,
    * and S = Σ_j m_aj·m_bj (marginal product over labels):
    *   κ = (n·agree − S) / (n² − S)           — all integer.
    *
    * The marginals m_aj / m_bj are computed over the pair's COMMON
    * items (the joined frame), not over all items each rater ever
    * labeled — when raters rate different item subsets the
    * chance-agreement term P_e is only defined on the items both
    * actually rated (Cohen 1960's table is the pair's own
    * contingency table). A pair sharing no label values at all gets
    * S = 0 (κ = agree/n). */
  def cohenKappaPairs(df: DataFrame, itemCol: String,
      raterCol: String, labelCol: String): DataFrame = {
    val lab = df.select(col(itemCol).as("item"),
      col(raterCol).as("rater"), col(labelCol).as("label"))
    val a = lab.select(col("item"), col("rater").as("rater_a"),
      col("label").as("label_a"))
    val b = lab.select(col("item"), col("rater").as("rater_b"),
      col("label").as("label_b"))
    // 3 aggregation consumers below (pairs, ma, mb) — materialize
    // the R²-fan-out self-join once, not three times (the marginRank
    // discipline)
    val joined = a.join(b, Seq("item"))
      .where(col("rater_a") < col("rater_b"))
      .localCheckpoint()
    val pairs = joined
      .groupBy(col("rater_a"), col("rater_b"))
      .agg(count(lit(1)).as("n_items"),
        count(when(col("label_a") === col("label_b"), 1))
          .as("n_agree"))
    val ma = joined
      .groupBy(col("rater_a"), col("rater_b"), col("label_a"))
      .agg(count(lit(1)).as("m_a"))
      .withColumnRenamed("label_a", "label")
    val mb = joined
      .groupBy(col("rater_a"), col("rater_b"), col("label_b"))
      .agg(count(lit(1)).as("m_b"))
      .withColumnRenamed("label_b", "label")
    val s = ma.join(mb, Seq("rater_a", "rater_b", "label"))
      .groupBy(col("rater_a"), col("rater_b"))
      .agg(sum(col("m_a") * col("m_b")).as("s"))
    pairs.join(s, Seq("rater_a", "rater_b"), "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("num", col("n_items") * col("n_agree") - col("s"))
      .withColumn("den",
        col("n_items") * col("n_items") - col("s"))
      .withColumn("kappa",
        col("num").cast("double") / col("den").cast("double"))
      .select("rater_a", "rater_b", "n_items", "n_agree",
        "num", "den", "kappa")
  }
}
