package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Power-law (Zipf) rank–frequency fitting — the corpus-statistics
  * check every tokenizer/vocab decision leans on: OLS of
  * ln f = a + b·ln r over the top-R frequency ranks. A healthy
  * natural-language corpus fits b ≈ −1 with high R²; a corpus of
  * templated/boilerplate text or a broken tokenizer shows up
  * immediately as a flattened slope or a poor fit (Zipf 1949;
  * Clauset et al. 2009 for why the tail needs care — hence the
  * explicit top-R cut rather than an all-types fit).
  *
  * Exactness: x = ln r and y = ln f are 9-decimal-truncated, every
  * product term is re-truncated, and all sums run over
  * DECIMAL(38,9) — order-free — so the closed-form OLS output is
  * bit-identical in any replaying engine.
  *
  * Scale shape: one hash aggregate to the type table (vocabulary-
  * bounded, the BPE-training contract), a sort-limit to the top R
  * (TakeOrderedAndProject — never a full sort), and a rank window
  * over ≤ R rows (parameter-bounded, never data-bounded). */
object PowerLaw {

  private def t9(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  private def xsum(c: Column): Column =
    sum(c.cast(DecimalType(38, 9))).cast("double")

  /** OLS power-law fit over the top `topR` ranks of a
    * `(termCol, countCol)` frequency table. Ranks are 1-based in
    * (count DESC, term ASC) order — the tie-break keeps the fit
    * deterministic. Returns one row:
    * `(n_ranks, slope, intercept, r2)` — slope is the Zipf
    * exponent (≈ −1), intercept the ln-scale amplitude. */
  def zipfFit(counts: DataFrame, termCol: String, countCol: String,
      topR: Int = 200): DataFrame = {
    require(topR >= 2, "need at least two ranks to fit")
    val top = counts
      .select(col(termCol).as("t"), col(countCol).cast("long").as("c"))
      .orderBy(col("c").desc, col("t")).limit(topR)
    val ranked = top.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("t"))))
    val pts = ranked.select(
      ln9(col("rank").cast("double")).as("x"),
      ln9(col("c").cast("double")).as("y"))
    olsFit(pts, "n_ranks")
  }

  /** OLS power-law fit of `yCol = K·xCol^b` on ANY positive (x, y)
    * frame — ln9 both coordinates and fit; the Heaps'-law
    * vocabulary-growth exponent is `logLogFit(vocabGrowth(...),
    * "n_tokens", "n_types")`. Rows with a non-positive coordinate
    * are excluded (their log is undefined). Returns one row:
    * `(n_points, slope, intercept, r2)`. */
  def logLogFit(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val pts = df.where(col(xCol) > 0 && col(yCol) > 0)
      .select(ln9(col(xCol).cast("double")).as("x"),
        ln9(col(yCol).cast("double")).as("y"))
    olsFit(pts, "n_points")
  }

  /** Per-group Zipf fit: the [[zipfFit]] arithmetic with ranks and
    * OLS moments PARTITIONED by `groupCol` — one row per group
    * (`groupCol, n_ranks, slope, intercept, r2`). The rank window
    * is per-group-vocabulary-bounded; moments are one grouped
    * aggregate. */
  def zipfFitByGroup(counts: DataFrame, groupCol: String,
      termCol: String, countCol: String, topR: Int = 200)
      : DataFrame = {
    require(topR >= 2, "need at least two ranks to fit")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(countCol).desc, col(termCol))
    val pts = counts
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topR)
      .select(col(groupCol),
        ln9(col("rank").cast("double")).as("x"),
        ln9(col(countCol).cast("double")).as("y"))
    olsFit(pts, "n_ranks", Seq(groupCol))
  }

  /** The shared exact-decimal OLS closed form over a `(x, y)` point
    * frame (coordinates already 9-decimal-truncated), optionally
    * grouped. */
  private def olsFit(pts: DataFrame, nAlias: String,
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n"),
      xsum(col("x")).as("sx"), xsum(col("y")).as("sy"),
      xsum(t9(col("x") * col("x"))).as("sxx"),
      xsum(t9(col("x") * col("y"))).as("sxy"),
      xsum(t9(col("y") * col("y"))).as("syy"))
    val s = pts.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    val r2num = (col("n") * col("sxy") - col("sx") * col("sy")) *
      (col("n") * col("sxy") - col("sx") * col("sy"))
    val r2den = (col("n") * col("sxx") - col("sx") * col("sx")) *
      (col("n") * col("syy") - col("sy") * col("sy"))
    s.select(groupCols.map(col) ++ Seq(col("n").as(nAlias),
      slope.as("slope"),
      ((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
      (r2num / r2den).as("r2")): _*)
  }
}
