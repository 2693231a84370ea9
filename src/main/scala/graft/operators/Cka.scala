package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Centered Kernel Alignment, linear form (Kornblith, Norouzi, Lee &
  * Hinton, ICML 2019, "Similarity of Neural Network Representations
  * Revisited") — the standard scalar for "how similar are two
  * representations of the SAME items":
  *
  *   CKA(X, Y) = ‖C_xy‖²_F / (‖C_xx‖_F · ‖C_yy‖_F)
  *
  * over column-centered features (the feature-space identity of the
  * biased linear-HSIC estimator; any common scaling of the
  * covariance cells cancels, so the E[·]/n cell normalization shared
  * with [[Pca.covariance]] is exact here too). A corpus pipeline
  * reaches for this to audit representation drift: embedding-model
  * upgrades, dimensionality reduction, or — the q316 use —
  * quantization (how much geometry does int8 keep?).
  *
  * Scale shape: X and Y are CONCATENATED per row into one 2d-dim
  * array and fed through a single [[Pca.covariance]] build, so all
  * three blocks (C_xx upper-left, C_xy upper-right, C_yy
  * lower-right) come from the same two corpus passes (mean pass +
  * cell pass, the q174 contract) and the (2d)² cell table reduces in
  * ONE aggregate — nothing else touches the data. */
object Cka {

  private def t9(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  /** Linear CKA between two d-dim array columns over the same rows.
    * Output: one row (dim, hsic_xy, norm_xx, norm_yy, cka) where
    * hsic_xy = ‖C_xy‖²_F and norm_xx/yy = ‖C_xx‖²_F / ‖C_yy‖²_F
    * (squared — the sqrt happens once, inside the cka ratio). */
  def linearCka(df: DataFrame, xCol: Column, yCol: Column,
      d: Int): DataFrame = {
    require(d >= 1, "d must be >= 1")
    val cov = Pca.covariance(
      df.select(concat(xCol, yCol).as("z")), "z")
    def blockSum(cond: Column): Column =
      sum(when(cond, t9(col("cov") * col("cov")))
        .otherwise(lit(0.0)).cast(DecimalType(38, 9)))
        .cast("double")
    cov.agg(
        blockSum(col("i") < d && col("j") >= d).as("hsic_xy"),
        blockSum(col("i") < d && col("j") < d).as("norm_xx"),
        blockSum(col("i") >= d && col("j") >= d).as("norm_yy"))
      .select(lit(d).as("dim"), col("hsic_xy"), col("norm_xx"),
        col("norm_yy"),
        (col("hsic_xy") /
          (sqrt(col("norm_xx")) * sqrt(col("norm_yy")))).as("cka"))
  }
}
