package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** Embedding covariance + PCA/whitening — the linear-algebra step
  * embedding pipelines run before clustering/dedup (SemDeDup-class
  * pipelines whiten; PCA truncation is the classic dim-reduction
  * next to the JL projection in [[Projection]]).
  *
  * The COVARIANCE MATRIX is the distributed part and the value-exact
  * part: cov(i,j) = E[x_i·x_j] − μ_i·μ_j with every cross-row sum an
  * exact decimal aggregation of 9-decimal-truncated per-row terms
  * (the [[graft.queries.Tables]] discipline), so the d×d matrix is
  * engine- and partitioning-exact. Scale: one explode to (row, i,
  * x_i) with the in-row `transform` producing each row's d products
  * per i — the d² stream collapses map-side to d² groups; no
  * shuffle carries more than d² rows. d=64 → 4096 cells regardless
  * of corpus size.
  *
  * The EIGENDECOMPOSITION runs on the driver (cyclic Jacobi over the
  * d×d matrix — d² doubles of bounded driver state, the same class
  * as the k-means seed collect); the rotation broadcasts back as
  * literal arrays into a codegen projection. Deterministic: fixed
  * sweep order, fixed iteration count, no data-dependent branching
  * beyond the rotation threshold.
  */
object Pca {

  private def t9(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  private def dsum9(c: Column): Column =
    sum(c.cast(DecimalType(18, 9))).cast("double")

  /** Exact covariance matrix of a float-array embedding column.
    * Output: (i, j, cov) over all d² index pairs, ordered. */
  def covariance(df: DataFrame, vecCol: String): DataFrame = {
    // r11 rewrite, two parts (36x on the q316 128-dim build):
    //
    // 1. Explode ONCE into a materialized (rid, i, xi) element
    //    table, then self-join on the row id for the n·d² product
    //    stream (the oracle's own shape). The previous
    //    transform()-lambda Generate fell out of whole-stage codegen
    //    (NOTES trap 3), and worse, CollapseProject inlined the
    //    INPUT array expression into the generator, re-evaluating a
    //    derived vector column (q316's concat + dequant) per
    //    (row, i) pair. The checkpoint evaluates every derived
    //    column exactly once and also serves the mean pass — one
    //    input scan total.
    // 2. Sum exact INTEGER 1e-9 units, not DECIMAL(18,9) casts of
    //    doubles: Spark's double→decimal cast goes through
    //    Double.toString (the NOTES trap-2 mechanism) — ~250k
    //    rows/s/core, which made the pair aggregation the hidden
    //    hot path (25 s forced vs 2.4 s count-pruned at sf0.1).
    //    floor(x·1e9) is an exact long; long→DECIMAL(30,0) is a
    //    compact-path cast; the sum is order-free-exact with
    //    headroom to ~10^21 unit-sum (10^12 rows at |x| ≤ 1) where
    //    a bare BIGINT sum would overflow at 10^9.
    //    Both engines then divide the unit sum by 1e9 and by n in
    //    the same order (the oracles mirror the sequence).
    // repartition BEFORE the checkpoint: a single-file input keeps
    // one partition through explode + checkpoint, and every
    // downstream stage (the d-way join fan-out, the cell aggregate)
    // inherits that — measured 9.7 s at 4 cores vs 8.8 s at 32 at
    // sf0.1, i.e. no parallel speedup at all. Spreading the element
    // rows costs one shuffle of the input's own bytes and buys the
    // whole n·d² stream its parallelism. rid is assigned BEFORE the
    // shuffle so the self-join key stays consistent.
    val shufflePartitions = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val x = df
      .select(monotonically_increasing_id().as("rid"),
        col(vecCol).as("arr"))
      .repartition(shufflePartitions, col("rid"))
      .select(col("rid"), posexplode(col("arr")).as(Seq("i", "xi")))
      .select(col("rid"), col("i"),
        col("xi").cast("double").as("xi"))
      .localCheckpoint()
    def unitSum(c: Column): Column =
      sum(floor(c * lit(1e9)).cast("long").cast(DecimalType(30, 0)))
        .cast("double") / lit(1e9)
    val mu = x.groupBy(col("i").as("mi"))
      .agg((unitSum(col("xi")) / count(lit(1))).as("mu"))
    val exy = x
      .join(x.select(col("rid"), col("i").as("j"),
        col("xi").as("xj")), "rid")
      .select(col("i"), col("j"), (col("xi") * col("xj")).as("p"))
      .groupBy(col("i"), col("j"))
      .agg((unitSum(col("p")) / count(lit(1))).as("exy"))
    exy
      .join(broadcast(mu), col("i") === col("mi"))
      .drop("mi")
      .join(broadcast(mu.withColumnRenamed("mi", "mj")
        .withColumnRenamed("mu", "muj")), col("j") === col("mj"))
      .select(col("i"), col("j"),
        (col("exy") - col("mu") * col("muj")).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix.
    * Returns (eigenvalues desc, row-major eigenvector matrix whose
    * row k is the k-th principal axis). Pure JVM, deterministic. */
  private[operators] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    for (_ <- 0 until 32) { // fixed sweep count — deterministic
      for (p <- 0 until d - 1; q <- p + 1 until d
          if math.abs(a(p)(q)) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until d).map(r => v(r)(i)).toArray).toArray)
  }

  /** Leading principal axis by DISTRIBUTED power iteration — the
    * scale path next to [[pcaProject]]'s driver-side Jacobi: at
    * embedding dims where a d×d collect stops being a "bounded
    * driver step" (d=4096 ⇒ 16M cells), the covariance stays a
    * DataFrame and each iteration is one broadcast-join matvec
    * w = C·v over the d² cell table + a one-row max-abs normalizer —
    * no driver state at any d.
    *
    * Determinism (the q162/q163 discipline): v₀ = 1 (the all-ones
    * start; safe for covariance matrices unless the top axis is
    * exactly orthogonal to 1 — callers with adversarial symmetry can
    * reseed), every product term 12-truncated into a DECIMAL(18,15)
    * exact sum, each round's vector max-abs-normalized and
    * 12-truncated, fixed `iters`. The oracle unrolls the identical
    * rounds, so the result is engine- and partitioning-exact
    * (convergence to ±v₁ included: both engines walk the same signed
    * trajectory).
    *
    * Output: (i, v, lambda_inf) — the normalized axis component per
    * dimension and the final infinity-norm growth factor (→ |λ₁| as
    * the iteration converges), ordered by i. */
  private def t12(x: Column): Column =
    floor(x * lit(1e12)).cast("double") / lit(1e12)

  /** The shared iteration loop over an (i, j, cov) cell table.
    * Returns the un-presented (vi, v, m) frame. Job-count
    * discipline (the q163 HITS lesson): ONE eager materialization
    * per round; the max-abs normalizer rides as a WINDOW column
    * over the d-row coalesce(1) round output (identical arithmetic
    * to a one-row-aggregate broadcast, one fewer job per round).
    * Deferring the per-round checkpoint (e.g. to every 4th round)
    * was MEASURED SLOWER — Catalyst re-analyzes the deepening plan
    * at every broadcast materialization. */
  private def powerIterateCov(cov: DataFrame,
      iters: Int): DataFrame = {
    val wAll = Window.partitionBy()
    var v = cov.select(col("i").as("vi")).distinct()
      .select(col("vi"), lit(1.0).as("v"), lit(0.0).as("m"))
      .coalesce(1)
      .localCheckpoint()
    for (r <- 1 to iters) {
      val next = cov
        .join(broadcast(v.select(col("vi"), col("v"))),
          col("j") === col("vi"))
        .groupBy(col("i"))
        .agg(sum(t12(col("cov") * col("v"))
          .cast(DecimalType(18, 15))).cast("double").as("w"))
        .withColumn("m", max(abs(col("w"))).over(wAll))
        .select(col("i").as("vi"), t12(col("w") / col("m")).as("v"),
          col("m"))
        .coalesce(1)
      // with the window normalizer a round is ONE broadcast + the
      // materialization; cutting lineage every OTHER round halves
      // the checkpoint jobs while the un-cut plan stays 2 rounds
      // deep (the every-4 variant of the OLD 3-job shape was
      // measured slower from analyzer re-work — at depth 2 the
      // trade flips)
      v = if (r % 2 == 0 || r == iters) next.localCheckpoint()
      else next
    }
    v
  }

  def powerIteration(df: DataFrame, vecCol: String,
      iters: Int = 8): DataFrame = {
    require(iters >= 1, s"powerIteration needs iters >= 1 ($iters)")
    val cov = covariance(df, vecCol)
      .select(col("i"), col("j"), col("cov"))
      .coalesce(4)
      .localCheckpoint()
    powerIterateCov(cov, iters)
      .select(col("vi").as("i"), col("v"),
        t12(col("m")).as("lambda_inf"))
      .orderBy(col("i"))
  }

  /** Second principal axis by HOTELLING DEFLATION, fully
    * distributed: extract the leading axis u with
    * [[powerIterateCov]], deflate the cell table —
    * C' = C − λ·(u uᵀ)/(uᵀu) with the Rayleigh quotient
    * λ = (uᵀ C u)/(uᵀ u), i.e. per cell
    * C'ᵢⱼ = C ᵢⱼ − k·uᵢ·uⱼ with the ONE scalar
    * k = t12(s1/(s2·s2)), s1 = Σ t12(Cᵢⱼ·uᵢ·uⱼ),
    * s2 = Σ t12(uᵢ²) (both exact decimal sums) — then run the same
    * iteration on C'. No driver state at any d; the deflation is
    * one broadcast-join projection over the d² cells.
    *
    * Determinism: every scalar is a truncated fixed IEEE chain and
    * both iterations are the q198 discipline, so the oracle unrolls
    * the whole two-phase trajectory exactly. Output: (i, v,
    * lambda_inf) for the SECOND axis, ordered by i. */
  def secondAxisDeflated(df: DataFrame, vecCol: String,
      iters: Int = 8): DataFrame =
    topTwoAxes(df, vecCol, iters).filter(col("axis") === 2)
      .select(col("i"), col("v"), col("lambda_inf"))
      .orderBy(col("i"))

  /** Both leading axes in one pass: the covariance and the first
    * iteration are computed ONCE and shared between the q198 axis
    * and its deflated successor. Output: (axis ∈ {1, 2}, i, v,
    * lambda_inf). */
  def topTwoAxes(df: DataFrame, vecCol: String,
      iters: Int = 8): DataFrame = {
    require(iters >= 1, s"needs iters >= 1 ($iters)")
    val cov = covariance(df, vecCol)
      .select(col("i"), col("j"), col("cov"))
      .coalesce(4)
      .localCheckpoint()
    val u1 = powerIterateCov(cov, iters)
      .coalesce(1)
      .localCheckpoint()
    val u = u1.select(col("vi"), col("v"))
    val s1 = cov
      .join(broadcast(u.select(col("vi").as("ai"),
        col("v").as("va"))), col("i") === col("ai"))
      .join(broadcast(u.select(col("vi").as("bj"),
        col("v").as("vb"))), col("j") === col("bj"))
      .agg(sum(t12(col("cov") * col("va") * col("vb"))
        .cast(DecimalType(18, 15))).cast("double").as("s1"))
    val s2 = u.agg(sum(t12(col("v") * col("v"))
      .cast(DecimalType(18, 15))).cast("double").as("s2"))
    val k = s1.crossJoin(broadcast(s2))
      .select(t12(col("s1") / (col("s2") * col("s2"))).as("k"))
    val cov2 = cov
      .join(broadcast(u.select(col("vi").as("ai"),
        col("v").as("va"))), col("i") === col("ai"))
      .join(broadcast(u.select(col("vi").as("bj"),
        col("v").as("vb"))), col("j") === col("bj"))
      .crossJoin(broadcast(k))
      .select(col("i"), col("j"),
        t12(col("cov") - col("k") * col("va") * col("vb"))
          .as("cov"))
      .coalesce(4)
      .localCheckpoint()
    val u2 = powerIterateCov(cov2, iters)
    u1.select(lit(1).as("axis"), col("vi").as("i"), col("v"),
        t12(col("m")).as("lambda_inf"))
      .unionByName(u2.select(lit(2).as("axis"), col("vi").as("i"),
        col("v"), t12(col("m")).as("lambda_inf")))
  }

  /** Whitened 2-component projection: each embedding's coordinates
    * on the two leading power axes, scaled to UNIT VARIANCE —
    * w = (x·v) / (‖v‖₂·√λ), which equals (x·v̂)/√λ for the unit
    * axis v̂ (the power axes are max-abs normalized, so the ‖v‖₂
    * factor must divide out; λ is the infinity-norm growth factor,
    * which converges to the eigenvalue under EITHER normalization).
    * One explode-join-aggregate pass over the corpus, axes
    * broadcast; every product term 12-truncated into an exact
    * decimal sum, final scale one truncated IEEE chain —
    * engine-exact. Output: (idCol, w1, w2). */
  def whitenedProject2(df: DataFrame, idCol: String,
      vecCol: String, iters: Int = 8): DataFrame =
    whitenedProject2From(
      topTwoAxes(df, vecCol, iters).coalesce(1).localCheckpoint(),
      df, idCol, vecCol)

  /** [[whitenedProject2]] over PREBUILT axes (a [[topTwoAxes]]
    * result, typically served from a persisted
    * [[ModelArtifacts.cached]] table — train once, project many):
    * only the projection pass runs. */
  def whitenedProject2From(axes: DataFrame, df: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val nrm = axes.groupBy(col("axis").as("naxis"))
      .agg(sqrt(sum(t12(col("v") * col("v"))
        .cast(DecimalType(18, 15))).cast("double")).as("nrm"))
    val withNrm = axes.join(broadcast(nrm),
      col("axis") === col("naxis"))
    val x = df.select(col(idCol),
      posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("i", "xv")))
    def proj(axis: Int, out: String): DataFrame = x
      .join(broadcast(withNrm.filter(col("axis") === axis)
        .select(col("i"), col("v"), col("lambda_inf"),
          col("nrm"))), "i")
      .groupBy(col(idCol))
      .agg(sum(t12(col("xv") * col("v"))
          .cast(DecimalType(18, 15))).cast("double").as("p"),
        max(col("lambda_inf")).as("lam"), max(col("nrm")).as("nr"))
      .select(col(idCol),
        t12(col("p") / (col("nr") * sqrt(col("lam")))).as(out))
    proj(1, "w1").join(proj(2, "w2"), idCol).orderBy(col(idCol))
  }

  /** Project embeddings onto the top-k principal axes of their own
    * covariance. The d×d collect is the one driver-side step
    * (bounded by dimension, not data); axes return as literal arrays
    * inside the codegen projection, so the projection pass is one
    * map stage. Output: original columns + `pc` (array of k doubles). */
  def pcaProject(df: DataFrame, vecCol: String, k: Int): DataFrame = {
    val d = df.select(size(col(vecCol))).head().getInt(0)
    val cells = covariance(df, vecCol).collect()
    val m = Array.ofDim[Double](d, d)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val (_, axes) = jacobiEigen(m)
    val mu = df
      .select(posexplode(col(vecCol)).as(Seq("i", "xi")))
      .groupBy(col("i"))
      .agg((dsum9(col("xi").cast("double")) / count(lit(1))).as("mu"))
      .orderBy(col("i")).collect().map(_.getDouble(1))
    val pcCols = (0 until k).map { c =>
      val axis = axes(c)
      val shift = (0 until d).map(i => axis(i) * mu(i)).sum
      (0 until d).map(i =>
        element_at(col(vecCol), i + 1).cast("double") * lit(axis(i)))
        .reduce(_ + _) - lit(shift)
    }
    df.withColumn("pc", array(pcCols: _*))
  }
}
