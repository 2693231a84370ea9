package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PCA invariants over the exact covariance (the q174 matrix is the
  * oracle-checked half; eigen/projection is pinned here). */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("jacobiEigen solves the hand 2x2 case") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2)
    // first axis is ±(1,1)/√2
    assert(math.abs(math.abs(vecs(0)(0)) - s) < 1e-12)
    assert(math.abs(vecs(0)(0) - vecs(0)(1)) < 1e-12)
  }

  test("covariance is exactly symmetric and partition-invariant") {
    val df = (1 to 60).map(i => (i.toLong,
      Array(i.toFloat / 7, (i % 5).toFloat, (i % 3).toFloat - 1f)))
      .toDF("vec_id", "embedding")
    val a = Pca.covariance(df.repartition(1), "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val b = Pca.covariance(df.repartition(9), "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(a === b)
    for (i <- 0 until 3; j <- 0 until 3)
      assert(a((i, j)) === a((j, i)), s"cov($i,$j)")
  }

  test("pcaProject finds the dominant axis and orders variance") {
    // points spread widely along (1,1,0,0)/√2, narrowly along
    // (0,0,1,-1)/√2 — the top axis must be the wide one
    val rows = (0 until 80).map { i =>
      val a = (i % 9) - 4.0 // wide: range ±4
      val b = ((i / 9) % 3 - 1.0) * 0.2 // narrow: ±0.2
      (i.toLong, Array((a).toFloat, (a).toFloat,
        (b).toFloat, (-b).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val pc = Pca.pcaProject(df, "embedding", k = 2)
      .select(col("vec_id"), col("pc")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v0 = variance(rows.map(r => pc(r._1)(0)).toSeq)
    val v1 = variance(rows.map(r => pc(r._1)(1)).toSeq)
    assert(v0 > v1 * 10, s"pc0 var $v0 should dominate pc1 var $v1")
    // pc0 must recover a (up to sign/scale √2): correlation ≈ ±1
    val as = rows.map(r => (r._1, ((r._1 % 9) - 4.0))).toMap
    val xs = rows.map(r => pc(r._1)(0))
    val ys = rows.map(r => as(r._1))
    val n = xs.size
    val mx = xs.sum / n; val my = ys.sum / n
    val corr = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    assert(math.abs(math.abs(corr) - 1.0) < 1e-6, s"corr $corr")
  }

  test("powerIteration recovers the Jacobi leading axis (up to " +
      "max-abs scale and sign) and its eigenvalue, " +
      "partition-invariant") {
    val rows = (0 until 80).map { i =>
      val a = (i % 9) - 4.0
      val b = ((i / 9) % 3 - 1.0) * 0.2
      (i.toLong, Array(a.toFloat, (a * 0.5).toFloat, b.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Pca.powerIteration(df, "embedding", iters = 12)
      .collect()
    val v = out.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val lam = out.head.getDouble(2)
    // reference: driver Jacobi on the same exact covariance
    val cells = Pca.covariance(df, "embedding").collect()
    val m = Array.ofDim[Double](3, 3)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val (vals, vecs) = Pca.jacobiEigen(m)
    val axis = vecs(0)
    val mx = axis.map(math.abs).max
    val scaled = axis.map(_ / mx) // max-abs normalized, like the op
    val sign = if (scaled(0) * v(0) < 0) -1.0 else 1.0
    for (i <- 0 until 3)
      assert(math.abs(v(i) - sign * scaled(i)) < 1e-6,
        s"axis[$i]: ${v(i)} vs ${sign * scaled(i)}")
    assert(math.abs(lam - vals(0)) / vals(0) < 1e-6,
      s"lambda_inf $lam vs eigenvalue ${vals(0)}")
    val rep = Pca.powerIteration(df.repartition(11), "embedding",
      iters = 12).collect().map(r => r.getInt(0) -> r.getDouble(1))
      .toMap
    assert(rep === v)
  }

  test("secondAxisDeflated recovers the Jacobi SECOND axis and " +
      "eigenvalue; the two power axes are near-orthogonal") {
    val rows = (0 until 80).map { i =>
      val a = (i % 9) - 4.0
      val b = ((i / 9) % 3 - 1.0) * 0.9
      (i.toLong, Array(a.toFloat, (a * 0.5 + b).toFloat,
        (b * 2.0).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val a1 = Pca.powerIteration(df, "embedding", iters = 16)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val out2 = Pca.secondAxisDeflated(df, "embedding", iters = 16)
      .collect()
    val a2 = out2.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val lam2 = out2.head.getDouble(2)
    // Jacobi reference on the exact covariance
    val cells = Pca.covariance(df, "embedding").collect()
    val m = Array.ofDim[Double](3, 3)
    cells.foreach(r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val (vals, vecs) = Pca.jacobiEigen(m)
    val ref = vecs(1)
    val mx = ref.map(math.abs).max
    val scaled = ref.map(_ / mx)
    val dom = (0 until 3).maxBy(i => math.abs(scaled(i)))
    val sign = if (scaled(dom) * a2(dom) < 0) -1.0 else 1.0
    for (i <- 0 until 3)
      assert(math.abs(a2(i) - sign * scaled(i)) < 1e-4,
        s"axis2[$i]: ${a2(i)} vs ${sign * scaled(i)}")
    assert(math.abs(lam2 - vals(1)) / vals(1) < 1e-4,
      s"lambda2 $lam2 vs ${vals(1)}")
    // near-orthogonality of the two max-abs-normalized axes
    val dot = (0 until 3).map(i => a1(i) * a2(i)).sum
    val n1 = math.sqrt((0 until 3).map(i => a1(i) * a1(i)).sum)
    val n2 = math.sqrt((0 until 3).map(i => a2(i) * a2(i)).sum)
    assert(math.abs(dot / (n1 * n2)) < 1e-3,
      s"axes not orthogonal: cos=${dot / (n1 * n2)}")
  }

  test("whitenedProject2 components have ~unit variance and are " +
      "~uncorrelated (the point of whitening)") {
    val r = new scala.util.Random(5)
    val rows = (0 until 400).map { i =>
      val a = r.nextGaussian() * 3
      val b = r.nextGaussian()
      (i.toLong, Array((a + b * 0.3).toFloat, (a * 0.4 - b).toFloat,
        (b * 0.8 + a * 0.1).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val w = Pca.whitenedProject2(df, "vec_id", "embedding",
      iters = 20).collect().map(r2 =>
        (r2.getDouble(1), r2.getDouble(2)))
    val n = w.length.toDouble
    def stats(xs: Array[Double]) = {
      val mu = xs.sum / n
      (mu, xs.map(x => (x - mu) * (x - mu)).sum / n)
    }
    val (m1, v1) = stats(w.map(_._1))
    val (m2, v2) = stats(w.map(_._2))
    assert(math.abs(v1 - 1.0) < 0.05, s"var(w1)=$v1")
    assert(math.abs(v2 - 1.0) < 0.05, s"var(w2)=$v2")
    val covW = w.map { case (x, y) => (x - m1) * (y - m2) }.sum / n
    assert(math.abs(covW) < 0.05, s"cov(w1,w2)=$covW")
  }
}
