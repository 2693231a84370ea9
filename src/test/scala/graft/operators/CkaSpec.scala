package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Cka.linearCka]] — the published invariances of linear CKA
  * (Kornblith 2019 §2.3) pinned: identity, isotropic scaling,
  * orthogonal transform; plus discrimination against an unrelated
  * representation. */
class CkaSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(n: Int, d: Int, salt: Int) =
    (0 until n).map { r =>
      (0 until d).map(c =>
        (((r * 31 + c * 17 + salt) * 2654435761L) % 1000) / 500.0 - 1.0
      ).toArray
    }

  test("CKA(X, X) = 1 and isotropic scaling is invariant") {
    val x = vecs(40, 6, 1)
    val df = x.map(v => (v, v.map(_ * 3.0))).toDF("x", "y")
    val self = Cka.linearCka(df, col("x"), col("x"), 6)
      .collect().head
    assert(math.abs(self.getDouble(4) - 1.0) < 1e-9)
    val scaled = Cka.linearCka(df, col("x"), col("y"), 6)
      .collect().head
    assert(math.abs(scaled.getDouble(4) - 1.0) < 1e-6)
  }

  test("orthogonal transform (permute + sign-flip) is invariant") {
    val x = vecs(40, 6, 2)
    val df = x.map { v =>
      (v, Array(-v(5), v(3), -v(0), v(1), -v(4), v(2)))
    }.toDF("x", "y")
    val out = Cka.linearCka(df, col("x"), col("y"), 6)
      .collect().head
    assert(math.abs(out.getDouble(4) - 1.0) < 1e-6)
  }

  test("an unrelated representation scores far below 1") {
    val df = vecs(60, 6, 3).zip(vecs(60, 6, 997))
      .map { case (a, b) => (a, b) }.toDF("x", "y")
    val out = Cka.linearCka(df, col("x"), col("y"), 6)
      .collect().head
    assert(out.getDouble(4) < 0.5, s"cka = ${out.getDouble(4)}")
    // block norms are positive and finite
    assert(out.getDouble(2) > 0 && out.getDouble(3) > 0)
  }

  test("partition invariance") {
    val df = vecs(50, 4, 4).map(v =>
      (v, v.map(x => x * x))).toDF("x", "y")
    def run(f: org.apache.spark.sql.DataFrame) =
      Cka.linearCka(f, col("x"), col("y"), 4)
        .collect().map(_.toSeq).toSeq
    assert(run(df) === run(df.repartition(11)))
  }
}
