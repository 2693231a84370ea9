package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Sketch invariants: the md5-prefix hash is pinned to the DuckDB
  * value, estimators hit their published error bounds against exact
  * counts, CMS never underestimates, and every sketch is
  * partitioning-invariant (mergeable state + deterministic math). */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("h60 matches the DuckDB hex-cast value") {
    // duckdb: SELECT ('0x'||substr(md5('hello'),1,15))::UBIGINT
    val h = Seq("hello").toDF("v")
      .select(Sketches.h60(col("v")).as("h")).head().getLong(0)
    assert(h === 419982666956583591L)
  }

  test("kmv is exact below k and ~1/sqrt(k) above") {
    val small = spark.range(60)
      .select(lit("g").as("g"), col("id"))
    val se = Sketches.kmvDistinct(small, "g", "id", k = 128).head()
    assert(se.getLong(1) === 60L)
    assert(se.getDouble(2) === 60.0) // sketch holds all: exact

    val big = spark.range(5000)
      .select(lit("g").as("g"), col("id"))
    val be = Sketches.kmvDistinct(big, "g", "id", k = 128).head()
    val est = be.getDouble(2)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.3,
      s"kmv est $est for 5000 distinct")
  }

  test("kmv is partitioning-invariant (mergeable bounded state)") {
    val df = spark.range(3000)
      .select((col("id") % 3).cast("string").as("g"), col("id"))
    val a = Sketches.kmvDistinct(df, "g", "id", k = 64).collect()
    val b = Sketches.kmvDistinct(df.repartition(17), "g", "id", k = 64)
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("hll hits the 1.04/sqrt(m) regime and small-range correction") {
    val big = spark.range(20000)
      .select(lit("g").as("g"), col("id"))
    val be = Sketches.hllDistinct(big, "g", "id").head()
    val est = be.getDouble(2)
    // sigma = 1.04/sqrt(1024) = 3.25%; allow 4 sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.13,
      s"hll est $est for 20000 distinct")

    val small = spark.range(40)
      .select(lit("g").as("g"), col("id"))
    val se = Sketches.hllDistinct(small, "g", "id").head()
    // linear counting: with 40 distinct and 1024 registers the
    // occupancy estimate is near-exact
    assert(math.abs(se.getDouble(2) - 40.0) < 4.0,
      s"linear-counting est ${se.getDouble(2)} for 40 distinct")
    assert(se.getLong(1) <= 40L)
  }

  test("hll is partitioning-invariant") {
    val df = spark.range(8000)
      .select((col("id") % 2).cast("string").as("g"), col("id"))
    val a = Sketches.hllDistinct(df, "g", "id").collect()
    val b = Sketches.hllDistinct(df.repartition(23), "g", "id")
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("cms overestimates only, within the epsilon-N envelope") {
    // zipf-ish term stream: term t repeated (2000 / (t+1)) times
    val terms = (0 until 200)
      .flatMap(t => Seq.fill(2000 / (t + 1))(s"term$t"))
    val df = terms.toDF("t")
    val exact = df.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val probes = exact.select(col("t"))
    val est = Sketches.cmsEstimates(df, "t", probes, "t", d = 4,
      w = 256)
    val joined = exact.join(est, "t")
      .select(col("t"), col("c"), col("cms_est")).collect()
    val n = terms.size.toDouble
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"cms underestimated ${r.getString(0)}")
      assert(r.getLong(2) - r.getLong(1) <= 0.05 * n,
        s"cms error ${r.getLong(2) - r.getLong(1)} beyond envelope")
    }
  }

  test("kmvSetOps: exact below k, sane estimates above, jaccard " +
      "between overlapping vocabularies") {
    // A = 0..59, B = 40..99: |A|=60 |B|=60 |A∩B|=20 |A∪B|=100 — all
    // below k=128, so every output is exact
    val df = ((0 until 60).map(("A", _)) ++ (40 until 100).map(("B", _)))
      .toDF("g", "v")
    val r = Sketches.kmvSetOps(df, "g", "v", k = 128).head()
    assert(r.getLong(2) === 100L) // union_n
    assert(r.getDouble(3) === 100.0) // est_union exact
    assert(r.getLong(4) === 20L) // rho = exact intersection
    assert(r.getDouble(5) === 20.0) // est_inter exact
    assert(math.abs(r.getDouble(6) - 0.2) < 1e-9) // jaccard 20/100

    // above k: 4000-element sets with 2000 shared
    val big = ((0 until 4000).map(("A", _)) ++
      (2000 until 6000).map(("B", _))).toDF("g", "v")
    val b = Sketches.kmvSetOps(big, "g", "v", k = 128).head()
    assert(math.abs(b.getDouble(3) - 6000.0) / 6000.0 < 0.3,
      s"union est ${b.getDouble(3)}")
    assert(math.abs(b.getDouble(6) - 2000.0 / 6000.0) < 0.2,
      s"jaccard est ${b.getDouble(6)}")
  }

  test("profileSketched: exact null accounting, hll estimates near " +
      "exact distincts") {
    val df = spark.range(3000).select(col("id"),
      when(col("id") % 10 =!= 0, col("id") % 500).as("gappy"),
      (col("id") % 7).cast("string").as("small"))
    val out = Profile.profileSketched(df,
        Seq("id", "gappy", "small")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("id")._1 === 3000L && out("id")._2 === 0L)
    assert(out("gappy")._1 === 2700L && out("gappy")._2 === 300L)
    assert(out("small")._1 === 3000L && out("small")._2 === 0L)
    // linear counting at 7 distinct: -m·ln(1 - 7/m) ≈ 7.02
    assert(math.abs(out("small")._3 - 7.0) < 0.5)
    assert(math.abs(out("id")._3 - 3000.0) / 3000.0 < 0.13)
    assert(math.abs(out("gappy")._3 - 450.0) / 450.0 < 0.13)
  }

  test("cms is partitioning-invariant") {
    val df = spark.range(4000)
      .select((col("id") % 97).cast("string").as("t"))
    val probes = df.distinct()
    val a = Sketches.cmsEstimates(df, "t", probes, "t").collect()
    val b = Sketches.cmsEstimates(df.repartition(13), "t",
      probes, "t").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }
}
