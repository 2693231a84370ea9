package graft

import graft.SparkTestBase

/** SQL-registry registration of the custom Catalyst expressions. */
class GraftExtensionsSpec extends SparkTestBase {

  test("graft_murmur3 and dot_f64 usable from spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_murmur3('hello world') AS h, " +
        "graft_murmur3('ab', 0) AS h2, " +
        "dot_f64(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").head()
    assert(r.getInt(0) === 1586663183)
    assert(r.getInt(1) === -1681926305)
    assert(r.getDouble(2) === 11.0)
  }

  test("dot_i8 usable from spark.sql over binary literals") {
    GraftExtensions.register(spark)
    // X'027F81' = [2, 127, -127]; dot with itself = 4 + 16129 + 16129
    val r = spark.sql("SELECT dot_i8(X'027F81', X'027F81') AS d").head()
    assert(r.getLong(0) === 32262L)
  }

  test("seeded murmur3 matches SMHasher vector via SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT graft_murmur3('aaaa', ${0x9747b28c}) AS h").head()
    assert(r.getInt(0) === 0x5A97808A)
  }

  test("CheapPredicatesFirst moves codegen predicates ahead of UDFs " +
      "in Filter conjunctions") {
    import org.apache.spark.sql.functions._
    val slow = udf((s: String) => s.nonEmpty)
    // range-based so ConvertToLocalRelation can't fold the filter away
    val df = spark.range(5)
      .select(col("id").as("n"), concat(lit("x"), col("id")).as("s"))
      .filter(slow(col("s")) && col("n") > 1)
    val before = df.queryExecution.optimizedPlan
    val after = CheapPredicatesFirst(before)
    val cond = after.collectFirst {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => c
    }.get
    // the cheap comparison must now lead the conjunction
    assert(cond.toString.indexOf("> 1") < cond.toString.indexOf("UDF"),
      cond.toString)
    // idempotent: a second application is a no-op (fixed point)
    assert(CheapPredicatesFirst(after) === after)
    // results unchanged
    assert(df.count() === 3)
    // non-deterministic conjuncts are left alone
    val nd = spark.range(5)
      .select(col("id").as("n"), concat(lit("x"), col("id")).as("s"))
      .filter(slow(col("s")) && rand() > -1)
    val ndPlan = nd.queryExecution.optimizedPlan
    assert(CheapPredicatesFirst(ndPlan) === ndPlan)
  }
}
