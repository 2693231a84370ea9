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

  test("seeded murmur3 matches SMHasher vector via SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      s"SELECT graft_murmur3('aaaa', ${0x9747b28c}) AS h").head()
    assert(r.getInt(0) === 0x5A97808A)
  }
}
