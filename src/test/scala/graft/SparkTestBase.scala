package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session across all suites (sbt runs suites in one
  * JVM; getOrCreate returns the same session). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  lazy val sf: String = "/root/testdata/sf0.001"
}
