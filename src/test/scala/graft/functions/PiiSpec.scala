package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** PII scrub invariants: each class redacts, clean text passes
  * through untouched, and the pass order can't cascade (tokens never
  * re-match). */
class PiiSpec extends SparkTestBase {

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(redactPii(col("t"))).collect()(0).getString(0)
  }

  test("emails, IPs, and dashed phones redact; clean text unchanged") {
    assert(redactOne("mail bob.smith+x@corp.example.org now") ===
      "mail <EMAIL> now")
    assert(redactOne("host 192.168.001.1 up") === "host <IP> up")
    assert(redactOne("call 555-123-4567 today") === "call <PHONE> today")
    val clean = "no pii here, just 3 words and v1.2 release"
    assert(redactOne(clean) === clean)
  }

  test("all three classes in one text, counts match") {
    import spark.implicits._
    val s = "a@b.co and 10.0.0.1 and 555-000-1111 and c@d.org"
    val df = Seq(s).toDF("t")
    val got = df.select(Seq(col("t")) ++
      piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(got.getLong(1) === 2L) // emails
    assert(got.getLong(2) === 1L) // ips
    assert(got.getLong(3) === 1L) // phones
    assert(redactOne(s) ===
      "<EMAIL> and <IP> and <PHONE> and <EMAIL>")
  }

  test("version strings and decimals don't false-positive as IPs") {
    assert(redactOne("pi is 3.14159 and v2.5 ships") ===
      "pi is 3.14159 and v2.5 ships")
    // four dotted runs DO match (by design: conservative scrub)
    assert(redactOne("ver 1.2.3.4 tag") === "ver <IP> tag")
  }
}
