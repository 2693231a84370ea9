package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FIM invariants: lossless reassembly, mode mix, cut bounds, and
  * partition invariance. */
class FimSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (0L until 200L).map(i =>
    (i, s"doc $i " + ('a' to 'z').take((i % 23 + 3).toInt)
      .mkString(" "))).toDF("doc_id", "text")

  test("every transformed record reassembles the original text; " +
      "plain records pass through verbatim") {
    val src = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1)).toMap
    Fim.transform(docs, "doc_id", "text").collect().foreach { r =>
      val id = r.getLong(0); val mode = r.getString(1)
      val rendered = r.getString(5)
      mode match {
        case "plain" =>
          assert(rendered === src(id))
          assert(r.isNullAt(2) && r.isNullAt(3))
        case "psm" =>
          val m = "<fim_prefix>(.*)<fim_suffix>(.*)<fim_middle>(.*)"
            .r.pattern.matcher(rendered)
          assert(m.matches(), rendered)
          assert(m.group(1) + m.group(3) + m.group(2) === src(id))
        case "spm" =>
          val m = "<fim_suffix>(.*)<fim_prefix>(.*)<fim_middle>(.*)"
            .r.pattern.matcher(rendered)
          assert(m.matches(), rendered)
          assert(m.group(2) + m.group(3) + m.group(1) === src(id))
      }
    }
  }

  test("cuts are ordered and in [0, n]; transform rate tracks " +
      "fimRate; md5 column matches the rendered string") {
    val out = Fim.transform(docs, "doc_id", "text").collect()
    val fim = out.filter(_.getString(1) != "plain")
    assert(fim.length > 60 && fim.length < 140,
      s"${fim.length} transformed of 200")
    fim.foreach { r =>
      val lo = r.getLong(2); val hi = r.getLong(3)
      val n = r.getLong(4)
      assert(lo >= 0 && lo <= hi && hi <= n, s"($lo, $hi, $n)")
    }
    val md5Ok = Fim.transform(docs, "doc_id", "text")
      .filter(md5(col("rendered")) =!= col("rendered_md5")).count()
    assert(md5Ok === 0L)
  }

  test("deterministic under repartition; rate 0 is identity, " +
      "rate 1 transforms everything") {
    val a = Fim.transform(docs, "doc_id", "text").orderBy("doc_id")
      .collect()
    val b = Fim.transform(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(Fim.transform(docs, "doc_id", "text", fimRate = 0.0)
      .filter(col("mode") =!= "plain").count() === 0L)
    assert(Fim.transform(docs, "doc_id", "text", fimRate = 1.0)
      .filter(col("mode") === "plain").count() === 0L)
  }

  test("empty and single-char documents survive (cuts can land on " +
      "every boundary)") {
    val tiny = Seq((1L, ""), (2L, "x"), (3L, "ab")).toDF(
      "doc_id", "text")
    val out = Fim.transform(tiny, "doc_id", "text", fimRate = 1.0)
      .collect()
    assert(out.length === 3)
    out.foreach { r =>
      val body = r.getString(5)
        .replaceAll("<fim_(prefix|suffix|middle)>", "")
      assert(body.length === r.getLong(4))
    }
  }
}
