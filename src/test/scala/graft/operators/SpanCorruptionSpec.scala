package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Span corruption invariants: sentinel numbering, input/target
  * complementarity, coverage rate, and partition invariance. */
class SpanCorruptionSpec extends SparkTestBase {
  import spark.implicits._

  test("input and target partition the tokens; sentinels are " +
      "numbered in span order and agree between the two sides") {
    val docs = (0L until 40L).map(i =>
      (i, (0 until 60).map(t => s"w$t").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SpanCorruption.corrupt(docs, "doc_id", "text").collect()
    assert(out.length === 40)
    out.foreach { r =>
      val n = r.getLong(1); val masked = r.getLong(2)
      val spans = r.getLong(3)
      val inp = r.getString(4); val tgt = r.getString(5)
      assert(n === 60L)
      val sentinelRe = "<extra_id_(\\d+)>".r
      val inpSent = sentinelRe.findAllMatchIn(inp)
        .map(_.group(1).toInt).toSeq
      val tgtSent = sentinelRe.findAllMatchIn(tgt)
        .map(_.group(1).toInt).toSeq
      // one sentinel per span, 0..S-1 in order, identical both sides
      assert(inpSent === (0 until spans.toInt))
      assert(tgtSent === inpSent)
      // token partition: non-sentinel input tokens + target tokens
      // reassemble the document exactly
      val inpToks = inp.split(" ").filterNot(_.startsWith("<extra"))
      val tgtToks = tgt.split(" ").filter(_.nonEmpty)
        .filterNot(_.startsWith("<extra"))
      assert(inpToks.length + tgtToks.length === 60)
      assert(tgtToks.length === masked)
      assert((inpToks ++ tgtToks).sorted.toSeq ===
        (0 until 60).map(t => s"w$t").sorted)
    }
    // corpus-wide coverage tracks the 15% noise rate
    val totMasked = out.map(_.getLong(2)).sum.toDouble
    val tot = out.map(_.getLong(1)).sum.toDouble
    assert(totMasked / tot > 0.08 && totMasked / tot < 0.25,
      s"coverage ${totMasked / tot}")
  }

  test("deterministic under repartition; zero-noise docs pass " +
      "through with empty target") {
    val docs = (0L until 20L).map(i =>
      (i, (0 until 30).map(t => s"t$t").mkString(" ")))
      .toDF("doc_id", "text")
    val a = SpanCorruption.corrupt(docs, "doc_id", "text").collect()
    val b = SpanCorruption.corrupt(docs.repartition(7), "doc_id",
      "text").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    a.filter(_.getLong(2) == 0L).foreach { r =>
      assert(r.getString(5) === "")
      assert(r.getString(4).split(" ").length === 30)
    }
  }
}
