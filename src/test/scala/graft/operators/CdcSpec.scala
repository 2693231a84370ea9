package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** CDC invariants: chunks tile the document, size bounds hold,
  * boundaries survive prefix edits (the property fixed-size windows
  * lack), and the plan stays a narrow scan. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDoc(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  test("chunks tile each document exactly: contiguous, ordered, " +
      "sizes in [minSize, maxSize] except a short final chunk") {
    val docs = (0 until 50).map(i => (i.toLong, mkDoc(i, 100 + i * 17)))
      .toDF("doc_id", "text")
    val out = Cdc.chunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").collect()
      .groupBy(_.getLong(0))
    val lens = docs.collect().map(r =>
      r.getLong(0) -> r.getString(1).length).toMap
    out.foreach { case (id, rows) =>
      var expect = 0L
      rows.sortBy(_.getLong(1)).zipWithIndex.foreach {
        case (r, idx) =>
          assert(r.getLong(1) === idx)
          assert(r.getLong(2) === expect, s"doc $id chunk $idx")
          val len = r.getLong(3)
          assert(len >= 1 && len <= 256, s"doc $id len $len")
          if (idx < rows.length - 1)
            assert(len >= 16, s"doc $id non-final chunk $len")
          expect += len
      }
      assert(expect === lens(id).toLong, s"doc $id total")
    }
  }

  test("content-defined: a prefix insertion shifts at most the " +
      "chunks before the first post-edit boundary — later chunk " +
      "hashes reappear") {
    val base = mkDoc(7, 2000)
    val edited = "XYZZY" + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val byDoc = Cdc.chunks(docs, "doc_id", "text").collect()
      .groupBy(_.getLong(0))
    val h1 = byDoc(1L).map(_.getString(4)).toSet
    val h2 = byDoc(2L).map(_.getString(4)).toSet
    val shared = h1.intersect(h2).size
    // all but the first few boundary-local chunks must be shared
    assert(shared >= h1.size - 3,
      s"only $shared of ${h1.size} chunks survived a prefix edit")
    assert(shared.toDouble / h1.size > 0.7)
  }

  test("deterministic under repartition; empty docs drop; " +
      "whole-short-doc becomes one chunk") {
    val docs = Seq((1L, ""), (2L, "tiny"), (3L, mkDoc(3, 500)))
      .toDF("doc_id", "text")
    val a = Cdc.chunks(docs, "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").collect()
    val b = Cdc.chunks(docs.repartition(5), "doc_id", "text")
      .orderBy("doc_id", "chunk_idx").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(!a.exists(_.getLong(0) == 1L))
    val tiny = a.filter(_.getLong(0) == 2L)
    assert(tiny.length === 1 && tiny(0).getLong(3) === 4L)
  }

  test("plan is a shuffle-free narrow scan (no Exchange, no Window)") {
    val docs = (0 until 20).map(i => (i.toLong, mkDoc(i, 300)))
      .toDF("doc_id", "text")
    val plan = Cdc.chunks(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      plan)
  }

  test("sharedChunkPairs: docs sharing a long span pair up even " +
      "with different prefixes; unrelated docs do not; boilerplate " +
      "chunks over maxDf drop") {
    val shared = mkDoc(99, 1500)
    val docs = Seq(
      (1L, "PREFIX-A " + shared),
      (2L, "a different and much longer prefix here " + shared),
      (3L, mkDoc(3, 1500)),                      // unrelated
      (4L, shared)) ++                           // identical body
      // boilerplate: the same 300-char block in 60 docs
      (100L until 160L).map(i => (i, mkDoc(77, 300)))
    val df = docs.toDF("doc_id", "text")
    val pairs = Cdc.sharedChunkPairs(df, "doc_id", "text",
      maxDf = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"shifted dup not found: $pairs")
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // the 60-doc boilerplate block exceeds maxDf -> no pair storm
    assert(!pairs.keys.exists(p => p._1 >= 100L))
    // shared chunk count is large relative to the shared span
    assert(pairs((1L, 2L)) >= 10)
  }

  test("mean chunk size tracks the divisor") {
    val docs = Seq((1L, mkDoc(11, 20000))).toDF("doc_id", "text")
    val n = Cdc.chunks(docs, "doc_id", "text").count()
    val mean = 20000.0 / n
    assert(mean > 40 && mean < 110, s"mean chunk $mean")
  }
}
