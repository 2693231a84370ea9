package graft.streaming

import graft.SparkTestBase
import graft.operators.Eval
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming eval-vote monitor (21st streaming suite): the live
  * per-(problem, answer) vote counters must equal the batch vote
  * aggregate on the same prefix across any micro-batch split,
  * replays must drop exactly-once, and the shared
  * [[Eval.consensusFromVotes]] / [[Eval.passAtKFromVotes]]
  * arithmetic over the counter snapshot must equal the batch
  * [[Eval.consensusVote]] / [[Eval.passAtK]]. */
class StreamingEvalSpec extends SparkTestBase {
  import spark.implicits._

  // 12 problems x 25 samples; answer/correctness by a deterministic
  // mix so problems span c = 0, mid, and all-correct regimes, with
  // real vote ties somewhere
  private val events: Seq[(String, String, Long, Boolean)] =
    (0 until 12).flatMap { p =>
      (0 until 25).map { s =>
        val h = (p * 131 + s * 37) % 10
        val ans = if (p == 0) "never" // c = 0 problem
          else if (h < 5) s"t$p" else s"w${h % 3}"
        (s"p$p", ans, (p * 25 + s).toLong, ans == s"t$p")
      }
    }

  private def batchVotes(rows: Seq[(String, String, Long, Boolean)])
      : Map[(String, String), (Long, Long)] =
    rows.groupBy(r => (r._1, r._2)).map { case (k, xs) =>
      k -> ((xs.size.toLong, xs.count(_._4).toLong))
    }

  /** Latest counter row per (problem, answer) from the memory sink:
    * (votes, ok_votes). */
  private def streamed(
      chunks: Seq[Seq[(String, String, Long, Boolean)]],
      name: String): Map[(String, String), (Long, Long)] = {
    val input = MemoryStream[(String, String, Long, Boolean)](spark, 1)
    val out = StreamingOps.streamingEvalVotes(
      input.toDF().toDF("p", "a", "seq", "ok"), "p", "a", "seq", "ok")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, rows) =>
        val last = rows.maxBy(_._3)
        k -> ((last._4, last._5))
      }
  }

  private def snapDf(m: Map[(String, String), (Long, Long)]) =
    m.toSeq.map { case ((p, a), (v, ov)) => (p, a, v, ov, ov > 0) }
      .toDF("problem", "answer", "votes", "ok_votes", "ok")

  test("streamed vote counters == batch, fed whole / chunked / " +
      "with replayed and same-batch duplicates") {
    val want = batchVotes(events)
    assert(streamed(Seq(events), "ev_a") === want)
    assert(streamed(events.grouped(47).toSeq, "ev_b") === want)
    val withDups = events.grouped(60).toSeq.flatMap(c => Seq(c, c))
    assert(streamed(withDups, "ev_c") === want)
    assert(streamed(Seq(events.flatMap(e => Seq(e, e))), "ev_d")
      === want)
  }

  test("consensusFromVotes and passAtKFromVotes over the live " +
      "snapshot == the batch operators") {
    val snap = snapDf(streamed(events.grouped(33).toSeq, "ev_e"))
    val df = events.toDF("problem", "answer", "seq", "ok")
    val liveCons = Eval.consensusFromVotes(snap)
      .orderBy("problem").collect().map(_.toSeq).toSeq
    val batchCons = Eval.consensusVote(df, col("problem"),
        col("answer"), col("ok"))
      .orderBy("problem").collect().map(_.toSeq).toSeq
    assert(liveCons === batchCons)
    val livePass = Eval.passAtKFromVotes(snap, Seq(1, 5, 25))
      .orderBy("problem", "k").collect().map(_.toSeq).toSeq
    val batchPass = Eval.passAtK(df, col("problem"), col("ok"),
        Seq(1, 5, 25))
      .orderBy("problem", "k").collect().map(_.toSeq).toSeq
    assert(livePass === batchPass)
    // the fixture must exercise both ends: a c = 0 problem (pass@k
    // exactly 0) and correct consensus somewhere
    assert(batchPass.exists(r => r(4) == 0.0))
    assert(batchCons.exists(r => r(6) == true))
  }

  test("mid-stream prefix equals the batch answer for that prefix") {
    val prefix = events.take(100)
    assert(streamed(Seq(prefix), "ev_f") === batchVotes(prefix))
  }

  test("a NOISY grader (same answer, per-sample disagreement) " +
      "still reproduces batch pass@k exactly via ok_votes") {
    // one problem, one answer voted 4x with grades T,F,F,T:
    // batch n=4, c=2 -> pass@1 = 1 - (2/4)*... ; a sticky boolean
    // state would report c=4 (the r12 review's failure case)
    val noisy = Seq(("p", "x", 0L, true), ("p", "x", 1L, false),
      ("p", "x", 2L, false), ("p", "x", 3L, true))
    val snap = snapDf(streamed(Seq(noisy), "ev_noisy"))
    val live = Eval.passAtKFromVotes(snap, Seq(1, 2))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val batch = Eval.passAtK(
        noisy.toDF("problem", "answer", "seq", "ok"),
        col("problem"), col("ok"), Seq(1, 2))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(live === batch)
    assert(live.head(3) === 2L, "c must be the accepted-VOTE count")
  }

  test("null answers count as '' votes and null correctness as " +
      "rejected, matching batch") {
    val input = MemoryStream[(String, String, Long, java.lang.Boolean)](
      spark, 1)
    val out = StreamingOps.streamingEvalVotes(
      input.toDF().toDF("p", "a", "seq", "ok"), "p", "a", "seq", "ok")
    val q = out.writeStream.format("memory").queryName("ev_null")
      .outputMode("update").start()
    input.addData(("p", null, 0L, null), ("p", null, 1L, false),
      ("p", "x", 2L, true))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ev_null").collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
      .toSet
    assert(got === Set(("", 2L, 0L, false), ("x", 1L, 1L, true)))
  }
}
