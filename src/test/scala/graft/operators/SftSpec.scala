package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SFT materialization invariants: template structure, loss-mask
  * boundary, short-doc dropping, and preference-pair tie rules. */
class SftSpec extends SparkTestBase {
  import spark.implicits._

  test("renderChat: loss_start points at the response; prompt has " +
      "exactly promptTokens tokens; short docs are dropped") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 13).map(i => s"v$i").mkString(" ")),
      (3L, (1 to 12).map(i => s"u$i").mkString(" ")), // == prompt len
      (4L, "too short")).toDF("doc_id", "text")
    val out = Sft.renderChat(docs, "doc_id", "text").orderBy("doc_id")
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    out.foreach { r =>
      val rendered = r.getString(3)
      val lossStart = r.getLong(4)
      // the masked prefix ends exactly at the assistant role marker
      assert(rendered.substring(0, lossStart.toInt - 1)
        .endsWith("<|assistant|>\n"))
      val response = rendered.substring(lossStart.toInt - 1)
        .stripSuffix("<|end|>")
      assert(response.split(" ").length === r.getLong(2))
      val userTurn = rendered
        .split("<\\|user\\|>\n")(1).split("\n<\\|assistant\\|>")(0)
      assert(userTurn.split(" ").length === 12)
      assert(r.getLong(1) === 12 + r.getLong(2))
    }
  }

  test("renderChat deterministic under repartition and respects a " +
      "custom prompt length") {
    val docs = (0L until 30L).map(i =>
      (i, (0 until 25).map(t => s"t$t").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Sft.renderChat(docs, "doc_id", "text", promptTokens = 5)
      .orderBy("doc_id").collect()
    val b = Sft.renderChat(docs.repartition(7), "doc_id", "text",
      promptTokens = 5).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.forall(_.getLong(2) === 20L))
  }

  test("preferencePairs: argmax/argmin with deterministic ties; " +
      "singleton groups dropped; tied two-doc group still pairs") {
    val scored = Seq(
      // group a: clear max/min
      ("a", 1L, 0.5), ("a", 2L, 0.9), ("a", 3L, 0.1),
      // group b: all tied — chosen = smallest id, rejected = largest
      ("b", 10L, 0.7), ("b", 11L, 0.7), ("b", 12L, 0.7),
      // group c: singleton — dropped
      ("c", 20L, 0.3)).toDF("g", "id", "score")
    val out = Sft.preferencePairs(scored, Seq("g"), "id", "score")
      .orderBy("g").collect()
    assert(out.length === 2)
    val a = out(0)
    assert(a.getString(0) === "a" && a.getLong(1) === 2L &&
      a.getLong(2) === 3L)
    assert(math.abs(a.getDouble(5) - 0.8) < 1e-12)
    assert(a.getLong(6) === 3L)
    val b = out(1)
    assert(b.getString(0) === "b" && b.getLong(1) === 10L &&
      b.getLong(2) === 12L && b.getDouble(5) === 0.0)
  }

  test("assembleConversations: gap sessionization, alternating " +
      "roles, turn cap, and md5 agreement") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val events = Seq(
      // user 1, session 1: 3 close events
      (1L, ts(0), 1L, "hello"), (1L, ts(60), 2L, "hi"),
      (1L, ts(120), 3L, "bye"),
      // user 1, session 2: after a 31-min gap
      (1L, ts(120 + 31 * 60), 4L, "again"),
      // user 2: 10 events -> capped at 8 turns
      ) ++ (0 until 10).map(i => (2L, ts(i.toLong * 10), 10L + i,
        s"m$i"))
    val df = events.toDF("user_id", "ts", "event_id", "txt")
    val out = Sft.assembleConversations(df, "user_id", "ts",
      "event_id", "txt").orderBy("user_id", "session_idx").collect()
    assert(out.length === 3)
    val s1 = out(0)
    assert(s1.getLong(2) === 3L && s1.getLong(3) === 3L)
    assert(s1.getString(4) ===
      "<|user|>\nhello\n<|assistant|>\nhi\n<|user|>\nbye\n<|end|>")
    val s2 = out(1)
    assert(s2.getLong(1) === 2L && s2.getLong(2) === 1L)
    assert(s2.getString(4) === "<|user|>\nagain\n<|end|>")
    val u2 = out(2)
    assert(u2.getLong(2) === 10L && u2.getLong(3) === 8L)
    assert(u2.getString(4).split("<\\|user\\|>").length === 5)
    out.foreach { r =>
      val md5Ref = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getString(4).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(5) === md5Ref)
    }
  }

  test("preferencePairs aggregates without a join or window " +
      "(single hash-aggregate plan)") {
    val scored = (0L until 100L).map(i =>
      (s"g${i % 7}", i, (i % 13).toDouble)).toDF("g", "id", "score")
    val plan = Sft.preferencePairs(scored, Seq("g"), "id", "score")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin") && !plan.contains("Window"),
      plan)
  }
}
