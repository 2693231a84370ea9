package graft.streaming

import graft.SparkTestBase
import graft.operators.Eval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming best-of-n yield monitor (24th streaming suite) — the
  * engine's first APPROXIMATE twin, so the proof obligations differ
  * from the exact suites and are stated explicitly:
  *
  *  1. EXACT REGIME (no compaction): the sketch snapshot is the
  *     sample multiset — [[Eval.bestOfNFromCounts]] over it is
  *     BIT-identical to batch [[Eval.bestOfNCurve]] on the same
  *     prefix, across micro-batch splits, replays and duplicates,
  *     and rank_err_bound = 0.
  *  2. APPROX REGIME (forced tiny cap): n_samples and total weight
  *     stay EXACT; the curve error obeys the documented bound
  *     (r_max − r_min) · n · rank_err_bound / n_samples; the
  *     snapshot is deterministic under re-delivery.
  *  3. The from-counts replay itself (per-rank spans) is proven
  *     bit-equal to the batch operator on exact batch-side counts —
  *     the auditFromCounts parity that regime 1 composes with. */
class StreamingYieldSpec extends SparkTestBase {
  import spark.implicits._

  // 4 problems × 60 samples, deterministic varied rewards with
  // repeats (ties exercise the rank-span replay)
  private val events: Seq[(String, Long, Double, Long)] =
    (0 until 240).map { i =>
      val p = s"p${i % 4}"
      val r = ((i * 37) % 23).toDouble / 23.0
      (p, (i / 4).toLong, r, i.toLong)
    }
  private val ns = Seq(1, 2, 4, 8, 500)

  private def curveKey(df: DataFrame): Map[(String, Long), Option[Double]] =
    df.collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toMap

  private def batchCurve(
      evs: Seq[(String, Long, Double, Long)]): Map[(String, Long), Option[Double]] =
    curveKey(Eval.bestOfNCurve(evs.toDF("problem", "sample", "r", "seq"),
      col("problem"), col("sample"), col("r"), ns))

  /** Runs the sketch over `chunks`, returns the latest-version
    * snapshot rows (problem, ver, n_samples, rank_err_bound, r9,
    * weight). */
  private def snapshot(
      chunks: Seq[Seq[(String, Long, Double, Long)]],
      name: String, cap: Int): Seq[(String, Long, Long, Long, Long, Long)] = {
    val input = MemoryStream[(String, Long, Double, Long)](spark, 1)
    val out = StreamingOps.streamingYieldSketch(
      input.toDF().toDF("problem", "sample", "r", "seq"),
      "problem", "seq", "r", cap)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
    q.stop()
    val all = spark.table(name).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val latest = all.groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).max }
    all.filter(t => latest(t._1) == t._2).toSeq
  }

  private def countsDf(
      snap: Seq[(String, Long, Long, Long, Long, Long)]): DataFrame =
    snap.map(t => (t._1, t._5, t._6)).toDF("problem", "r9", "weight")

  test("exact regime: from-counts over the live snapshot == batch " +
      "curve bit-identically, whole / chunked / duplicated delivery") {
    val want = batchCurve(events)
    for ((chunks, nm) <- Seq(
        (Seq(events), "yield_a"),
        (events.grouped(41).toSeq, "yield_b"),
        (events.grouped(50).toSeq.flatMap(c => Seq(c, c)), "yield_c"))) {
      val snap = snapshot(chunks, nm, cap = 256)
      assert(snap.forall(_._4 == 0L), s"$nm: expected exact regime")
      assert(snap.groupBy(_._1).forall { case (_, rs) =>
        rs.head._3 == 60L && rs.map(_._6).sum == 60L },
        s"$nm: exact n and conserved weight")
      assert(curveKey(Eval.bestOfNFromCounts(countsDf(snap), ns))
        === want, nm)
    }
  }

  test("from-counts per-rank replay == batch operator on exact " +
      "batch-side counts (auditFromCounts parity)") {
    val counts = events.toDF("problem", "sample", "r", "seq")
      .select(col("problem"),
        floor(col("r") * 1e9).cast("long").as("r9"))
      .groupBy("problem", "r9")
      .agg(count(lit(1)).as("weight"))
    assert(curveKey(Eval.bestOfNFromCounts(counts, ns))
      === batchCurve(events))
  }

  test("approx regime: exact counts survive, the documented " +
      "rank-error bound holds per curve point, snapshot is " +
      "deterministic under re-delivery") {
    val snap = snapshot(events.grouped(29).toSeq, "yield_d", cap = 8)
    assert(snap.exists(_._4 > 0L), "tiny cap must force compaction")
    assert(snap.groupBy(_._1).forall { case (_, rs) =>
      rs.head._3 == 60L && rs.map(_._6).sum == 60L },
      "n_samples and total weight stay exact through compaction")
    val approx = curveKey(Eval.bestOfNFromCounts(countsDf(snap), ns))
    val exact = batchCurve(events)
    val errW = snap.groupBy(_._1).map { case (p, rs) => p -> rs.head._4 }
    val range = events.map(_._3).max - events.map(_._3).min
    for (((p, n), av) <- approx) {
      val ev = exact((p, n))
      assert(av.isDefined === ev.isDefined, s"($p,$n) diagnostics agree")
      for (a <- av; e <- ev) {
        val bound = range * n * errW(p).toDouble / 60.0 + 1e-6
        assert(math.abs(a - e) <= bound,
          s"($p,$n): |$a - $e| > $bound (errW=${errW(p)})")
      }
    }
    // deterministic compaction: identical re-delivery → identical
    // weighted value table
    val snap2 = snapshot(events.grouped(29).toSeq, "yield_e", cap = 8)
    assert(snap.map(t => (t._1, t._3, t._4, t._5, t._6)).sorted ===
      snap2.map(t => (t._1, t._3, t._4, t._5, t._6)).sorted)
  }
}
