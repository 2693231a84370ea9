package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Bounded top-k aggregation (SURVEY §4: the similarity top-k physical
  * shape). A ranked window over the scored cross product shuffles and
  * sorts every (query, corpus) pair; this `Aggregator` keeps a k-sized
  * min-heap per query on the map side, so the shuffle carries at most
  * k rows per partition per query — the 100 TB formulation of T1.
  *
  * Ordering is (score desc, id asc), identical to the window
  * formulation, so results are bit-compatible with the DuckDB oracle.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  /** Compact bounded top-k buffer (r15): parallel PRIMITIVE arrays
    * kept sorted best-first — replaces the PriorityQueue[Scored]
    * buffer whose per-element `exists` membership scan allocated a
    * boxed iterator per candidate row and whose kryo form serialized
    * one case object per kept element (the NN-descent candidate
    * stream pushes ~10⁷ rows/round through reduce()). The comparison
    * is the EXACT old total order — ascending (-score, id) under
    * Scala's Double TotalOrdering, i.e. `Double.compare(-s1, -s2)`
    * then id — so kept sets, eviction decisions and output order are
    * bit-identical (TopKSpec pins heap ≡ window on the shared
    * fixtures). */
  final class TopKBuf(val scores: Array[Double], val ids: Array[Long],
      var n: Int) extends Serializable {
    def this(k: Int) = this(new Array[Double](k), new Array[Long](k), 0)
  }

  /** < 0 ⇔ (s1, id1) ranks strictly better — ascending (-score, id),
    * the old heapOrd/outOrd key, NaN and ±0.0 semantics included. */
  private def cmp(s1: Double, id1: Long, s2: Double, id2: Long): Int = {
    val c = java.lang.Double.compare(-s1, -s2)
    if (c != 0) c else java.lang.Long.compare(id1, id2)
  }

  /** Bounded insert, optionally skipping ids already in the buffer
    * (the [[TopKDedupAgg]] contract: duplicate ids carry equal
    * scores, so the membership test alone decides). */
  private def insert(b: TopKBuf, k: Int, s: Double, id: Long,
      dedup: Boolean): Unit = {
    // fast reject first: on a converged candidate stream most rows
    // lose to the current worst — don't pay the membership scan for
    // them (a rejected duplicate changes nothing either way)
    if (b.n == k && cmp(s, id, b.scores(k - 1), b.ids(k - 1)) >= 0)
      return
    if (dedup) {
      var i = 0
      while (i < b.n) { if (b.ids(i) == id) return; i += 1 }
    }
    var pos = if (b.n < k) { b.n += 1; b.n - 1 } else k - 1
    while (pos > 0 && cmp(s, id, b.scores(pos - 1), b.ids(pos - 1)) < 0) {
      b.scores(pos) = b.scores(pos - 1); b.ids(pos) = b.ids(pos - 1)
      pos -= 1
    }
    b.scores(pos) = s; b.ids(pos) = id
  }

  private def toSeq(b: TopKBuf): Seq[Scored] =
    (0 until b.n).map(i => Scored(b.ids(i), b.scores(i)))

  class TopKAgg(k: Int)
      extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
    def zero: TopKBuf = new TopKBuf(k)
    def reduce(buf: TopKBuf, s: Scored): TopKBuf = {
      insert(buf, k, s.score, s.id, dedup = false)
      buf
    }
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var i = 0
      while (i < b.n) {
        insert(a, k, b.scores(i), b.ids(i), dedup = false); i += 1
      }
      a
    }
    def finish(buf: TopKBuf): Seq[Scored] = toSeq(buf)
    def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  case class ScoredS(id: String, score: Double)

  private val outOrdS: Ordering[ScoredS] =
    Ordering.by((s: ScoredS) => (-s.score, s.id))

  /** [[TopKAgg]] for string ids — same (score desc, id asc) order, so
    * results are bit-compatible with the ranked-window formulation
    * over a string id column. */
  class TopKAggS(k: Int)
      extends Aggregator[ScoredS, mutable.PriorityQueue[ScoredS],
        Seq[ScoredS]] {
    def zero: mutable.PriorityQueue[ScoredS] =
      mutable.PriorityQueue.empty(outOrdS)
    def reduce(buf: mutable.PriorityQueue[ScoredS],
        s: ScoredS): mutable.PriorityQueue[ScoredS] = {
      if (buf.size < k) buf.enqueue(s)
      else if (outOrdS.lt(s, buf.head)) { buf.dequeue(); buf.enqueue(s) }
      buf
    }
    def merge(a: mutable.PriorityQueue[ScoredS],
        b: mutable.PriorityQueue[ScoredS]): mutable.PriorityQueue[ScoredS] = {
      b.foreach(s => reduce(a, s))
      a
    }
    def finish(buf: mutable.PriorityQueue[ScoredS]): Seq[ScoredS] =
      buf.toSeq.sorted(outOrdS)
    def bufferEncoder: Encoder[mutable.PriorityQueue[ScoredS]] =
      Encoders.kryo[mutable.PriorityQueue[ScoredS]]
    def outputEncoder: Encoder[Seq[ScoredS]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** DEDUP-AWARE bounded top-k: identical to [[TopKAgg]] except that
    * an id already present in the heap is skipped. Sound ONLY when
    * duplicate ids always carry the SAME score (true when score is a
    * deterministic function of (query, id) — the NN-descent and IVF
    * candidate streams): a duplicate whose twin is in the heap is
    * skipped by the membership scan; one whose twin was evicted can
    * never re-enter because eviction implies every kept element beats
    * it and the insert test is strict. Replaces the
    * distinct→window→row_number chain over the full candidate stream
    * with one map-side-partial aggregation (r14 SegProbe: the
    * candidate distinct + window sort were ~50 s CPU per NN-descent
    * round at sf0.1 where the dot products were ~1 s). */
  class TopKDedupAgg(k: Int)
      extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
    def zero: TopKBuf = new TopKBuf(k)
    def reduce(buf: TopKBuf, s: Scored): TopKBuf = {
      insert(buf, k, s.score, s.id, dedup = true)
      buf
    }
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
      var i = 0
      while (i < b.n) {
        insert(a, k, b.scores(i), b.ids(i), dedup = true); i += 1
      }
      a
    }
    def finish(buf: TopKBuf): Seq[Scored] = toSeq(buf)
    def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** [[perQuery]] with in-heap id dedup ([[TopKDedupAgg]] contract:
    * duplicate ids always carry equal scores). */
  def perQueryDedup(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKDedupAgg(k).toColumn
    scored
      .select(col("qid").cast("long").as("qid"),
        col("id").cast("long").as("id"),
        col("score").cast("double").as("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(agg.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), col("col.id").as("cid"),
        col("col.score").as("score"), (col("pos") + 1).as("rnk"))
  }

  /** [[perQuery]] for STRING corpus ids (chunk ids): per-`qid` top-k
    * of a (qid LONG, id STRING, score DOUBLE) frame → (qid, cid,
    * score, rnk) best-first. */
  def perQueryStr(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAggS(k).toColumn
    scored
      .select(col("qid").cast("long").as("qid"),
        col("id").cast("string").as("id"),
        col("score").cast("double").as("score"))
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .mapValues(t => ScoredS(t._2, t._3))
      .agg(agg.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), col("col.id").as("cid"),
        col("col.score").as("score"), (col("pos") + 1).as("rnk"))
  }

  /** Per-`qid` top-k of a (qid LONG, id LONG, score DOUBLE) frame →
    * (qid, cid, score, rnk) best-first. */
  def perQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val agg = new TopKAgg(k).toColumn
    scored
      .select(col("qid").cast("long").as("qid"),
        col("id").cast("long").as("id"),
        col("score").cast("double").as("score"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(agg.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")))
      .select(col("qid"), col("col.id").as("cid"),
        col("col.score").as("score"), (col("pos") + 1).as("rnk"))
  }
}
