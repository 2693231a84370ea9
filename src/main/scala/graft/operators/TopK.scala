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

  /** Best-first comparison key: ascending (-score, id). */
  private val outOrd: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  /** PriorityQueue dequeues its GREATEST element; under outOrd the
    * greatest tuple is the WORST candidate — exactly what a bounded
    * top-k heap evicts. */
  private val heapOrd: Ordering[Scored] = outOrd

  class TopKAgg(k: Int)
      extends Aggregator[Scored, mutable.PriorityQueue[Scored],
        Seq[Scored]] {
    def zero: mutable.PriorityQueue[Scored] =
      mutable.PriorityQueue.empty(heapOrd)
    def reduce(buf: mutable.PriorityQueue[Scored],
        s: Scored): mutable.PriorityQueue[Scored] = {
      if (buf.size < k) buf.enqueue(s)
      else if (outOrd.lt(s, buf.head)) { buf.dequeue(); buf.enqueue(s) }
      buf
    }
    def merge(a: mutable.PriorityQueue[Scored],
        b: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
      b.foreach(s => reduce(a, s))
      a
    }
    def finish(buf: mutable.PriorityQueue[Scored]): Seq[Scored] =
      buf.toSeq.sorted(outOrd)
    def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.kryo[mutable.PriorityQueue[Scored]]
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
      extends Aggregator[Scored, mutable.PriorityQueue[Scored],
        Seq[Scored]] {
    def zero: mutable.PriorityQueue[Scored] =
      mutable.PriorityQueue.empty(heapOrd)
    def reduce(buf: mutable.PriorityQueue[Scored],
        s: Scored): mutable.PriorityQueue[Scored] = {
      if (buf.size < k) {
        if (!buf.exists(_.id == s.id)) buf.enqueue(s)
      } else if (outOrd.lt(s, buf.head) &&
          !buf.exists(_.id == s.id)) {
        buf.dequeue(); buf.enqueue(s)
      }
      buf
    }
    def merge(a: mutable.PriorityQueue[Scored],
        b: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
      b.foreach(s => reduce(a, s))
      a
    }
    def finish(buf: mutable.PriorityQueue[Scored]): Seq[Scored] =
      buf.toSeq.sorted(outOrd)
    def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.kryo[mutable.PriorityQueue[Scored]]
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
