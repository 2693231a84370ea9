package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Approximate frequent-items (heavy hitters) — the "what are the
  * top terms / URLs / hosts in 100 TB" profiling query, answered
  * EXACTLY without ever materializing the full term dictionary.
  *
  * Two passes:
  *   1. a Misra–Gries summary of `capacity` counters PER PARTITION
  *      (mapPartitions; constant memory). MG's guarantee: any item
  *      whose partition frequency exceeds n_p/capacity survives that
  *      partition's summary, so any item with GLOBAL frequency
  *      > N/capacity must survive in at least one partition (if it
  *      were evicted everywhere, its total would be ≤ Σ n_p/capacity
  *      = N/capacity). The union of summaries is therefore a
  *      candidate superset of every true heavy hitter.
  *   2. an exact re-count restricted to the candidates (broadcast
  *      semi-join — candidates are ≤ capacity·partitions rows, tiny)
  *      and exact top-k by (count DESC, item ASC).
  *
  * The result is EXACT — identical to the full groupBy-count top-k —
  * whenever the k-th true frequency exceeds N/capacity (callers size
  * `capacity` to that bound; HeavyHittersSpec pins the guarantee on
  * an adversarial eviction stream). What scales is the state: the
  * full dictionary groupBy shuffles every distinct term (billions at
  * corpus scale); this shuffles `capacity` counters per partition
  * plus one counting pass over candidate rows only.
  */
object HeavyHitters {

  /** Exact top-`k` frequent values of `itemCol` via the MG-candidate
    * + re-count scheme above. Output: (itemCol, cnt), ordered
    * (cnt DESC, item ASC). Nulls are ignored. */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int,
      capacity: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val stream = items.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull).as[String]
    val candidates = stream.mapPartitions { it =>
      val m = new java.util.HashMap[String, Long]()
      it.foreach { s =>
        val cur = m.getOrDefault(s, 0L)
        if (cur != 0L) m.put(s, cur + 1)
        else if (m.size < capacity) m.put(s, 1L)
        else {
          // classic MG step: decrement every counter, drop zeros —
          // amortized O(1) per item (each decrement pays for an
          // earlier increment)
          val e = m.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove()
            else en.setValue(en.getValue - 1)
          }
        }
      }
      m.keySet().iterator().asScala
    }.distinct()
    items
      .join(broadcast(candidates.toDF(itemCol)), Seq(itemCol),
        "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(itemCol))
      .limit(k)
  }
}
