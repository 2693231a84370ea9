package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-data assembly (builder brief): bin
  * documents/chunks into fixed token-budget training sequences — the
  * step between chunking/splitting and the trainer, where unpacked
  * short documents would waste most of each context window.
  *
  * Packing rule: within a shard, documents are laid end-to-end in key
  * order and a document belongs to the bin where its FIRST token
  * lands (floor(exclusive-cumsum / budget)). Deterministic, one
  * window pass, no driver state; a bin may overflow by at most one
  * document's tail — the standard streaming-packing trade, preferred
  * at scale over exact first-fit (which is inherently sequential).
  *
  * Scale: the window partitions by `shards` (pmod of the key), so no
  * global sort / single-partition window exists; each shard packs
  * independently and bin ids are disjoint across shards. More shards
  * = more parallelism and marginally more padding at shard tails. */
object Packing {

  /** Adds `bin`: the packed-sequence id for each row.
    * `tokenCol` must be a numeric token count. */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
      budget: Int, shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col("_shard")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_shard", pmod(col(keyCol), lit(shards)))
      .withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        col("_shard") * 1000000L +
          floor((col("_cum") - col(tokenCol)) / budget).cast("long"))
      .drop("_shard", "_cum")
  }
}
