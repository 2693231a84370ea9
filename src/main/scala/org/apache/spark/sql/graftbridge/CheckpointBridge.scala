package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Bridge to the block-backed RDD under a (local)checkpointed
  * DataFrame. `Dataset.unpersist` reaches only CacheManager entries —
  * checkpoint blocks are plain persisted RDDs visible solely through
  * the `LogicalRDD` leaf, so an iterative operator that checkpoints
  * per round (the lineage-truncation discipline) accumulates one
  * dead node-sized RDD per round with no public way to free it.
  *
  * Callers must guarantee the frame is DEAD (no returned plan
  * references it): a checkpointed lineage cannot recompute after
  * unpersist, so freeing a live frame turns later reads into
  * block-not-found failures, not slow paths. */
object CheckpointBridge {
  def freeCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
