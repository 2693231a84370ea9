package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.LogicalRDD

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
  * block-not-found failures, not slow paths. That invariant is
  * ENFORCED here, not just documented (r12 advice): the frame must
  * be the checkpoint itself — a bare `LogicalRDD`, optionally under
  * trivial Project/Filter/alias wrappers the caller added over its
  * OWN checkpoint. A composite plan (join, aggregate, union …)
  * embeds checkpoint leaves that other live frames may still share;
  * freeing those would fail mysteriously at a LATER read, so the
  * free itself fails loudly instead. */
object CheckpointBridge {
  def freeCheckpointBlocks(df: DataFrame): Unit = {
    @annotation.tailrec
    def leaf(p: LogicalPlan): LogicalRDD = p match {
      case lr: LogicalRDD => lr
      case Project(_, child) => leaf(child)
      case Filter(_, child) => leaf(child)
      case SubqueryAlias(_, child) => leaf(child)
      case other => throw new IllegalArgumentException(
        "freeCheckpointBlocks: expected a bare (local)checkpointed " +
          "frame (LogicalRDD, optionally under trivial Project/" +
          "Filter/alias), got " + other.getClass.getSimpleName +
          " — freeing a composite plan could unpersist checkpoint " +
          "blocks still referenced by live frames")
    }
    leaf(df.queryExecution.analyzed).rdd.unpersist(blocking = false)
  }
}
