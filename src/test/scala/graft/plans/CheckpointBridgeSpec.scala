package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** The bridge's safety invariant is ENFORCED, not advisory (r12
  * advice): freeing checkpoint blocks through a composite plan could
  * unpersist a leaf some OTHER live frame still needs — after which
  * that frame's reads die with block-not-found, far from the free.
  * The guard makes the bad call fail loudly at the free site. */
class CheckpointBridgeSpec extends SparkTestBase {
  import spark.implicits._

  test("frees a bare localCheckpoint frame and trivial wrappers") {
    val ck = (1 to 10).toDF("x").localCheckpoint()
    CheckpointBridge.freeCheckpointBlocks(ck.select(col("x") + 1))
    // idempotent on the bare frame (already-unpersisted RDD)
    CheckpointBridge.freeCheckpointBlocks(ck)
    CheckpointBridge.freeCheckpointBlocks(ck.filter(col("x") > 3))
  }

  test("refuses a composite plan embedding checkpoint leaves") {
    val a = (1 to 10).toDF("x").localCheckpoint()
    val b = (1 to 10).toDF("x").localCheckpoint()
    val joined = a.join(b, "x")
    val err = intercept[IllegalArgumentException] {
      CheckpointBridge.freeCheckpointBlocks(joined)
    }
    assert(err.getMessage.contains("bare"))
    // the live frames were untouched — both still readable
    assert(joined.count() === 10L)
    CheckpointBridge.freeCheckpointBlocks(a)
    CheckpointBridge.freeCheckpointBlocks(b)
  }

  test("refuses an aggregate over a checkpoint frame") {
    val ck = (1 to 10).toDF("x").localCheckpoint()
    intercept[IllegalArgumentException] {
      CheckpointBridge.freeCheckpointBlocks(
        ck.groupBy(col("x")).count())
    }
    CheckpointBridge.freeCheckpointBlocks(ck)
  }
}
