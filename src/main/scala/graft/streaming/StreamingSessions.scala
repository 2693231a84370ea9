package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The R5 chat-session operator (`services/chat_session_service.py:
  * 13-62`: get-or-create, append user+assistant turns, 24 h TTL, cap
  * at 2×20 list entries) wired END TO END as a continuous Structured
  * Streaming query, mirroring [[StreamingIngest]]:
  *
  *   turn source (a directory of JSON-lines turn events — the Redis
  *   LPUSH analog) → keyed session state (`StreamingOps.sessions`, a
  *   `flatMapGroupsWithState` with ProcessingTimeTimeout playing the
  *   Redis TTL) → session-snapshot parquet append.
  *
  * The checkpointed state store replaces Redis: a stopped and
  * restarted query resumes every session's history exactly
  * (StreamingSessionsSpec proves snapshots across separate runs
  * accumulate state, and that the final history equals the batch
  * computation over all turns).
  */
object StreamingSessions {

  private val TurnSchema = StructType(Seq(
    StructField("sessionId", StringType),
    StructField("role", StringType),
    StructField("content", StringType),
    StructField("ts", LongType)))

  /** Streaming turn source: JSON-lines files dropped into `turnsDir`,
    * one `{"sessionId","role","content","ts"}` object per line. */
  def watchTurns(spark: SparkSession,
      turnsDir: String): Dataset[StreamingOps.Turn] = {
    import spark.implicits._
    spark.readStream.schema(TurnSchema).json(turnsDir)
      .as[StreamingOps.Turn]
  }

  /** Start the session pipeline; each micro-batch appends the updated
    * snapshot (capped newest-first history) of every touched session.
    * `Trigger.AvailableNow` drains pending turn files and terminates;
    * a processing-time trigger tails continuously. `withTimeout=false`
    * is for synchronous test harnesses (ProcessingTimeTimeout forces
    * continuous micro-batches — see `StreamingOps.completeFiles`). */
  def start(spark: SparkSession, turnsDir: String, outDir: String,
      checkpointDir: String, withTimeout: Boolean = true,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    StreamingOps.sessions(watchTurns(spark, turnsDir), withTimeout)
      .toDF()
      .select(col("sessionId"), col("nTurns"),
        to_json(col("turns")).as("history"))
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
