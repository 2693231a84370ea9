package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{Embed, Ingest}

/** The reference's core ingest loop (§3.2, `consumer_worker.py:63-97`)
  * wired END TO END as one Structured Streaming pipeline:
  *
  *   file source (staging dir) → markdown ingest (front-matter, ids,
  *   hierarchical chunking, enrichment) → per-file completeness
  *   barrier (`StreamingOps.chunkRowBarrier` — chunks of a file become
  *   visible atomically, the sentinel's `expected_chunks` played by
  *   the chunker's back-filled `total_chunks`) → embedding via the
  *   external-service boundary → bucketed parquet index append.
  *
  * Exactly-once: the parquet sink's commit log + the checkpointed
  * state store replace the reference's DuckDB WAL and Redis queue
  * (SURVEY §3.2 — lineage and job commit supply the atomicity the
  * reference builds by hand). The same operators run unchanged in
  * batch (`Ingest.ingestMarkdown`), and StreamingIngestSpec proves the
  * streamed index equals the batch output row for row.
  */
object StreamingIngest {

  /** Streaming (source_file, text) frame over a staging directory of
    * markdown files — S1's discovery scan as a file source; new files
    * are picked up per trigger, each file exactly once (source log). */
  def watchStaging(spark: SparkSession, stagingDir: String): DataFrame =
    spark.readStream.format("text")
      .option("wholetext", "true")
      .load(stagingDir)
      .select(col("_metadata.file_name").as("source_file"),
        col("value").as("text"))

  /** Chunk rows → barrier → rows, preserving every column via a JSON
    * payload through the keyed state (the barrier state carries whole
    * rows so completed files re-emit losslessly). */
  def throughBarrier(chunks: DataFrame,
      withTimeout: Boolean): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    val schema = chunks.schema
    val events = chunks.select(
        col("source_file").as("sourceFile"),
        col("chunk_index").cast("int").as("chunkIndex"),
        col("total_chunks").cast("int").as("expected"),
        to_json(struct(chunks.columns.map(col).toSeq: _*)).as("payload"))
      .as[StreamingOps.ChunkRowEvent]
    StreamingOps.completeChunkRows(events, withTimeout)
      .select(explode(col("payloads")).as("_j"))
      .select(from_json(col("_j"), schema).as("_r"))
      .select(col("_r.*"))
  }

  /** Start the full pipeline; stop via the returned query. The
    * default `Trigger.AvailableNow` drains the staging dir and
    * terminates (batch-like run); pass a processing-time trigger for
    * continuous tailing. `withTimeout=false` is for synchronous test
    * harnesses (see `StreamingOps.completeFiles`). */
  def start(spark: SparkSession, stagingDir: String, indexDir: String,
      checkpointDir: String,
      embedService: Embed.EmbeddingService = new Embed.HashEmbeddingService(32),
      buckets: Int = 64, withTimeout: Boolean = true,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val chunks = Ingest.ingestMarkdown(watchStaging(spark, stagingDir))
    val complete = throughBarrier(chunks, withTimeout)
    val embedded = Embed.embedText(complete, "chunk", "embedding",
      embedService, prefix = "")
    embedded
      .withColumn("doc_bucket",
        pmod(xxhash64(col("document_id")), lit(buckets)))
      // processing-time stamp for the §2.6 lifecycle reporting
      // ([[fileCompleteness]]); assigned post-barrier, so a file's
      // chunks are stamped within one visibility commit
      .withColumn("ingested_at", current_timestamp())
      .writeStream.format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /** §2.6 operational reporting over the streaming sink — the
    * streaming-mode analog of the reference's `ingestion_lifecycle`
    * dashboards (`docs/analytics.md`: per-file stage counts and
    * latencies over the DuckDB lifecycle table): per source file, the
    * chunk count vs the chunker's declared total, a completeness
    * verdict (exactly-once check: every index present exactly once),
    * duplicate-chunk count, and the ingest window (first→last chunk
    * visibility — the barrier makes a file's chunks land in ONE
    * commit, so a wide window flags a barrier/sink fault). Pure
    * batch DataFrame over the sink's parquet: runs identically on a
    * live sink directory or any sink-shaped chunk frame (without an
    * `ingested_at` column the window columns are null). */
  def fileCompleteness(index: DataFrame): DataFrame = {
    val hasTs = index.columns.contains("ingested_at")
    def ts(c: => org.apache.spark.sql.Column) =
      if (hasTs) c else lit(null).cast("timestamp")
    index.groupBy(col("source_file"))
      .agg(
        count(lit(1)).as("n_chunks"),
        max(col("total_chunks")).cast("long").as("expected_chunks"),
        countDistinct(col("chunk_index")).as("_n_idx"),
        countDistinct(col("chunk_id")).as("_n_ids"),
        ts(min(col("ingested_at"))).as("first_ingested_at"),
        ts(max(col("ingested_at"))).as("last_ingested_at"))
      .select(col("source_file"), col("n_chunks"),
        col("expected_chunks"),
        (col("n_chunks") === col("expected_chunks") &&
          col("_n_idx") === col("expected_chunks")).as("complete"),
        (col("n_chunks") - col("_n_ids")).as("n_dup_chunks"),
        col("first_ingested_at"), col("last_ingested_at"),
        ((unix_millis(col("last_ingested_at")) -
          unix_millis(col("first_ingested_at"))).cast("double") / 1e3)
          .as("ingest_window_sec"))
  }
}
