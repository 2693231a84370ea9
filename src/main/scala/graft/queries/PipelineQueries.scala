package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.functions.{Hashing, VectorFunctions, TextFunctions}
import graft.operators.{Chunker, Embed, Hybrid, Ingest, Rag, SimilaritySearch}

/** End-to-end pipeline queries (SURVEY §3.2 ingest + §3.1 RAG query
  * re-expressions). These exercise murmur3 ids, the markdown chunker,
  * passage enrichment, mock embedding, retrieval, and context
  * assembly — semantics DuckDB cannot express (murmur3 seed-0, the
  * generator UDF), so the driver records rows-only checks; value-level
  * invariants are covered by ScalaTest (ChunkerSpec, IngestSpec,
  * RagSpec, HashingSpec).
  */
object PipelineQueries {

  /** Documents table dressed as a staging batch of markdown files. */
  private def asMarkdownDocs(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      concat(lit("doc"), col("doc_id"), lit(".md")).as("source_file"),
      col("text"))

  /** §3.2 ingest slice: markdown docs → hierarchical chunking →
    * enrichment → canonical chunk rows with deterministic ids. */
  def q35ChunkPipeline(s: SparkSession, d: String): DataFrame =
    Ingest.ingestMarkdown(asMarkdownDocs(s, d))
      .select(col("chunk_id"), col("document_id"), col("source_file"),
        col("hash"), col("page"), col("chunk_index"), col("total_chunks"))
      .orderBy(col("source_file"), col("chunk_index"))

  /** §3.1 RAG slice: build an embedded index from the chunk pipeline
    * through the [[graft.operators.Embed.EmbeddingService]] boundary
    * (micro-batch 5 + retries, V1), embed the first 5 documents'
    * openings as queries with the asymmetric `"query: "` prefix (V2),
    * retrieve top-4 (reference RETRIEVER_TOP_K default), assemble
    * cited contexts. The deterministic hash service is bit-identical
    * to the mock-embedding column, so swapping the boundary in
    * changed no output row. */
  def q36RagPipeline(s: SparkSession, d: String): DataFrame = {
    val svc = new Embed.HashEmbeddingService(32)
    val chunks = Ingest.ingestMarkdown(asMarkdownDocs(s, d))
    // The index is consumed twice inside retrieve (scoring + chunk-text
    // join-back); in a real deployment it is written once (S7) and
    // read — persisting models that without recomputing the ingest.
    val index = Embed.embedText(chunks, "chunk", "embedding", svc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = Embed.embedText(
      documents(s, d).filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          substring(col("text"), 1, 64).as("qtext")),
      "qtext", "embedding", svc, prefix = Embed.QueryPrefix)
      .select(col("qid"), col("embedding"))
    Rag.retrieve(index, queries, k = 4)
      .select(col("qid"), col("context"),
        concat_ws(",", col("sources")).as("sources"))
      .orderBy(col("qid"))
  }

  /** V4/V5 hybrid retrieval: dense cosine (embeddings via the service
    * boundary) + sparse BM25 over the documents table, DBSF-fused
    * top-5 per query. */
  def q37HybridSearch(s: SparkSession, d: String): DataFrame = {
    val svc = new Embed.HashEmbeddingService(32)
    val index = Embed.embedText(
      documents(s, d).select(col("doc_id"), col("text")),
      "text", "vec", svc)
    val queries = Embed.embedText(
      documents(s, d).filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          substring(col("text"), 1, 80).as("qtext")),
      "qtext", "qvec", svc)
    Hybrid.hybridSearch(index, "doc_id", "text", "vec",
      queries, "qid", "qtext", "qvec", k = 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** §2.13 sentinel barrier, oracle-checked: lineitems play chunk
    * events (one per line), orders with lineitems emit the sentinel
    * carrying the expected count; the flatMapGroupsWithState barrier
    * (run in batch mode) must emit exactly the per-order groupBy
    * truth, chunk ids ordered by line number. */
  def q49StreamBarrier(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.streaming.StreamingOps
    val li = lineitem(s, d)
    val chunkEvents = li.select(
      col("l_orderkey").cast("string").as("sourceFile"),
      concat(col("l_orderkey"), lit("_"), col("l_linenumber"))
        .as("chunkId"),
      col("l_linenumber").as("chunkIndex"),
      lit(-1).as("expected"))
    val sentinels = li.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast("int").as("n"))
      .select(col("l_orderkey").cast("string").as("sourceFile"),
        lit("").as("chunkId"), lit(-1).as("chunkIndex"),
        col("n").as("expected"))
    val events = chunkEvents.unionByName(sentinels)
      .as[StreamingOps.ChunkEvent]
    StreamingOps.completeFiles(events, withTimeout = false)
      .toDF()
      .select(col("sourceFile").as("source_file"),
        col("count").as("n_chunks"),
        element_at(col("chunkIds"), 1).as("first_chunk"),
        element_at(col("chunkIds"), -1).as("last_chunk"))
      .orderBy(col("source_file"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_chunk_pipeline" -> (q35ChunkPipeline _),
    "q36_rag_pipeline" -> (q36RagPipeline _),
    "q37_hybrid_search" -> (q37HybridSearch _),
    "q49_stream_barrier" -> (q49StreamBarrier _),
  )

  /** q35-q37 are non-SQL-expressible (murmur3 seed-0 ids, generator
    * UDF, mock embedder) — rows-only. q49's barrier output IS the
    * per-order relational truth, so it oracle-checks the stateful
    * operator. */
  val oracle: Map[String, String] = Map(
    "q49_stream_barrier" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS source_file,
        | COUNT(*) AS n_chunks,
        | CAST(l_orderkey AS VARCHAR) || '_' ||
        |   CAST(MIN(l_linenumber) AS VARCHAR) AS first_chunk,
        | CAST(l_orderkey AS VARCHAR) || '_' ||
        |   CAST(MAX(l_linenumber) AS VARCHAR) AS last_chunk
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY source_file""".stripMargin,
  )
}
