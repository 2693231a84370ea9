package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.functions.{Hashing, VectorFunctions, TextFunctions}
import graft.operators.{Chunker, Embed, Hybrid, Ingest, Rag, SimilaritySearch}

/** End-to-end pipeline queries (SURVEY §3.2 ingest + §3.1 RAG query
  * re-expressions). These exercise murmur3 ids, the markdown chunker,
  * passage enrichment, mock embedding, retrieval, and context
  * assembly — ALL value-checked against DuckDB oracles: the murmur3
  * id family is re-derived in SQL by [[mmh3Ctes]], so even the chunk
  * and RAG pipelines hash-match end to end. ScalaTest covers the
  * operator-level invariants (ChunkerSpec, IngestSpec, RagSpec,
  * HashingSpec).
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

  /** V4/V5 hybrid retrieval over the EMBEDDED corpus (documents ⋈
    * embeddings on id): dense cosine + sparse BM25, DBSF-fused top-5
    * per query. Every float path is order-fixed (sorted folds,
    * truncated idf — see `Hybrid`), so the whole pipeline is
    * value-checked against the DuckDB oracle, closing the round-1
    * "libm ulp drift" waiver. */
  def q37HybridSearch(s: SparkSession, d: String): DataFrame = {
    val (index, queries) = hybridInputs(s, d)
    Hybrid.hybridSearch(index, "doc_id", "text", "vec",
      queries, "qid", "qtext", "qvec", k = 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** The shared hybrid-search inputs: embedded corpus (documents ⋈
    * embeddings) and the first 5 documents' openings as queries. */
  private def hybridInputs(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val emb = embeddings(s, d).select(col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("vec"))
    val index = documents(s, d).select(col("doc_id"), col("text"))
      .join(emb, "doc_id")
    val queries = documents(s, d).filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        substring(col("text"), 1, 80).as("qtext"))
      .join(emb.select(col("doc_id").as("qid"), col("vec").as("qvec")),
        "qid")
    (index, queries)
  }

  /** q37's hybrid retrieval with RECIPROCAL-RANK fusion — the other
    * fusion mode Qdrant exposes for the reference's dense+sparse
    * prefetch shape (rank-only, no distribution statistics): same
    * branches, 1/(60+rank) contributions, fused top-5. Value-exact
    * with no float folds at all (a two-term IEEE sum per doc). */
  def q127HybridRrf(s: SparkSession, d: String): DataFrame = {
    val (index, queries) = hybridInputs(s, d)
    Hybrid.hybridSearchRrf(index, "doc_id", "text", "vec",
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

  /** q37's hybrid search served from the PERSISTED inverted text
    * index (built once per corpus — `tableExists` guard — then every
    * query batch touches only its candidate postings): the
    * steady-state deployment shape. Same oracle as q37 — the two
    * formulations must be value-identical (TextIndexSpec pins the
    * BM25 legs bit-for-bit; dense/DBSF legs are shared code). */
  def q115HybridIndexed(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d).select(col("vec_id").as("doc_id"),
      col("embedding").cast("array<double>").as("vec"))
    val corpus = documents(s, d).select(col("doc_id"), col("text"))
      .join(emb, "doc_id")
    // Table identity = dataset dir + a CONTENT fingerprint (names,
    // lengths, and mtimes of the source parquet files, from a
    // metadata-only FS listing — no data scan): regenerating the
    // parquet in place changes length or mtime, so a stale persisted
    // index can never silently serve the old corpus, and the guard
    // costs milliseconds against the ~10s build it protects.
    val fp = contentFingerprint(s, d,
      Seq("documents.parquet", "embeddings.parquet"))
    val table = "graft_q115_idx_" + java.security.MessageDigest
      .getInstance("MD5").digest(fp.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    if (!s.catalog.tableExists(table))
      graft.operators.TextIndex.build(corpus, "doc_id", "text", table)
    val queries = documents(s, d).filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        substring(col("text"), 1, 80).as("qtext"))
      .join(emb.select(col("doc_id").as("qid"), col("vec").as("qvec")),
        "qid")
    Hybrid.hybridSearchIndexed(s, table, corpus, "doc_id", "vec",
      queries, "qid", "qtext", "qvec", k = 5)
      .orderBy(col("qid"), col("rnk"))
  }

  /** Document-side fastembed-style sparse BM25 embedding (the V4
    * sparse surface the reference loads as
    * `SparseTextEmbedding("Qdrant/bm25")`,
    * `database_qdrant_sparse_testing.py:154-163`): every document
    * becomes (indices = |mmh3(token)|, values = BM25 document-side
    * term weights, k=1.2 b=0.75 avg_len=256) through fastembed's own
    * tokenization (lowercase, \w-split, NLTK stopwords; stemming
    * deliberately omitted — [[graft.operators.SparseBm25]] scaladoc +
    * NOTES quantify the divergence). The oracle re-derives the ids
    * with the pure-SQL murmur3 CTEs — value-exact, not rows-only.
    *
    * Registered output is SCALAR-ONLY (driver-comparator contract:
    * no array/struct columns — pandas `sort_values` cannot order
    * ndarray cells, the r05 q116 red row): the production sparse
    * vectors are posexploded to one (doc_id, n_terms, pos,
    * term_index, weight) row per term, which also value-checks the
    * id-ascending array order (`pos` must equal the oracle's per-doc
    * rank of `term_index`). */
  def q116SparseBm25(s: SparkSession, d: String): DataFrame =
    graft.operators.SparseBm25.embed(documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("n_terms"),
        posexplode(arrays_zip(col("indices"), col("values"))))
      .select(col("doc_id"), col("n_terms"),
        col("pos").cast("long").as("pos"),
        col("col.indices").as("term_index"),
        col("col.values").as("weight"))
      .orderBy(col("doc_id"), col("term_index"))

  /** The retrieve→RERANK cascade's second stage
    * ([[graft.operators.Rerank.rerankTopK]]): candidates scored
    * through the external cross-encoder boundary in micro-batches,
    * top-10 per query kept by (score DESC, doc). Stage-1 candidate
    * generation here is a deterministic modulo partition — the real
    * retrievers feeding this stage are the separately-gated q31
    * cosine and q37/q115 BM25 — so the row under test is the
    * boundary + cascade itself. The stub scorer is the mmh3 device
    * ([[graft.operators.Rerank.HashRerankService]]), which the
    * oracle recomputes with the pure-SQL murmur3 CTEs — the rerank
    * output is value-exact, not rows-only. */
  def q151RerankCascade(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val qs = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"),
        substring(col("text"), 1, 40).as("qtext"))
    val cands = docs.withColumn("m", col("doc_id") % 10)
      .join(qs.withColumn("m", col("qid") % 10), "m")
      .select(col("qid"), col("qtext"), col("doc_id"), col("text"))
    graft.operators.Rerank.rerankTopK(cands, "qid", "qtext",
        "doc_id", "text", new graft.operators.Rerank.HashRerankService,
        k = 10)
      .select(col("qid"), col("doc_id"), col("rerank_score"),
        col("rnk"))
      .orderBy(col("qid"), col("rnk"))
  }

  /** Distillation training pairs
    * ([[graft.operators.Rerank.distillationPairs]] — Margin-MSE):
    * BM25 top-8 candidates per query (first 5 docs' 80-char prefixes
    * as queries, the gated q37 sparse leg), teacher-scored through
    * the cross-encoder boundary (mmh3 stub — SQL-recomputable), then
    * mined into (positive, hard-negative, teacher-margin) triples:
    * teacher's top-1 vs its next 3 ranks. The oracle replays BM25
    * retrieval, the murmur3 teacher, ranking, AND the pair join —
    * the whole mining pipeline is value-exact. */
  def q160DistillationPairs(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val qs = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        substring(col("text"), 1, 80).as("qtext"))
    val cands = Hybrid.prefetch(
        Hybrid.bm25(docs, "doc_id", "text", qs, "qid", "qtext"), 8)
      .select(col("qid"), col("doc"))
      .join(docs.withColumnRenamed("doc_id", "doc"), Seq("doc"))
      .join(qs, Seq("qid"))
    val scored = graft.operators.Rerank.rerankTopK(cands, "qid",
      "qtext", "doc", "text",
      new graft.operators.Rerank.HashRerankService, k = 8)
    graft.operators.Rerank.distillationPairs(scored, "qid", "doc",
        nNegatives = 3)
      .select(col("qid"), col("pos_id"), col("pos_score"),
        col("neg_id"), col("neg_score"), col("neg_rank"),
        col("margin"))
      .orderBy(col("qid"), col("neg_rank"))
  }

  /** The full serving cascade composed end-to-end
    * ([[graft.operators.Rag.retrieveReranked]]): markdown ingest →
    * chunk → embed → dense recall (12 candidates) → cross-encoder
    * rerank (the q151 boundary, mmh3 stub scorer) → top-4 dedup +
    * cited context assembly. q36 with the precision stage inserted;
    * the oracle replays EVERY stage in SQL — ids, embeddings,
    * cosine, the rerank hash, and the assembled context strings —
    * value-exact. */
  def q152RagRerankCascade(s: SparkSession, d: String): DataFrame = {
    val svc = new Embed.HashEmbeddingService(32)
    val chunks = Ingest.ingestMarkdown(asMarkdownDocs(s, d))
    val index = Embed.embedText(chunks, "chunk", "embedding", svc)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qtexts = documents(s, d).filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        substring(col("text"), 1, 64).as("qtext"))
    val queries = Embed.embedText(qtexts, "qtext", "embedding", svc,
      prefix = Embed.QueryPrefix)
    graft.operators.Rag.retrieveReranked(index, queries,
        new graft.operators.Rerank.HashRerankService,
        kCandidates = 12, k = 4)
      .select(col("qid"), col("context"),
        concat_ws(",", col("sources")).as("sources"))
      .orderBy(col("qid"))
  }

  /** q121's phrase search served from the PERSISTED positional
    * postings (`TextIndex.buildPositional` — built once per corpus
    * with the q115 content-fingerprint device): the scan prunes to
    * the phrase's own posting lists (`PushedFilters: In(term, ...)`)
    * instead of tokenizing the corpus per query. Same oracle as q121
    * — the two formulations must be value-identical. */
  def q122PhraseIndexed(s: SparkSession, d: String): DataFrame = {
    val fp = contentFingerprint(s, d, Seq("documents.parquet"))
    val table = "graft_q122_idx_" + java.security.MessageDigest
      .getInstance("MD5").digest(fp.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    if (!s.catalog.tableExists(s"${table}_pos"))
      graft.operators.TextIndex.buildPositional(
        documents(s, d), "doc_id", "text", table)
    graft.operators.TextIndex.phraseQuery(s, table, "table value")
      .select(col("doc").as("doc_id"), col("n_matches"),
        col("first_pos"))
      .orderBy(col("doc_id"))
  }

  /** Leaf-file content fingerprint of dataset inputs: recursive
    * listing of each input path, every LEAF file's path+len+mtime.
    * Directory-status fingerprints are wrong on object stores (S3A
    * returns synthetic len-0/mtime-0 statuses for "directories", so a
    * regenerated corpus would silently serve a stale index); leaf
    * statuses are real everywhere, and the listing is metadata-only.
    * Works whether the input is a single parquet file or a
    * directory-of-part-files. */
  private def contentFingerprint(s: SparkSession, d: String,
      inputs: Seq[String]): String = {
    val hconf = s.sparkContext.hadoopConfiguration
    inputs.flatMap { f =>
      val p = new org.apache.hadoop.fs.Path(d, f)
      val fs = p.getFileSystem(hconf)
      val it = fs.listFiles(p, true)
      val leaves = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        leaves += s"${st.getPath}:${st.getLen}:${st.getModificationTime}"
      }
      leaves.sorted
    }.mkString(s"$d|", "|", "")
  }

  /** §2.6 lifecycle reporting, value-checked: the SAME
    * [[graft.streaming.StreamingIngest.fileCompleteness]] view the
    * streaming sink is monitored with (per-file chunk counts,
    * completeness verdict, duplicate count — the reference's
    * `ingestion_lifecycle` dashboard analog, `docs/analytics.md`),
    * computed over the batch chunk pipeline whose chunk math the
    * oracle re-derives in SQL. The timestamp/window columns are
    * sink-only (processing time, not value-checkable) and are
    * excluded; StreamingIngestSpec asserts them on a live sink. */
  def q132FileCompleteness(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingIngest.fileCompleteness(
        Ingest.ingestMarkdown(asMarkdownDocs(s, d)))
      .select(col("source_file"), col("n_chunks"),
        col("expected_chunks"), col("complete"), col("n_dup_chunks"))
      .orderBy(col("source_file"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_chunk_pipeline" -> (q35ChunkPipeline _),
    "q132_file_completeness" -> (q132FileCompleteness _),
    "q36_rag_pipeline" -> (q36RagPipeline _),
    "q37_hybrid_search" -> (q37HybridSearch _),
    "q127_hybrid_rrf" -> (q127HybridRrf _),
    "q115_hybrid_indexed" -> (q115HybridIndexed _),
    "q116_sparse_bm25" -> (q116SparseBm25 _),
    "q151_rerank_cascade" -> (q151RerankCascade _),
    "q160_distillation_pairs" -> (q160DistillationPairs _),
    "q152_rag_rerank" -> (q152RagRerankCascade _),
    "q122_phrase_indexed" -> (q122PhraseIndexed _),
    "q49_stream_barrier" -> (q49StreamBarrier _),
  )

  /** Emit DuckDB CTE stages computing murmur3_x86_32(`strCol`, seed 0)
    * — the reference's `mmh3.hash(s) & 0xFFFFFFFF` — as unsigned
    * 64-bit arithmetic masked to 32 bits. Pure SQL reimplementation
    * of the public Murmur3 algorithm (same algorithm our codegen'd
    * `Murmur3Seed` expression implements, so the oracle checks ids
    * VALUE-exactly instead of rows-only). ASCII corpus ⇒ `ord` per
    * char equals the UTF-8 byte the reference hashes.
    *
    * Appends CTEs named `${tag}1..${tag}4` reading from `prev`; the
    * final CTE exposes all prior columns plus `outCol` (the unsigned
    * 32-bit hash). */
  private def mmh3Ctes(prev: String, strCol: String, outCol: String,
      tag: String): (String, String) = {
    val M = "4294967295"
    def rotl(x: String, r: Int) =
      s"((( $x << $r) | ( $x >> ${32 - r})) & $M)"
    def k1(k: String) =
      s"((${rotl(s"(($k * 3432918353) & $M)", 15)} * 461845907) & $M)"
    val round =
      s"((${rotl(s"xor(h, ${k1("k")})", 13)} * 5 + 3864292196) & $M)"
    val sql = s"""
      |${tag}1 AS (
      | SELECT *, list_transform(generate_series(1, len($strCol)),
      |   i -> (ord(substr($strCol, i, 1)))::UBIGINT) AS _${tag}_b
      | FROM $prev),
      |${tag}2 AS (
      | SELECT *, list_reduce(list_concat([0::UBIGINT],
      |   list_transform(generate_series(0, len(_${tag}_b) // 4 - 1),
      |     bi -> _${tag}_b[4*bi+1] + 256*_${tag}_b[4*bi+2]
      |       + 65536*_${tag}_b[4*bi+3] + 16777216*_${tag}_b[4*bi+4])),
      |   (h, k) -> $round) AS _${tag}_hb
      | FROM ${tag}1),
      |${tag}3 AS (
      | SELECT *, xor(CASE len(_${tag}_b) % 4
      |   WHEN 0 THEN _${tag}_hb
      |   WHEN 1 THEN xor(_${tag}_hb,
      |     ${k1(s"_${tag}_b[(len(_${tag}_b)//4)*4+1]")})
      |   WHEN 2 THEN xor(_${tag}_hb,
      |     ${k1(s"(_${tag}_b[(len(_${tag}_b)//4)*4+1] + 256*_${tag}_b[(len(_${tag}_b)//4)*4+2])")})
      |   ELSE xor(_${tag}_hb,
      |     ${k1(s"(_${tag}_b[(len(_${tag}_b)//4)*4+1] + 256*_${tag}_b[(len(_${tag}_b)//4)*4+2] + 65536*_${tag}_b[(len(_${tag}_b)//4)*4+3])")})
      |   END, len(_${tag}_b)::UBIGINT) AS _${tag}_hx
      | FROM ${tag}2),
      |${tag}4 AS (
      | SELECT *, xor(_${tag}_f4, _${tag}_f4 >> 16) AS $outCol FROM (
      |  SELECT *, ((xor(_${tag}_f2, _${tag}_f2 >> 13) * 3266489909) & $M)
      |    AS _${tag}_f4 FROM (
      |   SELECT *, ((xor(_${tag}_hx, _${tag}_hx >> 16) * 2246822507) & $M)
      |     AS _${tag}_f2 FROM ${tag}3)))""".stripMargin
    (sql, s"${tag}4")
  }

  /** Signed 32-bit view of an unsigned mmh3 CTE column (Spark's
    * Murmur3Seed yields a signed INT that pmod then normalizes). */
  private def mmSigned(c: String): String =
    s"(CASE WHEN $c >= 2147483648 THEN $c::BIGINT - 4294967296" +
      s" ELSE $c::BIGINT END)"

  /** Mock-embedding component from an mmh3 CTE column:
    * pmod(signed, 1e6)/1e6 − 0.5 (all-double arithmetic). */
  private def mmComponent(c: String): String =
    s"(CAST(((${mmSigned(c)} % 1000000) + 1000000) % 1000000 AS DOUBLE)" +
      s" / 1000000.0e0 - 0.5e0)"

  /** Shared CTE block re-deriving the ENTIRE chunk pipeline in SQL —
    * document ids (murmur3 of the raw text, DOC_%08X), window math
    * (the q54 closed form), passage-prefix chunk text, and chunk ids
    * (murmur3 of the prefixed chunk, %08x). Ends in a `chunks` CTE
    * with (doc_id, chunk_id, document_id, source_file, chunk,
    * chunk_index, n_chunks). */
  private val chunkCtes: String = {
    val budget = graft.operators.Chunker.DefaultBudget
    val step = budget - graft.operators.Chunker.DefaultOverlap
    val (docMm, docLast) = mmh3Ctes("base", "text", "_doc_h32", "dm")
    val (chMm, chLast) = mmh3Ctes("ctext", "chunk", "_ch_h32", "cm")
    s"""base AS (
      | SELECT doc_id, 'doc' || CAST(doc_id AS VARCHAR) || '.md'
      |   AS source_file, text, string_split(text, ' ') AS t
      | FROM documents),$docMm,
      |wins AS (
      | SELECT doc_id, source_file, t,
      |  printf('DOC_%08X', _doc_h32::BIGINT) AS document_id,
      |  CASE WHEN len(t) <= $budget THEN 1
      |   ELSE 1 + CAST(CEIL((len(t) - $budget) / $step.0) AS BIGINT)
      |   END AS n_chunks
      | FROM $docLast),
      |cidx AS (
      | SELECT doc_id, source_file, document_id, n_chunks, t,
      |  unnest(generate_series(0, n_chunks - 1)) AS chunk_index
      | FROM wins),
      |ctext AS (
      | SELECT doc_id, source_file, document_id, n_chunks, chunk_index,
      |  'passage: [' || document_id || '] ' || array_to_string(
      |    list_slice(t, chunk_index * $step + 1,
      |      LEAST(chunk_index * $step + $budget, len(t))), ' ') AS chunk
      | FROM cidx),$chMm,
      |chunks AS (
      | SELECT doc_id,
      |  document_id || '_' || printf('%08x', _ch_h32::BIGINT)
      |    AS chunk_id,
      |  document_id, source_file, chunk, chunk_index, n_chunks
      | FROM $chLast)""".stripMargin
  }

  private val q35Oracle: String =
    s"""WITH $chunkCtes
      |SELECT chunk_id, document_id, source_file, md5(chunk) AS hash,
      | 1 AS page, chunk_index, n_chunks AS total_chunks
      |FROM chunks
      |ORDER BY source_file, chunk_index""".stripMargin

  /** The q36 oracle: the FULL RAG slice in SQL — chunk pipeline (the
    * shared CTEs), 32-dim mock embeddings per chunk and per query
    * (one mmh3 per component over "text#i"), exhaustive cosine top-4
    * per query, duplicate-text dedup keeping best rank, and cited
    * context assembly. */
  private val q36Oracle: String = {
    val (ceMm, ceLast) = mmh3Ctes("cstr", "comp_str", "_ce_h32", "ce")
    val (qeMm, qeLast) = mmh3Ctes("qstr", "comp_str", "_qe_h32", "qe")
    s"""WITH $chunkCtes,
      |cstr AS (
      | SELECT chunk_id, source_file, chunk, dim,
      |  chunk || '#' || CAST(dim AS VARCHAR) AS comp_str
      | FROM (SELECT chunk_id, source_file, chunk,
      |   unnest(generate_series(0, 31)) AS dim FROM chunks)),$ceMm,
      |cemb AS (
      | SELECT chunk_id, source_file, chunk,
      |  list(${mmComponent("_ce_h32")} ORDER BY dim) AS emb
      | FROM $ceLast GROUP BY chunk_id, source_file, chunk),
      |qstr AS (
      | SELECT qid, dim, qs || '#' || CAST(dim AS VARCHAR) AS comp_str
      | FROM (SELECT doc_id AS qid,
      |   'query: ' || substr(text, 1, 64) AS qs,
      |   unnest(generate_series(0, 31)) AS dim
      |  FROM documents WHERE doc_id < 5)),$qeMm,
      |qemb AS (
      | SELECT qid, list(${mmComponent("_qe_h32")} ORDER BY dim) AS qv
      | FROM $qeLast GROUP BY qid),
      |scored AS (
      | SELECT q.qid, c.chunk_id, c.source_file, c.chunk,
      |  list_dot_product(q.qv, c.emb) /
      |   (sqrt(list_dot_product(q.qv, q.qv)) *
      |    sqrt(list_dot_product(c.emb, c.emb))) AS score
      | FROM qemb q, cemb c),
      |hits AS (SELECT * FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY score DESC, chunk_id) AS rnk
      |  FROM scored) WHERE rnk <= 4),
      |dedup AS (SELECT * FROM (
      |  SELECT *, MIN(rnk) OVER (PARTITION BY qid, chunk) AS best
      |  FROM hits) WHERE rnk = best),
      |numbered AS (
      | SELECT qid, source_file,
      |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rnk) AS n,
      |  regexp_replace(chunk,
      |    '^passage: \\[DOC_[0-9A-F]{8}\\] ', '') AS body
      | FROM dedup)
      |SELECT qid,
      | string_agg('[source' || CAST(n AS VARCHAR) || '] ' || body,
      |   chr(10) || '---' || chr(10) ORDER BY n) AS context,
      | string_agg(source_file, ',' ORDER BY n) AS sources
      |FROM numbered GROUP BY qid ORDER BY qid""".stripMargin
  }

  /** q152 oracle: q36's full replay widened to 12 candidates, the
    * rerank hash recomputed over each query‖0x01‖chunk pair with the
    * murmur3 CTEs, top-4 by (rerank score DESC, chunk_id), then the
    * SAME dedup/assembly tail keyed on the rerank rank. */
  private val q152Oracle: String = {
    val (ceMm, ceLast) = mmh3Ctes("cstr", "comp_str", "_ce_h32", "ce")
    val (qeMm, qeLast) = mmh3Ctes("qstr", "comp_str", "_qe_h32", "qe")
    val (rrMm, rrLast) = mmh3Ctes("rr_in", "pair", "_rr_h32", "rg")
    s"""WITH $chunkCtes,
      |cstr AS (
      | SELECT chunk_id, source_file, chunk, dim,
      |  chunk || '#' || CAST(dim AS VARCHAR) AS comp_str
      | FROM (SELECT chunk_id, source_file, chunk,
      |   unnest(generate_series(0, 31)) AS dim FROM chunks)),$ceMm,
      |cemb AS (
      | SELECT chunk_id, source_file, chunk,
      |  list(${mmComponent("_ce_h32")} ORDER BY dim) AS emb
      | FROM $ceLast GROUP BY chunk_id, source_file, chunk),
      |qraw AS (SELECT doc_id AS qid, substr(text, 1, 64) AS qtext
      |  FROM documents WHERE doc_id < 5),
      |qstr AS (
      | SELECT qid, dim, qs || '#' || CAST(dim AS VARCHAR) AS comp_str
      | FROM (SELECT qid, 'query: ' || qtext AS qs,
      |   unnest(generate_series(0, 31)) AS dim FROM qraw)),$qeMm,
      |qemb AS (
      | SELECT qid, list(${mmComponent("_qe_h32")} ORDER BY dim) AS qv
      | FROM $qeLast GROUP BY qid),
      |scored AS (
      | SELECT q.qid, c.chunk_id, c.source_file, c.chunk,
      |  list_dot_product(q.qv, c.emb) /
      |   (sqrt(list_dot_product(q.qv, q.qv)) *
      |    sqrt(list_dot_product(c.emb, c.emb))) AS score
      | FROM qemb q, cemb c),
      |cand AS (SELECT qid, chunk_id, source_file, chunk FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY score DESC, chunk_id) AS r1
      |  FROM scored) WHERE r1 <= 12),
      |rr_in AS (
      | SELECT c.qid, c.chunk_id, c.source_file, c.chunk,
      |  q.qtext || chr(1) || c.chunk AS pair
      | FROM cand c JOIN qraw q USING (qid)),$rrMm,
      |rscored AS (
      | SELECT qid, chunk_id, source_file, chunk,
      |  CAST(((${mmSigned("_rr_h32")} % 1000000) + 1000000) % 1000000
      |    AS DOUBLE) / 1000000.0e0 AS rscore
      | FROM $rrLast),
      |hits AS (SELECT * FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY rscore DESC, chunk_id) AS rnk
      |  FROM rscored) WHERE rnk <= 4),
      |dedup AS (SELECT * FROM (
      |  SELECT *, MIN(rnk) OVER (PARTITION BY qid, chunk) AS best
      |  FROM hits) WHERE rnk = best),
      |numbered AS (
      | SELECT qid, source_file,
      |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rnk) AS n,
      |  regexp_replace(chunk,
      |    '^passage: \\[DOC_[0-9A-F]{8}\\] ', '') AS body
      | FROM dedup)
      |SELECT qid,
      | string_agg('[source' || CAST(n AS VARCHAR) || '] ' || body,
      |   chr(10) || '---' || chr(10) ORDER BY n) AS context,
      | string_agg(source_file, ',' ORDER BY n) AS sources
      |FROM numbered GROUP BY qid ORDER BY qid""".stripMargin
  }

  /** q36-q37 are non-SQL-expressible (generator UDF, mock embedder)
    * — rows-only. q35 is fully re-derived in SQL including the
    * murmur3 ids; q49's barrier output IS the per-order relational
    * truth, so it oracle-checks the stateful operator. */
  /** The q37 oracle: the full hybrid pipeline in SQL — dense cosine
    * prefetch 50, BM25 prefetch 100 with floor-truncated idf, DBSF
    * z-normalization with order-fixed folds (every double fold seeds
    * 0.0 and runs in the same element order as the engine), full
    * outer fusion, top-5. */
  /** Shared CTE prefix of the hybrid-search oracles: embedded corpus,
    * queries, dense cosine prefetch 50 and BM25 sparse prefetch 100
    * (floor-truncated idf, term-ordered folds) — ends with `dense`
    * and `sparse` CTEs of (qid, doc, score). */
  private val hybridBranchCtes: String =
    """emb AS (SELECT vec_id AS doc_id,
      |  CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
      |docs AS (SELECT d.doc_id, d.text, e.vec
      |  FROM documents d JOIN emb e USING (doc_id)),
      |q AS (SELECT doc_id AS qid, substr(text, 1, 80) AS qtext, vec
      |  FROM docs WHERE doc_id < 5),
      |dense0 AS (
      | SELECT q.qid, c.doc_id AS doc,
      |  list_dot_product(q.vec, c.vec) /
      |   (sqrt(list_dot_product(q.vec, q.vec)) *
      |    sqrt(list_dot_product(c.vec, c.vec))) AS score
      | FROM q, docs c),
      |dense AS (SELECT qid, doc, score FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY score DESC, doc) AS r FROM dense0)
      | WHERE r <= 50),
      |tf AS (SELECT doc, term, COUNT(*) AS tf FROM (
      |  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
      |  FROM docs) GROUP BY 1, 2),
      |dl AS (SELECT doc_id AS doc, len(string_split(text, ' ')) AS dl
      |  FROM docs),
      |stats AS (SELECT COUNT(*) AS n_docs,
      |  AVG(len(string_split(text, ' '))) AS avgdl FROM docs),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |qt AS (SELECT qid,
      |  unnest(list_distinct(string_split(qtext, ' '))) AS term FROM q),
      |w AS (
      | SELECT qt.qid, tf.doc, qt.term,
      |  (floor(ln(1.0e0 + (stats.n_docs - dfreq.df + 0.5e0)
      |     / (dfreq.df + 0.5e0)) * 1e9) / 1e9)
      |   * (tf.tf * 2.2e0)
      |   / (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / stats.avgdl)) AS w
      | FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
      |  JOIN dl ON tf.doc = dl.doc, stats),
      |sparse0 AS (SELECT qid, doc,
      |  list_reduce(list_concat([0.0e0], list(w ORDER BY term)),
      |    (a, x) -> a + x) AS score
      | FROM w GROUP BY qid, doc),
      |sparse AS (SELECT qid, doc, score FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY score DESC, doc) AS r FROM sparse0)
      | WHERE r <= 100)""".stripMargin

  private val q37Oracle: String =
    s"""WITH $hybridBranchCtes,
      |dst AS (SELECT qid, list(score ORDER BY doc) AS ss, COUNT(*) AS n
      |  FROM dense GROUP BY qid),
      |dmu AS (SELECT qid, n, ss,
      |  list_reduce(list_concat([0.0e0], ss), (a, x) -> a + x) / n AS mu
      |  FROM dst),
      |dsd AS (SELECT qid, mu, sqrt(list_reduce(list_concat([0.0e0],
      |   list_transform(ss, x -> (x - mu) * (x - mu))),
      |   (a, x) -> a + x) / n) AS sd FROM dmu),
      |zdense AS (SELECT d.qid, d.doc,
      |  CASE WHEN sd > 0
      |   THEN (score - (mu - 3.0e0 * sd)) / (6.0e0 * sd) ELSE 0.5e0 END AS z
      | FROM dense d JOIN dsd USING (qid)),
      |sst AS (SELECT qid, list(score ORDER BY doc) AS ss, COUNT(*) AS n
      |  FROM sparse GROUP BY qid),
      |smu AS (SELECT qid, n, ss,
      |  list_reduce(list_concat([0.0e0], ss), (a, x) -> a + x) / n AS mu
      |  FROM sst),
      |ssd AS (SELECT qid, mu, sqrt(list_reduce(list_concat([0.0e0],
      |   list_transform(ss, x -> (x - mu) * (x - mu))),
      |   (a, x) -> a + x) / n) AS sd FROM smu),
      |zsparse AS (SELECT s.qid, s.doc,
      |  CASE WHEN sd > 0
      |   THEN (score - (mu - 3.0e0 * sd)) / (6.0e0 * sd) ELSE 0.5e0 END AS z
      | FROM sparse s JOIN ssd USING (qid)),
      |fused AS (SELECT COALESCE(zd.qid, zs.qid) AS qid,
      |  COALESCE(zd.doc, zs.doc) AS doc,
      |  COALESCE(zd.z, 0.0e0) + COALESCE(zs.z, 0.0e0) AS fused_score
      | FROM zdense zd FULL OUTER JOIN zsparse zs
      |  ON zd.qid = zs.qid AND zd.doc = zs.doc)
      |SELECT qid, doc, fused_score, rnk FROM (
      | SELECT *, ROW_NUMBER() OVER (
      |   PARTITION BY qid ORDER BY fused_score DESC, doc) AS rnk
      | FROM fused)
      |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** The q127 oracle: the shared hybrid branches, branch-local ranks
    * with the (score DESC, doc) tie-break, and the two-term RRF sum
    * — the fusion tail is rank arithmetic only. */
  private val q127Oracle: String =
    s"""WITH $hybridBranchCtes,
      |rd AS (SELECT qid, doc, ROW_NUMBER() OVER (
      |   PARTITION BY qid ORDER BY score DESC, doc) AS r FROM dense),
      |rs AS (SELECT qid, doc, ROW_NUMBER() OVER (
      |   PARTITION BY qid ORDER BY score DESC, doc) AS r FROM sparse),
      |fused AS (SELECT COALESCE(rd.qid, rs.qid) AS qid,
      |  COALESCE(rd.doc, rs.doc) AS doc,
      |  COALESCE(1.0e0 / (rd.r + 60), 0.0e0)
      |    + COALESCE(1.0e0 / (rs.r + 60), 0.0e0) AS rrf_score
      | FROM rd FULL OUTER JOIN rs
      |  ON rd.qid = rs.qid AND rd.doc = rs.doc)
      |SELECT qid, doc, rrf_score, rnk FROM (
      | SELECT *, ROW_NUMBER() OVER (
      |   PARTITION BY qid ORDER BY rrf_score DESC, doc) AS rnk
      | FROM fused)
      |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** q116 oracle: tokens (lowercase \w-split minus the NLTK stopword
    * list, injected as literals), per-(doc,token) tf + doc length,
    * mmh3 token ids via the pure-SQL murmur3 CTEs over the DISTINCT
    * vocabulary (vocab-sized, not stream-sized), the fastembed weight
    * formula with the constants built by the same IEEE ops the engine
    * uses, and one (doc, pos, term_index, weight) row per sparse
    * term, id-ascending (the posexploded scalar reshape). */
  private val q116Oracle: String = {
    val stoplist = graft.operators.SparseBm25.EnglishStopwords
      .map(w => "'" + w.replace("'", "''") + "'").mkString(", ")
    val (mm, last) = mmh3Ctes("vocab", "v_tok", "_tk_h32", "tk")
    s"""WITH tok0 AS (
      |  SELECT doc_id, unnest(list_filter(
      |    regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}_]+'),
      |    x -> len(x) > 0 AND x NOT IN ($stoplist))) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok0 GROUP BY 1, 2),
      |dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
      |vocab AS (SELECT DISTINCT tok AS v_tok FROM tf),$mm,
      |ids AS (SELECT v_tok, abs(${mmSigned("_tk_h32")}) AS idx
      |  FROM $last),
      |w AS (
      |  SELECT tf.doc_id, ids.idx,
      |    CAST(SUM(CAST(
      |      tf.tf * (1.2e0 + 1.0e0) /
      |        (tf.tf + 1.2e0 * ((1.0e0 - 0.75e0)
      |          + 0.75e0 * dl.dl / 256.0e0))
      |      AS DECIMAL(18,9))) AS DOUBLE) AS v
      |  FROM tf JOIN dl USING (doc_id) JOIN ids ON tf.tok = ids.v_tok
      |  GROUP BY 1, 2)
      |SELECT doc_id,
      |  COUNT(*) OVER (PARTITION BY doc_id) AS n_terms,
      |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY idx) - 1
      |    AS pos,
      |  idx AS term_index, v AS weight
      |FROM w ORDER BY doc_id, term_index""".stripMargin
  }

  /** q132 oracle: the chunk CTEs' per-file truth — chunk count,
    * declared total, completeness (count and distinct indexes both
    * equal the total), and duplicate chunk ids. */
  private val q132Oracle: String =
    s"""WITH $chunkCtes
      |SELECT source_file, COUNT(*) AS n_chunks,
      | MAX(n_chunks) AS expected_chunks,
      | (COUNT(*) = MAX(n_chunks) AND
      |  COUNT(DISTINCT chunk_index) = MAX(n_chunks)) AS complete,
      | COUNT(*) - COUNT(DISTINCT chunk_id) AS n_dup_chunks
      |FROM chunks GROUP BY source_file
      |ORDER BY source_file""".stripMargin

  /** q151 oracle: the candidate partition, the mmh3 stub scorer
    * recomputed with the pure-SQL murmur3 CTEs over each
    * query‖0x01‖passage pair, and the (score DESC, doc) top-10. */
  private val q151Oracle: String = {
    val (mm, last) = mmh3Ctes("cand", "pair", "_rr_h32", "rr")
    s"""WITH q AS (SELECT doc_id AS qid, substr(text, 1, 40) AS qtext
      |  FROM documents WHERE doc_id < 3),
      |cand AS (SELECT q.qid, d.doc_id,
      |    q.qtext || chr(1) || d.text AS pair
      |  FROM q JOIN documents d ON d.doc_id % 10 = q.qid % 10),$mm,
      |scored AS (SELECT qid, doc_id,
      |  CAST(((${mmSigned("_rr_h32")} % 1000000) + 1000000) % 1000000
      |    AS DOUBLE) / 1000000.0e0 AS rerank_score
      |  FROM $last),
      |ranked AS (SELECT qid, doc_id, rerank_score, ROW_NUMBER() OVER (
      |  PARTITION BY qid ORDER BY rerank_score DESC, doc_id) AS rnk
      |  FROM scored)
      |SELECT qid, doc_id, rerank_score, rnk FROM ranked
      |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
  }

  /** q160 oracle: the q37 sparse-leg BM25 CTEs (over plain documents
    * — no embedding join), prefetch 8, the mmh3 teacher recomputed
    * with the pure-SQL murmur3 CTEs, ranking, and the pair-mining
    * join — the full distillation pipeline replayed value-exactly. */
  private val q160Oracle: String = {
    val (mm, last) = mmh3Ctes("cand", "pair", "_ds_h32", "ds")
    s"""WITH docs AS (SELECT doc_id, text FROM documents),
      |q AS (SELECT doc_id AS qid, substr(text, 1, 80) AS qtext
      |  FROM docs WHERE doc_id < 5),
      |tf AS (SELECT doc, term, COUNT(*) AS tf FROM (
      |  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
      |  FROM docs) GROUP BY 1, 2),
      |dl AS (SELECT doc_id AS doc, len(string_split(text, ' ')) AS dl
      |  FROM docs),
      |stats AS (SELECT COUNT(*) AS n_docs,
      |  AVG(len(string_split(text, ' '))) AS avgdl FROM docs),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |qt AS (SELECT qid,
      |  unnest(list_distinct(string_split(qtext, ' '))) AS term
      |  FROM q),
      |w AS (
      | SELECT qt.qid, tf.doc, qt.term,
      |  (floor(ln(1.0e0 + (stats.n_docs - dfreq.df + 0.5e0)
      |     / (dfreq.df + 0.5e0)) * 1e9) / 1e9)
      |   * (tf.tf * 2.2e0)
      |   / (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / stats.avgdl))
      |   AS w
      | FROM qt JOIN tf USING (term) JOIN dfreq USING (term)
      |  JOIN dl ON tf.doc = dl.doc, stats),
      |sparse0 AS (SELECT qid, doc,
      |  list_reduce(list_concat([0.0e0], list(w ORDER BY term)),
      |    (a, x) -> a + x) AS score
      | FROM w GROUP BY qid, doc),
      |sparse AS (SELECT qid, doc FROM (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY score DESC, doc) AS r
      |  FROM sparse0)
      | WHERE r <= 8),
      |cand AS (SELECT s.qid, s.doc,
      |    q.qtext || chr(1) || d.text AS pair
      |  FROM sparse s JOIN q USING (qid)
      |  JOIN docs d ON d.doc_id = s.doc),$mm,
      |scored AS (SELECT qid, doc,
      |  CAST(((${mmSigned("_ds_h32")} % 1000000) + 1000000) % 1000000
      |    AS DOUBLE) / 1000000.0e0 AS ts
      |  FROM $last),
      |ranked AS (SELECT qid, doc, ts, ROW_NUMBER() OVER (
      |  PARTITION BY qid ORDER BY ts DESC, doc) AS rnk FROM scored),
      |pos AS (SELECT qid, doc AS pos_id, ts AS pos_score
      |  FROM ranked WHERE rnk = 1),
      |negs AS (SELECT qid, doc AS neg_id, ts AS neg_score,
      |    rnk - 1 AS neg_rank FROM ranked WHERE rnk BETWEEN 2 AND 4)
      |SELECT qid, pos_id, pos_score, neg_id, neg_score, neg_rank,
      |  pos_score - neg_score AS margin
      |FROM pos JOIN negs USING (qid)
      |ORDER BY qid, neg_rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q35_chunk_pipeline" -> q35Oracle,
    "q160_distillation_pairs" -> q160Oracle,
    "q151_rerank_cascade" -> q151Oracle,
    "q152_rag_rerank" -> q152Oracle,
    "q132_file_completeness" -> q132Oracle,
    "q36_rag_pipeline" -> q36Oracle,
    "q37_hybrid_search" -> q37Oracle,
    "q127_hybrid_rrf" -> q127Oracle,
    "q116_sparse_bm25" -> q116Oracle,
    // deliberately q37's oracle: the persisted-index form must be
    // value-identical to the per-call form
    "q115_hybrid_indexed" -> q37Oracle,
    // deliberately q121's oracle: the positional-index form must be
    // value-identical to the per-call phrase scan
    "q122_phrase_indexed" ->
      graft.queries.TextQueries.oracle("q121_phrase_search"),
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
