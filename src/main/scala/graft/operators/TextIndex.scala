package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Persisted inverted text index — the index-once / query-many form
  * of [[Hybrid.bm25]] (whose per-call inverted index re-tokenizes the
  * corpus on every query batch; reference analog: the sparse Qdrant
  * collection that persists between queries,
  * `services/database_qdrant_sparse_testing.py:33-108`).
  *
  * Layout: postings (term, doc, tf, dl) bucketed AND sorted by term —
  * a term-equality join against it is bucket-local (no Exchange on
  * the postings side, TextIndexSpec pins it); `<table>_terms`
  * (term, df) bucketed the same way; `<table>_stats` one row
  * (n_docs, avgdl). At 100 TB the build is two shuffles of the token
  * stream (tf groupBy + bucketed write) paid ONCE; each query batch
  * then shuffles only its own candidate rows.
  */
object TextIndex {

  /** The session catalog is in-memory while the warehouse directory
    * persists across JVMs: a table absent from THIS session's
    * catalog whose location survived a previous process would fail
    * saveAsTable with LOCATION_ALREADY_EXISTS. The orphan delete is
    * scoped to IMMEDIATELY before the overwrite of that exact table
    * (not a bulk sweep up front), which keeps the window in which a
    * concurrent sibling session could lose its directory as small
    * as the catalog API allows; fully concurrent builders against
    * one warehouse need an external catalog (the in-memory catalog
    * cannot arbitrate them). */
  private def clearOrphanLocation(spark: SparkSession,
      t: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    if (!spark.catalog.tableExists(t)) {
      val p = new org.apache.hadoop.fs.Path(wh, t.toLowerCase)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  /** Build and persist the index tables for `corpus`. `table` must be
    * an UNQUALIFIED name (the orphan-location cleanup derives the
    * warehouse path from it; a qualified `db.t` would compute a wrong
    * path — rejected up front). */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit = {
    require(!table.contains("."),
      s"TextIndex.build requires an unqualified table name, got $table")
    val spark = corpus.sparkSession
    def clearOrphan(t: String): Unit = clearOrphanLocation(spark, t)
    val tf = Hybrid.termFrequencies(corpus, idCol, textCol)
    val docLen = corpus.select(col(idCol).as("doc"))
      .join(tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl")),
        Seq("doc"), "left")
    val postings = tf.join(docLen, Seq("doc"))
      .select(col("term"), col("doc"), col("tf"), col("dl"))
    clearOrphan(table)
    postings.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    clearOrphan(s"${table}_terms")
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(s"${table}_terms")
    // n_docs counts every corpus doc (null-text docs included);
    // avgdl skips their null dl — identical to Hybrid.bm25's stats.
    // n_dl/sum_dl are the MERGEABLE form of avgdl (exact long sum,
    // so [[appendDocs]] recombines bit-identically: integer-valued
    // double partial sums are exact below 2^53).
    clearOrphan(s"${table}_stats")
    docLen.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"),
        count(col("dl")).as("n_dl"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite")
      .format("parquet").saveAsTable(s"${table}_stats")
  }

  /** Append journal location: a plain parquet directory next to the
    * index tables (path-based, not catalog-based, so markers survive
    * and are visible across JVMs/sessions sharing the warehouse). */
  private def journalPath(spark: SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${table.toLowerCase}_applog")

  private def journalMark(spark: SparkSession, table: String,
      batchId: String, state: String): Unit = {
    import spark.implicits._
    Seq((batchId, state)).toDF("batch_id", "state")
      .coalesce(1).write.mode("append")
      .parquet(journalPath(spark, table).toString)
  }

  /** True iff every appendDocs batch that BEGAN also COMMITTED — the
    * detection half of the append failure contract (see
    * [[appendDocs]]). A `false` means a crash landed between the
    * postings append and the stats overwrite: postings and df/avgdl
    * may disagree, and the only safe recovery is [[build]] from the
    * full corpus (re-running the failed append would double-count the
    * batch's postings). */
  def appendConsistent(spark: SparkSession, table: String): Boolean = {
    val p = journalPath(spark, table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return true
    spark.read.parquet(p.toString)
      .groupBy(col("batch_id"))
      .agg(sum(when(col("state") === "commit", 1).otherwise(0))
        .as("commits"))
      .filter(col("commits") === 0)
      .isEmpty
  }

  /** Incrementally ADD documents to a persisted index — the
    * maintenance path that makes the index-once story real at 100 TB
    * (re-tokenizing a corpus to admit a day's new documents is not a
    * plan): new postings APPEND into the bucketed table (same bucket
    * spec, so probe joins stay bucket-local), the vocabulary-sized
    * terms table merges document frequencies, and stats recombine
    * from their mergeable (n, sum) form. TextIndexSpec proves
    * build(A) + appendDocs(B) ≡ build(A ∪ B): postings, terms, stats,
    * and BM25 scores all bit-identical. Caller contract: `newDocs`
    * must be disjoint from the indexed corpus (same as any
    * append-only ingest; [[Ingest.discover]]'s anti-join is the
    * dedup gate).
    *
    * FAILURE CONTRACT — the append is NOT atomic across the three
    * tables (postings append, then terms overwrite, then stats
    * overwrite; the in-memory catalog has no multi-table
    * transaction). A crash mid-append leaves postings ahead of
    * df/avgdl. Detection: each append writes a `begin` marker to the
    * path-based journal before touching any table and a `commit`
    * marker after the stats land; [[appendConsistent]] flags any
    * begun-but-uncommitted batch. Recovery: [[build]] from the full
    * corpus — re-running the failed append would double-count its
    * postings. */
  def appendDocs(newDocs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 64): Unit = {
    require(!table.contains("."),
      s"TextIndex.appendDocs requires an unqualified table name, " +
        s"got $table")
    val spark = newDocs.sparkSession
    val batchId = java.util.UUID.randomUUID().toString
    journalMark(spark, table, batchId, "begin")
    // materialize the increment's term frequencies ONCE: three
    // actions consume tf (postings write, terms merge, stats agg) —
    // without this the tokenize+groupBy re-executes per consumer,
    // three scans of the batch whose whole point is incrementality
    val tf = Hybrid.termFrequencies(newDocs, idCol, textCol)
      .localCheckpoint()
    val docLen = newDocs.select(col(idCol).as("doc"))
      .join(tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl")),
        Seq("doc"), "left")
    tf.join(docLen, Seq("doc"))
      .select(col("term"), col("doc"), col("tf"), col("dl"))
      .write.mode("append")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    // merge document frequencies; localCheckpoint breaks the lineage
    // so the overwrite does not read from the table it replaces
    val mergedTerms = spark.table(s"${table}_terms")
      .unionByName(
        tf.groupBy(col("term")).agg(count(lit(1)).as("df")))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .localCheckpoint()
    mergedTerms.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(s"${table}_terms")
    val inc = docLen.agg(count(lit(1)).as("n_docs"),
      count(col("dl")).as("n_dl"), sum(col("dl")).as("sum_dl")).head()
    val old = spark.table(s"${table}_stats")
      .select(col("n_docs"), col("n_dl"), col("sum_dl")).head()
    val nDocs = old.getLong(0) + inc.getLong(0)
    val nDl = old.getLong(1) + inc.getLong(1)
    val sumDl = (if (old.isNullAt(2)) 0L else old.getLong(2)) +
      (if (inc.isNullAt(2)) 0L else inc.getLong(2))
    val avgdl: java.lang.Double =
      if (nDl == 0) null else sumDl.toDouble / nDl
    val statsSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_docs",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("avgdl",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("n_dl",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_dl",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(nDocs, avgdl, nDl, sumDl)),
        statsSchema)
      .write.mode("overwrite")
      .format("parquet").saveAsTable(s"${table}_stats")
    journalMark(spark, table, batchId, "commit")
  }

  /** Posting-list lookup: all (term, doc, tf) rows for `terms`,
    * bucket-local on the index side. */
  def termQuery(spark: SparkSession, table: String,
      terms: Seq[String]): DataFrame =
    spark.table(table)
      .filter(col("term").isInCollection(terms))
      .select(col("term"), col("doc"), col("tf"))

  /** BM25 over the persisted index: same inputs, same fold, same
    * 9-decimal idf truncation as [[Hybrid.bm25]] — TextIndexSpec pins
    * bit-for-bit score equality. The only per-query shuffle is the
    * final (qid, doc) fold over candidate rows. */
  def bm25(spark: SparkSession, table: String, queries: DataFrame,
      qidCol: String, qtextCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries.select(col(qidCol).as("qid"),
      explode(array_distinct(TextFunctions.tokens(col(qtextCol))))
        .as("term"))
    val joined = qterms
      .join(spark.table(table), Seq("term"))
      .join(spark.table(s"${table}_terms"), Seq("term"))
      .crossJoin(broadcast(spark.table(s"${table}_stats")))
    Hybrid.scoreBm25(joined, k1, b)
  }

  /** POSITIONAL postings `<table>_pos` (term, doc, pos), bucketed and
    * sorted by term — the index-once form of
    * [[Hybrid.phraseMatches]]. One extra token-stream shuffle at
    * build time buys phrase queries that scan only the phrase's own
    * posting lists. */
  // TextFunctions.tokens is the ONE engine tokenizer — positions must
  // come from the same splitter as the BM25 postings for this table,
  // or a future tokenizer change silently de-synchronizes them
  private def positionStream(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    corpus
      .select(col(idCol).as("doc"),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "term")))
      .select(col("term"), col("doc"), col("pos").cast("long").as("pos"))

  def buildPositional(corpus: DataFrame, idCol: String,
      textCol: String, table: String, buckets: Int = 64): Unit = {
    require(!table.contains("."),
      s"TextIndex.buildPositional requires an unqualified table " +
        s"name, got $table")
    clearOrphanLocation(corpus.sparkSession, s"${table}_pos")
    positionStream(corpus, idCol, textCol).write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(s"${table}_pos")
  }

  /** Incremental positional-postings append — [[appendDocs]]' twin
    * for the phrase index (positional postings are per-document
    * facts, so append IS the whole merge; same bucket spec keeps the
    * probe bucket-local). Same disjointness contract as
    * [[appendDocs]]. */
  def appendDocsPositional(newDocs: DataFrame, idCol: String,
      textCol: String, table: String, buckets: Int = 64): Unit =
    positionStream(newDocs, idCol, textCol).write.mode("append")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(s"${table}_pos")

  /** Phrase query over the positional postings: the scan prunes to
    * the phrase's terms (`PushedFilters: In(term, ...)` — pinned in
    * TextIndexSpec), then the anchor-intersection tail shared with
    * the per-call [[Hybrid.phraseMatches]] runs over ONLY those
    * posting rows. Output: (doc, n_matches, first_pos). */
  def phraseQuery(spark: SparkSession, table: String,
      phrase: String): DataFrame = {
    val words = Hybrid.phraseWords(phrase)
    import spark.implicits._
    val slots = words.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("i", "term")
    val votes = spark.table(s"${table}_pos")
      .filter(col("term").isInCollection(words))
      .join(broadcast(slots), "term")
      .select(col("doc"), col("i"),
        (col("pos") - col("i")).cast("long").as("anchor"))
    Hybrid.phraseTail(votes, "doc", words.length)
  }
}
