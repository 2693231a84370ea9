package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted inverted index: bit-identical BM25 vs the per-call path,
  * and the bucket-local join contract on the postings side. */
class TextIndexSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  private lazy val queries = {
    import spark.implicits._
    Seq((1L, "table scan fast"), (2L, "the window sort"),
      (3L, "spark batch stream value")).toDF("qid", "qtext")
  }

  test("persisted-index BM25 equals the per-call BM25 bit-for-bit") {
    TextIndex.build(docs, "doc_id", "text", "ti_docs", buckets = 8)
    try {
      val fromIndex = TextIndex.bm25(spark, "ti_docs", queries,
        "qid", "qtext").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val perCall = Hybrid.bm25(docs, "doc_id", "text", queries,
        "qid", "qtext").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(fromIndex.keySet === perCall.keySet)
      fromIndex.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ===
          java.lang.Double.doubleToLongBits(perCall(k)), s"score at $k")
      }
      assert(fromIndex.nonEmpty)
    } finally {
      Seq("ti_docs", "ti_docs_terms", "ti_docs_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("postings and term tables join bucket-locally — no Exchange " +
      "on either index side") {
    TextIndex.build(docs, "doc_id", "text", "ti_plan", buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ti_plan")
        .join(spark.table("ti_plan_terms"), "term")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"index-side join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("ti_plan", "ti_plan_terms", "ti_plan_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("positional phrase query equals the per-call phrase scan " +
      "row-for-row, and the postings scan prunes to the phrase's " +
      "terms (r5)") {
    TextIndex.buildPositional(docs, "doc_id", "text", "ti_pos",
      buckets = 8)
    try {
      val phrase = "table value"
      val fromIndex = TextIndex.phraseQuery(spark, "ti_pos", phrase)
      val plan = fromIndex.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [In(term"),
        s"phrase terms must reach the parquet scan:\n$plan")
      val got = fromIndex.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = Hybrid.phraseMatches(docs, "doc_id", "text", phrase)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want && got.nonEmpty,
        "persisted positional form must equal the corpus-scan form")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ti_pos_pos")
    }
  }

  test("appendDocsPositional: incremental phrase index equals the " +
      "from-scratch build (r5)") {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    TextIndex.buildPositional(even, "doc_id", "text", "ti_pinc",
      buckets = 8)
    TextIndex.appendDocsPositional(odd, "doc_id", "text", "ti_pinc",
      buckets = 8)
    TextIndex.buildPositional(docs, "doc_id", "text", "ti_pall",
      buckets = 8)
    try {
      def hits(t: String) =
        TextIndex.phraseQuery(spark, t, "table value").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(hits("ti_pinc") === hits("ti_pall"))
      assert(hits("ti_pinc").nonEmpty)
    } finally {
      Seq("ti_pinc_pos", "ti_pall_pos")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("appendDocs: incremental build is bit-identical to the " +
      "from-scratch build (r5)") {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    TextIndex.build(even, "doc_id", "text", "ti_inc", buckets = 8)
    TextIndex.appendDocs(odd, "doc_id", "text", "ti_inc", buckets = 8)
    TextIndex.build(docs, "doc_id", "text", "ti_all", buckets = 8)
    try {
      def rows(t: String) = spark.table(t).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(rows("ti_inc") === rows("ti_all"), "postings differ")
      def terms(t: String) = spark.table(t).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(terms("ti_inc_terms") === terms("ti_all_terms"),
        "document frequencies differ")
      val si = spark.table("ti_inc_stats")
        .select("n_docs", "avgdl").head()
      val sa = spark.table("ti_all_stats")
        .select("n_docs", "avgdl").head()
      assert(si.getLong(0) === sa.getLong(0))
      assert(java.lang.Double.doubleToLongBits(si.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(sa.getDouble(1)),
        "merged avgdl must be bit-identical to single-pass avg")
      val bi = TextIndex.bm25(spark, "ti_inc", queries, "qid", "qtext")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val ba = TextIndex.bm25(spark, "ti_all", queries, "qid", "qtext")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(bi.keySet === ba.keySet && bi.nonEmpty)
      bi.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ===
          java.lang.Double.doubleToLongBits(ba(k)), s"score at $k")
      }
    } finally {
      Seq("ti_inc", "ti_inc_terms", "ti_inc_stats",
        "ti_all", "ti_all_terms", "ti_all_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("appendDocs journal: committed appends read consistent, a " +
      "begun-but-uncommitted batch is detected (r6)") {
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    TextIndex.build(even, "doc_id", "text", "ti_jr", buckets = 8)
    try {
      assert(TextIndex.appendConsistent(spark, "ti_jr"),
        "fresh build (no journal) must read consistent")
      TextIndex.appendDocs(odd, "doc_id", "text", "ti_jr", buckets = 8)
      assert(TextIndex.appendConsistent(spark, "ti_jr"),
        "committed append must read consistent")
      // simulate a crash between the postings append and the stats
      // overwrite: a begin marker with no commit
      import spark.implicits._
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "ti_jr_applog")
      Seq(("crashed-batch", "begin")).toDF("batch_id", "state")
        .write.mode("append").parquet(p.toString)
      assert(!TextIndex.appendConsistent(spark, "ti_jr"),
        "unmatched begin marker must flag the index inconsistent")
    } finally {
      Seq("ti_jr", "ti_jr_terms", "ti_jr_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "ti_jr_applog")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  test("termQuery returns exactly the posting lists of the asked " +
      "terms") {
    TextIndex.build(docs, "doc_id", "text", "ti_tq", buckets = 8)
    try {
      val got = TextIndex.termQuery(spark, "ti_tq", Seq("table"))
        .select("doc").collect().map(_.getLong(0)).toSet
      val want = docs
        .filter(array_contains(split(col("text"), " "), "table"))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got === want && got.nonEmpty)
    } finally {
      Seq("ti_tq", "ti_tq_terms", "ti_tq_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
