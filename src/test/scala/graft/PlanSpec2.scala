package graft

/** Continued plan pins (see PlanSpec). */
class PlanSpec2 extends SparkTestBase {

  test("q37: doc length and corpus stats derive from the tf exchange " +
      "— no independent re-tokenization of the corpus text") {
    val p = SparkEntry.queries("q37_hybrid_search")(spark, sf)
      .queryExecution.executedPlan.toString
    // the 3-pass shape tokenized text independently for docLen and
    // avgdl via tokenCount = size(split(text)); deriving dl = Σtf
    // removes every such site (9 of them in the old physical plan).
    // Query-text tokenization uses split over a substring, so this
    // marker is specific to the corpus branches.
    assert(!p.contains("size(split("),
      "corpus text is being re-tokenized outside the tf lineage")
  }

  test("q65: the interval range join plans as an equi-join on " +
      "(key, bucket) — never a nested-loop inequality scan") {
    val p = SparkEntry.queries("q65_range_join")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q88 span dedup: explode + keyed agg + window only — " +
      "no join of the token stream against itself") {
    val p = SparkEntry.queries("q88_span_dups")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("new relational analogs (q83-q92) never plan a cartesian " +
      "beyond the intended one-row scalar broadcasts") {
    for (q <- Seq("q83_large_orders", "q85_important_parts",
        "q90_customer_distribution", "q91_local_supplier_volume",
        "q92_profit_by_nation")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("q89: floats join only through the shortlist — the corpus-" +
      "wide scan is the quantized side, never a float cross join") {
    val df = SparkEntry.queries("q89_compressed_knn")(spark, sf)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop allowed is the broadcast of the ≤10-row
    // quantized query side into the corpus scan
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"unexpected nested-loop joins:\n$p")
  }

  test("q103 semdedup: the pair scan is an equi-join on the cluster " +
      "key — no cartesian, no nested-loop") {
    val p = SparkEntry.queries("q103_semdedup")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q107 source cap: the rank filter plans as WindowGroupLimit " +
      "so each partition keeps at most n rows per group pre-window") {
    val p = SparkEntry.queries("q107_source_cap")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q112 filtered knn: the metadata predicate is pushed into " +
      "the corpus parquet scan — pre-filter, not post-filter") {
    val p = SparkEntry.queries("q112_filtered_knn")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(label), " +
      "GreaterThanOrEqual(label,5)]"), p.take(2000))
  }

  test("q101/q102: no per-document window over the token stream; " +
      "the only nested-loop is the one-row scalar broadcast") {
    for (q <- Seq("q101_bigram_surprisal", "q102_dsir_weights")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution
      val p = plan.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnl <= 1, s"$q: unexpected nested-loop joins")
    }
  }

  test("graph + ranking queries (q162-q174): hash joins only — the " +
      "sole nested-loop surfaces are the one-row/broadcast devices") {
    for (q <- Seq("q162_pagerank", "q163_hits", "q164_kneser_ney",
        "q165_dirichlet_ql", "q166_maxsim", "q167_hamming_retrieval",
        "q168_interval_load", "q169_suffix_array",
        "q170_longest_repeat", "q171_char_entropy", "q172_zipf_slope",
        "q173_moore_lewis", "q174_embedding_covariance",
        "q175_personalized_pagerank", "q176_components")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
      // allowed: the broadcast count/types/query-token/stat frames
      // (≤2 per plan: e.g. qcf×ctot inside the Dirichlet grid)
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnl <= 2, s"$q: unexpected nested-loop joins")
    }
  }

  test("corpus-curation queries (q179-q186): hash joins only — the " +
      "sole nested-loops are the broadcast one-row total frames") {
    for (q <- Seq("q179_triangles", "q180_rouge_eval",
        "q181_cluster_keep_longest", "q182_blocklist",
        "q183_length_quantiles", "q184_curriculum",
        "q185_pmi_collocations", "q186_assortativity",
        "q187_langid_confusion", "q188_shared_neighbors",
        "q189_readability", "q190_kcore")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
      // allowed: q184's broadcast one-row count, q185's two one-row
      // totals (n, nb)
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
      assert(bnl <= 2, s"$q: unexpected nested-loop joins")
    }
  }

  test("q329/q330 margin scale path: fine scans and brute audit " +
      "legs never plan a CartesianProduct — every cross pairing " +
      "rides either a keyed cell_id join or a bounded-side " +
      "broadcast (centroid table / 512-row sampled query set)") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // the candidate builder is where the fine scan lives (the
    // registered frames eagerly checkpoint it away): pin BOTH
    // quantizer sizings to keyed-join shape
    for (cells <- Seq[Long => Int](
        operators.SimilaritySearch.coarseCellCount(_),
        operators.SimilaritySearch.coarseCellCountScaled(_))) {
      // executedPlan: EnsureRequirements has inserted the exchanges
      val p = operators.SimilaritySearch.parityMarginCandidates(
          emb, "vec_id", "embedding", cellsOf = cells)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"))
      // corpus-sized sides meet through a keyed exchange, never a
      // corpus broadcast
      assert(p.contains("Exchange hashpartitioning"))
    }
    // the registered frames downstream of the checkpoint stay
    // cartesian-free too (windows, margin arithmetic, audit joins)
    for (q <- Seq("q329_margin_mining_scaled", "q330_ann_recall_gate")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("q188 wedge stage: packed-adjacency generators, no " +
      "self-join — the pair enumeration must stream out of " +
      "Generate nodes, never a mids x mids join (r12 verdict)") {
    val p = SparkEntry.queries("q188_shared_neighbors")(spark, sf)
      .queryExecution.sparkPlan.toString
    // edge build + wedge enumeration are all Generate-based
    assert("Generate".r.findAllIn(p).size >= 2,
      "expected posexplode/explode(slice) generate nodes")
    // INNER joins: exactly the two tail deg lookups — the old wedge
    // self-join would be a third. (The degree gates are LeftSemi,
    // duplicated per union branch by pushdown, and don't touch the
    // wedge row volume.)
    val inner = "Join Inner".r.findAllIn(p).size +
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) Inner".r
        .findAllIn(p).size
    assert(inner <= 2, s"unexpected inner join in the wedge stage ($inner)")
    assert(!p.contains("CartesianProduct"))
  }

  test("sketch + propagation queries (q191-q197): keyed shuffles " +
      "only — the sole nested-loops are bounded sketch-pair joins") {
    for (q <- Seq("q191_kmv_distinct", "q192_hll_vocab",
        "q193_cms_term_freq", "q194_hop_distance",
        "q195_label_propagation", "q197_profile_sketched")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
    // q196 pairs |languages|² SKETCHES (k-long arrays, one row per
    // group) under inequality keys — the intended bounded
    // nested-loops; the token-stream side stays hash-joined
    val p196 = SparkEntry.queries("q196_sketch_setops")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p196.contains("CartesianProduct"), "q196")
  }

  test("training-pair queries (q198-q201): no cartesians; the " +
      "skip-gram negative lookup is a hash join on cumulative " +
      "slices, not a nested loop against the vocab") {
    for (q <- Seq("q198_power_iteration", "q199_badwords_filter",
        "q200_cooccurrence")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
    }
    val p201 = SparkEntry.queries("q201_skipgram_negatives")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p201.contains("CartesianProduct"), "q201")
    // allowed: the two one-row total-weight broadcasts
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p201).size
    assert(bnl <= 2, s"q201: $bnl nested-loop joins")
  }

  test("SFT materialization (q206-q208): FIM and chat rendering " +
      "are shuffle-free scans (presentation sort only); preference " +
      "pairs are one aggregation with no window and no self-join") {
    for (q <- Seq("q206_fim_transform", "q207_sft_render")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
      // exactly the one Exchange feeding the final orderBy sort
      val ex = "Exchange".r.findAllIn(p).size
      assert(ex <= 1, s"$q: $ex exchanges\n$p")
      assert(!p.contains("Window"), q)
    }
    val p208 = SparkEntry.queries("q208_preference_pairs")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p208.contains("CartesianProduct") &&
      !p208.contains("Window"), s"q208\n$p208")
  }

  test("CDC chunking (q209) is a shuffle-free narrow scan before " +
      "its presentation sort; unigram compression (q210) has no " +
      "cartesian and only broadcast one-row stat joins") {
    val p209 = SparkEntry.queries("q209_cdc_chunks")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p209.contains("CartesianProduct") &&
      !p209.contains("Window"), s"q209\n$p209")
    assert("Exchange".r.findAllIn(p209).size <= 1, s"q209\n$p209")
    val p210 = SparkEntry.queries("q210_unigram_compression")(
      spark, sf).queryExecution.sparkPlan.toString
    assert(!p210.contains("CartesianProduct"), s"q210\n$p210")
  }

  test("NN-descent (q211): keyed joins only — no cartesian; the " +
      "one-row count rides a broadcast") {
    val p = SparkEntry.queries("q211_nn_descent")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"), s"q211\n$p")
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 1, s"q211: $bnl nested-loop joins\n$p")
  }

  test("SFT/curation batch 10+ (q212-q215): no cartesians; " +
      "conversation assembly shuffles only on the session keys") {
    for (q <- Seq("q212_conversations", "q213_quality_fusion",
        "q214_sample_k_per_group", "q215_jaccard_prefix_join")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
    }
  }

  test("round-tail batch (q218-q226): no cartesians; the decon/" +
      "uniformity pair joins are equi- or broadcast-shaped") {
    for (q <- Seq("q218_chunk_dedup_pairs", "q219_distribution_drift",
        "q221_alignment_uniformity", "q222_quality_curriculum",
        "q224_pagerank_weighted", "q225_sft_build",
        "q226_graph_search")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
    }
    // q220's corpus x broadcast(eval) BNL is the audited compute
    // surface (the q31 pattern) — pin that it stays broadcast
    val p220 = SparkEntry.queries("q220_semantic_decon")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(p220.contains("BroadcastNestedLoopJoin") &&
      !p220.contains("CartesianProduct"), s"q220\n$p220")
  }

  test("r9 web-curation batch (q232-q242): no cartesians; the " +
      "robots rule table and the PSL snapshot ride broadcasts; the " +
      "fuzzy join blocks as an equi-join") {
    for (q <- Seq("q232_outlink_graph", "q233_url_canonical_dedup",
        "q234_web_authority", "q235_provenance_dedup",
        "q236_html_meta", "q237_canonical_preferred_dedup",
        "q238_anchor_text", "q239_fuzzy_name_join",
        "q240_content_type", "q241_robots_gate",
        "q242_web_curation_build", "q243_crawl_datasheet",
        "q244_html_tables", "q245_entity_clusters",
        "q246_line_corrections", "q247_refined_build",
        "q248_license_tags", "q249_notebook_script",
        "q250_code_corpus_build", "q251_diff_stats",
        "q252_function_chunks", "q253_import_stats",
        "q254_markdown_links", "q255_import_cooccurrence")) {
      val p = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
    val p241 = SparkEntry.queries("q241_robots_gate")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(p241.contains("BroadcastHashJoin"), s"q241\n$p241")
  }
}
