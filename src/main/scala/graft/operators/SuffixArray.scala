package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed generalized suffix array by prefix doubling — the
  * published scalable construction (Manber & Myers 1990 ranks;
  * distributed-sort formulation as in Flick & Aluru 2015): rank every
  * suffix of every document lexicographically among ALL suffixes of
  * the corpus. The suffix array is the index behind ExactSubstr-style
  * corpus dedup (Lee et al. 2022) — q118/q149 mine fixed-width
  * repeated spans; the suffix ranking is the general structure those
  * windows approximate.
  *
  * Algorithm: rank(off) after round t orders suffixes by their first
  * seed·2^t characters. Round 0 dense-ranks a 16-char prefix (one
  * string sort replaces the first four char-doubling rounds); each
  * doubling round forms (rank[off], rank[off+k]) pairs (−1 past the
  * document end, so shorter-is-smaller prefix semantics fall out) and
  * dense-ranks the pairs. Convergence when all ranks are distinct —
  * high-entropy text converges in ~log(longest repeat / seed) rounds,
  * far before log(maxLen).
  *
  * The dense-rank itself is the distributed device: DISTINCT pairs →
  * range-partitioned sort (`orderBy` — Spark's scalable total order)
  * → `zipWithIndex` (one pass, indexes follow the sort's partition
  * order) → hash-join the 0-based rank back. No global window, no
  * single-partition sort, no driver state: per round exactly one
  * sort + two hash shuffles over position rows, O(log) rounds,
  * lineage cut per round (`localCheckpoint`; swap for reliable
  * checkpoint on a cluster).
  *
  * Ordering parity: Spark compares strings as UTF-8 binary bytes
  * (UTF8String), identical to DuckDB's default binary collation, so
  * the round-0 character ranks — and hence every later round — are
  * engine-exact. Offsets are CODE POINTS end to end: `length`,
  * `substring`, and `split(text, "")` all operate on code points in
  * Spark (split yields exactly `length` elements for any text,
  * surrogate pairs intact), matching DuckDB's `length`/`substr`, so
  * CJK and emoji corpora rank exactly (gated by the q178 fixture).
  */
object SuffixArray {

  /** (idCol, off, suffix_rank): the dense lexicographic rank of the
    * suffix starting at 0-based `off` within document `idCol`, among
    * all suffixes of all documents. Identical suffixes (full-length
    * duplicates across documents) share a rank. */
  def suffixRanks(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    def denseRank(df: DataFrame, cols: Seq[String],
        out: String): DataFrame = {
      val distinct = df.select(cols.map(col): _*).distinct()
      val ranked = distinct.orderBy(cols.map(col): _*)
        .rdd.zipWithIndex()
        .map { case (row, idx) =>
          (row.getLong(0), row.getLong(1), idx) }
        .toDF(cols(0), cols(1), out)
      df.join(ranked, cols)
    }

    // Seed ranks over a 16-char prefix instead of single characters:
    // one string dense-rank replaces the first four doubling rounds
    // (each round costs fixed job/shuffle overhead that dominates at
    // small-k), and on high-entropy text most ranks are already
    // distinct at 16 chars so the early exit fires within a round or
    // two. A suffix shorter than the seed sorts by its full content,
    // which is exactly its final relation to any extension (prefix <
    // extension), so seeding preserves the doubling invariant.
    val seed = 16L
    // (measured: a fanOutForCompute here is value-neutral — the
    // doubling rounds are exchange/sort-bound, and the explode feeds
    // straight into an exchange anyway)
    val pos = docs
      .select(col(idCol).as("doc"), length(col(textCol)).as("len"),
        col(textCol).as("t"),
        posexplode(split(col(textCol), "")))
      .select(col("doc"), col("len").cast("long").as("len"),
        col("pos").cast("long").as("off"), col("t"))
      .filter(col("off") < col("len"))
      .select(col("doc"), col("len"), col("off"),
        expr(s"substring(t, CAST(off + 1 AS INT), ${seed.toInt})")
          .as("pfx"))
    val pfxRank = pos.select(col("pfx")).distinct()
      .orderBy(col("pfx")).rdd.zipWithIndex()
      .map { case (row, idx) => (row.getString(0), idx) }
      .toDF("pfx", "r")
    var ranks = pos.join(pfxRank, "pfx")
      .select(col("doc"), col("off"), col("len"), col("r"))
      .localCheckpoint()
    val total = ranks.count()
    var k = seed
    // seed ranks may already be total (every 16-char prefix distinct)
    var done = pfxRank.count() == total
    while (!done) {
      val right = ranks.select(col("doc").as("rdoc"),
        (col("off") - k).as("roff"), col("r").as("r2"))
      val paired = ranks
        .join(right,
          col("doc") === col("rdoc") && col("off") === col("roff"),
          "left")
        .select(col("doc"), col("off"), col("len"),
          col("r").as("p1"), coalesce(col("r2"), lit(-1L)).as("p2"))
      ranks = denseRank(paired, Seq("p1", "p2"), "nr")
        .select(col("doc"), col("off"), col("len"),
          col("nr").as("r"))
        .localCheckpoint()
      val stats = ranks.agg(max(col("r")).as("mx"),
        max(col("len")).as("ml")).head()
      done = stats.getLong(0) == total - 1 || k >= stats.getLong(1)
      k *= 2
    }
    ranks.select(col("doc").as(idCol), col("off"),
        col("r").as("suffix_rank"))
      .orderBy(col(idCol), col("off"))
  }

  /** Longest repeated substrings from the suffix ranking: the LCP of
    * ADJACENT suffix ranks — the classic suffix-array corollary (the
    * longest repeat is exactly the max adjacent-rank LCP; Lee et
    * al.'s ExactSubstr cut threshold is "adjacent LCP ≥ 50"). One
    * representative position per rank (min (doc,off) — dense-rank
    * duplicates are identical suffixes, so any representative carries
    * the same string), consecutive ranks paired by an r+1 hash join.
    *
    * The LCP compare is WINDOWED so per-pair memory stays bounded on
    * arbitrary documents (the r7 finding: materializing whole
    * suffixes and zipping two element-per-character arrays allocates
    * ~2·L element arrays per pair on L-char docs). Each round
    * extracts only a `window`-code-point slice of both suffixes at
    * the current matched offset: if the slices are EQUAL full
    * windows (one string compare, no arrays) the pair is saturated —
    * its lcp advances by the window and it goes another round with
    * the window doubled (up to a 64 Ki cap, so the in-window scan
    * arrays never exceed 64 Ki elements); otherwise the first
    * mismatch inside the window is found by zipping the slices'
    * code-point arrays (`array_position` on the comparison flags —
    * zip_with null-pads the shorter slice, so shorter-is-prefix
    * falls out as "no false flag" → min slice length) and the pair
    * is done. Saturation is rare (only pairs with LCP ≥ window), so
    * the loop re-joins the text table for a shrinking handful of
    * rows; total rounds ≤ 4 + lcp_max/64Ki. The top-k cut happens
    * BEFORE the prefix digest, so the md5 over the (possibly long)
    * matched prefix runs for k rows only.
    *
    * Output: top `k` by (lcp DESC, rank): (rank, a_doc, a_off,
    * b_doc, b_off, lcp, prefix_md5).
    */
  def longestRepeats(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20, window: Int = 4096): DataFrame = {
    val txt = docs.select(col(idCol).as("tdoc"),
      col(textCol).as("ttext"))
    val topk = adjacentLcps(docs, idCol, textCol, window)
      .orderBy(col("lcp").desc, col("r"))
      .limit(k)
    topk
      .join(txt, col("a_doc") === col("tdoc"))
      .select(col("r").as("rank"), col("a_doc"), col("a_off"),
        col("b_doc"), col("b_off"), col("lcp"),
        md5(col("ttext").substr((col("a_off") + 1).cast("int"),
          col("lcp").cast("int"))).as("prefix_md5"))
      .orderBy(col("lcp").desc, col("rank"))
  }

  /** All adjacent-rank LCPs from the suffix ranking — the full LCP
    * array of the generalized suffix array (one row per rank r <
    * maxRank: the LCP of ranks r and r+1, with one representative
    * position per side). [[longestRepeats]] is its top-k; the
    * cross-corpus shared-substring audit consumes it whole, because
    * the LCP of ANY two suffixes is the MIN of the adjacent LCPs
    * between their ranks (the classic range-min identity). Same
    * windowed compare loop as documented on [[longestRepeats]].
    *
    * Output: (r, a_doc, a_off, b_doc, b_off, lcp) where (a_*) sits
    * at rank r and (b_*) at rank r+1. */
  def adjacentLcps(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4096): DataFrame =
    adjacentLcpsFromRanks(docs, idCol, textCol,
      suffixRanks(docs, idCol, textCol), window)

  /** [[adjacentLcps]] over a precomputed [[suffixRanks]] frame, so a
    * caller that also needs the ranking (the cross-corpus audit)
    * pays the prefix-doubling once. */
  def adjacentLcpsFromRanks(docs: DataFrame, idCol: String,
      textCol: String, ranks: DataFrame,
      window: Int = 4096): DataFrame = {
    require(window >= 2, s"window must be >= 2 ($window)")
    val reps = ranks
      .groupBy(col("suffix_rank").as("r"))
      .agg(min(struct(col(idCol), col("off"))).as("p"))
      .select(col("r"), col(s"p.$idCol").as("pdoc"),
        col("p.off").as("poff"))
    val txt = docs.select(col(idCol).as("tdoc"),
      col(textCol).as("ttext"))
    val a = reps.select(col("r"), col("pdoc").as("a_doc"),
      col("poff").as("a_off"))
    val b = reps.select((col("r") - 1).as("rb"),
      col("pdoc").as("b_doc"), col("poff").as("b_off"))
    var open = a.join(b, col("r") === col("rb"))
      .select(col("r"), col("a_doc"), col("a_off"),
        col("b_doc"), col("b_off"), lit(0L).as("lcp"))
      .localCheckpoint()
    val done = scala.collection.mutable.ArrayBuffer[DataFrame]()
    done += open.limit(0)
    var win = window
    while (!open.isEmpty) {
      val w = lit(win)
      val sliced = open
        .join(txt, col("a_doc") === col("tdoc"))
        .withColumn("wa", col("ttext")
          .substr((col("a_off") + col("lcp") + 1).cast("int"), w))
        .drop("tdoc", "ttext")
        .join(txt, col("b_doc") === col("tdoc"))
        .withColumn("wb", col("ttext")
          .substr((col("b_off") + col("lcp") + 1).cast("int"), w))
        .drop("tdoc", "ttext")
      // In-window compare via the zero-allocation codegen kernel
      // [[graft.functions.CommonPrefixChars]]: inc = matched code
      // points of the two slices — identical to the old
      // zip_with(split)/array_position form (mismatch stops the walk;
      // a shorter slice stops at its own length), which allocated
      // ~2·window single-char strings PER PAIR just to locate the
      // first mismatch (the r14 profile's dominant term here).
      // Saturation (lcp ≥ window) ⇔ inc == window: a full-window
      // match forces both slices to be exactly window chars.
      val stepped = sliced
        .withColumn("inc", graft.functions.CommonPrefixChars.of(
          col("wa"), col("wb")))
        .withColumn("sat", col("inc") === lit(win.toLong))
        .select(col("r"), col("a_doc"), col("a_off"), col("b_doc"),
          col("b_off"), (col("lcp") + col("inc")).as("lcp"),
          col("sat"))
        .localCheckpoint()
      done += stepped.filter(!col("sat")).drop("sat")
      open = stepped.filter(col("sat")).drop("sat")
      win = math.min(win * 2, 1 << 16)
    }
    done.reduce(_ unionByName _)
  }

  /** Cross-corpus exact-substring contamination audit (the TRUE
    * ExactSubstr metric, Lee et al. 2022 / Carlini et al.
    * memorization audits): for every document labeled `evalLabel`,
    * the length of the LONGEST substring it shares with ANY
    * differently-labeled (train) document, and the offset where it
    * occurs. q94/q138's n-gram and q220's embedding decontamination
    * approximate this; the suffix array computes it exactly —
    * an eval doc with a 200-char shared span IS contaminated no
    * matter how its 13-grams hash.
    *
    * Device: generalized suffix array over both corpora, full LCP
    * array ([[adjacentLcps]]), then the range-min identity — the
    * longest train-shared prefix of an eval suffix is the min of
    * adjacent LCPs to the NEAREST train-bearing rank (above or
    * below), maximized over the two directions; identical suffixes
    * (train suffix at the SAME rank) share their full length. The
    * nearest-train scans are cumulative-count groups + frame-bounded
    * running mins over the rank-ordered LCP table.
    *
    * Input contract: run over the audit slice (the eval set + its
    * candidate train corpus) — the rank-ordered scan windows are
    * global-ordered over the slice's suffix table, the same contract
    * as [[longestRepeats]]; shard a larger audit by eval partition.
    *
    * Output: one row per eval doc: (idCol, longest_shared, at_off) —
    * longest_shared = 0 when nothing is shared. */
  def crossCorpusShared(docs: DataFrame, idCol: String,
      textCol: String, labelCol: String, evalLabel: String,
      window: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranks = suffixRanks(docs, idCol, textCol).localCheckpoint()
    val labeled = ranks.join(
      docs.select(col(idCol), col(labelCol).as("__lbl"),
        length(col(textCol)).cast("long").as("__len")), Seq(idCol))
    val flags = labeled.groupBy(col("suffix_rank").as("r"))
      .agg(max(when(col("__lbl") =!= evalLabel, 1L).otherwise(0L))
          .as("has_train"))
    val lcps = adjacentLcpsFromRanks(docs, idCol, textCol, ranks, window)
      .select(col("r"), col("lcp"))
    val wOrd = Window.orderBy(col("r"))
    val rankTable = flags.join(lcps, Seq("r"), "left")
      .withColumn("lcp_prev", lag(col("lcp"), 1).over(wOrd))
      .withColumn("grp_prev", sum(col("has_train")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("grp_next", sum(col("has_train")).over(
        Window.orderBy(col("r").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val shared = rankTable
      .withColumn("shared_prev", when(col("grp_prev") > 0,
        min(col("lcp")).over(Window.partitionBy(col("grp_prev"))
          .orderBy(col("r"))
          .rowsBetween(Window.unboundedPreceding, -1))))
      .withColumn("shared_next", when(col("grp_next") > 0,
        min(col("lcp_prev")).over(Window.partitionBy(col("grp_next"))
          .orderBy(col("r").desc)
          .rowsBetween(Window.unboundedPreceding, -1))))
      .select(col("r"), col("has_train"),
        coalesce(col("shared_prev"), lit(0L)).as("sp"),
        coalesce(col("shared_next"), lit(0L)).as("sn"))
    val evalSuffixes = labeled.filter(col("__lbl") === evalLabel)
      .select(col(idCol), col("off"), col("__len"),
        col("suffix_rank").as("r"))
    evalSuffixes.join(shared, Seq("r"))
      .withColumn("__shared", when(col("has_train") === 1L,
          col("__len") - col("off"))
        .otherwise(greatest(col("sp"), col("sn"))))
      .groupBy(col(idCol))
      .agg(max(struct(col("__shared").as("s"), (-col("off")).as("no")))
        .as("m"))
      .select(col(idCol), col("m.s").as("longest_shared"),
        (-col("m.no")).as("at_off"))
  }
}
