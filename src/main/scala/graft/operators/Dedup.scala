package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline (builder
  * brief: exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
  * near-dup; reference analog: idempotent-upsert dedup D2,
  * `parquet_service.py:66-89`).
  *
  * Scale design: every operator keys its shuffle on content hashes or
  * shingles (never collects to the driver), applies a document-frequency
  * cap to hot shingles (skew guard), and produces candidate pairs via
  * hash-bucket joins rather than cross products — the standard
  * inverted-index / LSH shapes that survive 100 TB.
  */
object Dedup {

  /** Corpus-level duplicated word-span detection (the C4 §2.2 "three-
    * sentence span" dedup shape generalized to word n-grams, as used
    * by MassiveText/RefinedWeb line-and-span dedup): every length-`n`
    * sliding word window becomes a (doc, pos, span) row; spans seen
    * more than once across the corpus are reported with their global
    * count, distinct-document count, and earliest (doc, pos)
    * occurrence — the attribution a remove-all-but-first rewrite
    * keys on.
    *
    * Shape: one explode (n× amplification of the token stream), one
    * aggregation shuffle on the span text and one window shuffle on
    * the same key — no self-join, no cartesian. At 100 TB the group
    * key should be a fixed-width digest of the span rather than the
    * span string (swap `col("span")` for `md5(col("span"))`) so the
    * exchange moves 16-byte keys; the span text here doubles as the
    * human-readable audit output at test scale. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val spans = df
      .select(col(idCol), posexplode(wordShinglesFast(col(textCol), n)))
      .select(col(idCol).as("doc"), col("pos"), col("col").as("span"))
    val counts = spans.groupBy(col("span"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc")).as("n_docs"))
      .filter(col("n_occurrences") > 1)
    val firsts = spans
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("span"))
          .orderBy(col("doc"), col("pos"))))
      .filter(col("rn") === 1)
      .select(col("span").as("s2"), col("doc").as("first_doc"),
        col("pos").as("first_pos"))
    counts.join(firsts, col("span") === col("s2"))
      .select(col("span"), col("n_occurrences"), col("n_docs"),
        col("first_doc"), col("first_pos"))
  }

  /** Corpus-wide duplicated-span REMOVAL with document reassembly —
    * the rewrite half of C4 §2.2 ("we discarded all but one of any
    * three-sentence span occurring more than once in the data set"),
    * where [[duplicateSpans]] is only the report. Sentence spans
    * become non-overlapping `n`-token blocks (the corpus has no
    * sentence structure); a block survives iff it is the FIRST
    * occurrence of its text in corpus (doc, position) order; each
    * document is rebuilt from its surviving blocks in order.
    *
    * Shape: one explode into the block stream, one window over the
    * block-text key for first-occurrence (hash-partitioned on block
    * text — duplicated-block skew is bounded because only the rank-1
    * row survives per partition group and WindowGroupLimit prunes the
    * rest before the sort spills), one grouped reassembly keyed on
    * the document. No self-join, nothing quadratic, no driver state.
    *
    * Output: (idCol, n_blocks, n_kept, clean_text), one row per input
    * document (documents whose every block was dropped keep an empty
    * clean_text). */
  def dropDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toksed = df.select(col(idCol).as("doc"),
      split(col(textCol), " ").as("toks"))
    // block i = tokens [i·n, i·n+n); the lambda only references the
    // materialized toks attribute, so interpreted re-evaluation per
    // element re-reads a column, never re-splits the text (trap 3)
    val blocks = toksed.select(col("doc"),
      transform(
        sequence(lit(0), ceil(size(col("toks")).cast("double") /
          n).cast("long") - 1),
        i => array_join(slice(col("toks"), (i * n + 1).cast("int"),
          lit(n)), " ")).as("blocks"))
    val stream = blocks
      .select(col("doc"), posexplode(col("blocks")).as(Seq("blk", "btext")))
    val kept = stream
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("btext"))
          .orderBy(col("doc"), col("blk"))))
      .filter(col("rn") === 1)
    val rebuilt = kept
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("blk"),
            col("btext")))), s => s.getField("btext")), " ")
          .as("clean_text"))
    blocks.select(col("doc").as(idCol),
        size(col("blocks")).cast("long").as("n_blocks"))
      .join(rebuilt, col(idCol) === col("doc"), "left")
      .select(col(idCol), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus-wide exact PARAGRAPH dedup — the RefinedWeb §3.3 /
    * MassiveText line-level removal step (reference analog: the
    * boilerplate paragraphs the chunk pipeline re-ingests from every
    * page, `markdown_utils.py` front-matter/nav repetition): documents
    * are split on `sep` into paragraphs, a paragraph seen anywhere
    * earlier in the corpus (first occurrence keyed by (doc, position))
    * is dropped, and each document is rebuilt from its surviving
    * paragraphs joined with `sep`. Whitespace-only paragraphs are not
    * content — they are excluded from keying AND from the rebuild, so
    * the rebuilt text has normalized separators by construction.
    *
    * Shape: one split+posexplode, ONE exchange on the paragraph text
    * (the first-occurrence window), one per-doc aggregation, and a
    * left join back to the doc spine for zero-survivor docs — no
    * self-join. At 100 TB, key the window on `md5(paragraph)` so the
    * exchange moves fixed-width digests (same swap documented on
    * [[duplicateSpans]]); hot boilerplate paragraphs are exactly the
    * heavy keys the min-window tolerates (a window over a hot key is
    * a single partition's sort, bounded by that paragraph's global
    * occurrence count — cap with a pre-aggregated df filter if one
    * paragraph dominates a corpus).
    *
    * Output: (id, n_paras, n_kept, clean_text) — `n_paras` counts the
    * doc's non-blank paragraphs, `clean_text` is "" when every
    * paragraph was seen earlier. */
  def dropDuplicateParagraphs(df: DataFrame, idCol: String,
      textCol: String, sep: String = "\n"): DataFrame = {
    val paras = df
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), java.util.regex.Pattern
          .quote(sep))).as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
    val kept = paras
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("para"))
          .orderBy(col("doc"), col("pos"))))
      .filter(col("rn") === 1)
    val rebuilt = kept
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"),
            col("para")))), s => s.getField("para")), sep)
          .as("clean_text"))
    // the spine is the INPUT frame — a doc whose every paragraph is
    // blank still reports (id, 0, 0, "") instead of vanishing (the
    // dropDuplicateSpans one-row-per-input-doc contract)
    val counts = paras.groupBy(col("doc").as("_pd_doc"))
      .agg(count(lit(1)).as("n_paras"))
    df.select(col(idCol))
      .join(counts, col(idCol) === col("_pd_doc"), "left")
      .join(rebuilt, col(idCol) === col("doc"), "left")
      .select(col(idCol),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Boilerplate-line removal (the CCNet §4.1 / RefinedWeb line-wise
    * filtering idea, frequency direction): a line whose normalized
    * identity (`lower(trim(line))`) occurs in MORE THAN `maxDocFreq`
    * DISTINCT documents is template chrome — navigation, cookie
    * banners, footers — and every occurrence of it is dropped
    * corpus-wide; documents are rebuilt from the survivors. Distinct
    * from [[dropDuplicateParagraphs]] (keep-FIRST exact dedup): here
    * nothing of a boilerplate line survives anywhere, while a line
    * shared by ≤ `maxDocFreq` docs survives everywhere (legitimate
    * quotation, not chrome). Intra-doc repeats alone never trigger
    * removal — the frequency is per distinct document.
    *
    * Shape: one split+posexplode; doc-frequency is a two-level
    * aggregate keyed on `md5(identity)` so only fixed-width digests
    * (never line text) cross its exchanges; ONLY identities over the
    * threshold — the boilerplate set, corpus-bounded at
    * n_distinct_lines/`maxDocFreq` and in practice tiny — flow into
    * the removal side of a left-anti join against the line stream.
    * The per-doc rebuild reuses the doc-local sort_array fold of
    * [[dropDuplicateParagraphs]]. No self-join anywhere; at 100 TB
    * the anti-join's build side is the small boilerplate digest set
    * (AQE broadcasts it), so the line stream is never shuffled on
    * line content at all.
    *
    * Output: (id, n_lines, n_kept, clean_text) — counts over
    * non-blank lines; blank lines are separators, not content, and
    * are excluded from keying and rebuild exactly as in
    * [[dropDuplicateParagraphs]]. */
  def dropBoilerplateLines(df: DataFrame, idCol: String,
      textCol: String, maxDocFreq: Int): DataFrame = {
    val lines = df
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .filter(length(trim(col("line"))) > 0)
      .withColumn("_bl_h", md5(lower(trim(col("line")))))
    val boiler = lines
      .groupBy(col("_bl_h"))
      .agg(countDistinct(col("doc")).as("df"))
      .filter(col("df") > maxDocFreq)
      .select(col("_bl_h"))
    val kept = lines.join(boiler, Seq("_bl_h"), "left_anti")
    val rebuilt = kept
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"),
            col("line")))), s => s.getField("line")), "\n")
          .as("clean_text"))
    val counts = lines.groupBy(col("doc").as("_bl_doc"))
      .agg(count(lit(1)).as("n_lines"))
    df.select(col(idCol))
      .join(counts, col(idCol) === col("_bl_doc"), "left")
      .join(rebuilt, col(idCol) === col("doc"), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Train-side decontamination with a BLOOM-FILTER prefilter — the
    * 100 TB shape of [[crossContamination]]'s exact n-gram screen
    * (GPT-3 appx C / PaLM §6.3, removal direction: drop TRAIN docs
    * that share any word n-gram with the TEST set).
    *
    * Why this shape at scale: the exact formulation shuffles the
    * ENTIRE train-side n-gram stream into a semi-join — at 100 TB
    * that exchange dwarfs everything else. Here the (small) test
    * side's distinct n-grams are folded into a Bloom filter ONCE,
    * the filter ships to every train partition as a literal, and the
    * train stream is screened map-side by a codegen'd
    * `BloomFilterMightContain` probe (no UDF: the bloom is built
    * over `xxhash64(span)` longs via `putLong`, probed with the same
    * `xxhash64` expression, so build and probe hash identically).
    * Only bloom-positives — true hits plus an `fpp` sliver of clean
    * grams — reach the exact verify semi-join, shrinking the
    * exchange from O(train n-grams) to O(hits + fpp·train n-grams).
    *
    * Correctness: a Bloom filter has NO false negatives, so the
    * prefilter+exact-verify output is VALUE-IDENTICAL to the exact
    * screen — the oracle replays the exact SQL (q138). Output:
    * (id, is_contaminated) over every train doc. */
  def bloomDecontaminate(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => bcol, expression => bexpr}
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    def spans(df: DataFrame) = df.select(col(idCol).as("doc"),
      explode(array_distinct(wordShinglesFast(col(textCol), n)))
        .as("span"))
    val testSpans = spans(test).select(col("span")).distinct()
    // One pass over the small side sizes the bloom; a second builds
    // it (driver-held, size O(expected·ln(1/fpp)) bits — MBs for
    // millions of test n-grams, independent of train size).
    val hashed = testSpans.select(xxhash64(col("span")).as("h"))
    val expected = math.max(hashed.count(), 1L)
    val bloom = hashed.stat.bloomFilter("h", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val mightContain = bcol(BloomFilterMightContain(
      bexpr(lit(bos.toByteArray)),
      bexpr(xxhash64(col("span")))))
    val contaminated = spans(train)
      .filter(mightContain)                      // map-side screen
      .join(testSpans, Seq("span"), "left_semi") // exact verify
      .select(col("doc")).distinct()
    train.select(col(idCol))
      .join(contaminated, col(idCol) === col("doc"), "left")
      .select(col(idCol), col("doc").isNotNull.as("is_contaminated"))
  }

  /** WINNOWED fingerprint mining (Schleimer et al. 2003 — the MOSS
    * algorithm): the implemented scale path for [[repeatedCharSpans]]'
    * documented "fingerprint before shuffle" swap. Instead of
    * shuffling EVERY stride-1 char window, each document selects the
    * argmin-hash window from every `winnow`-length run of
    * consecutive window starts — computed entirely INSIDE the row by
    * [[winnowSelectUdf]] (rolling minimum over packed (40-bit
    * md5-prefix hash, 20-bit position) keys, O(len) per doc, no
    * exchange of the window stream at all) — and only the
    * ~2/(winnow+1) selected fingerprints shuffle for the corpus-wide
    * repeat count.
    *
    * The winnowing guarantee (paper §3): any substring shared
    * between two documents of length ≥ `window + winnow − 1` shares
    * at least one SELECTED fingerprint — so recall on long shared
    * spans is preserved while the exchange shrinks ~winnow-fold
    * (spec-pinned: guarantee + density). Trailing partial runs also
    * select (deterministic slight over-selection; same rule on both
    * engines). Packed-key contract: document positions must fit 20
    * bits — pre-chunk documents above 1 MiB (the reference's chunking
    * does this anyway).
    *
    * Output: the selected fingerprints that repeat corpus-wide —
    * (id, pos, fp_md5, n_occ). */
  /** Per-document winnowing selection as ONE in-row pass (the
    * wordShingles UDF precedent — this is what makes the operator
    * genuinely map-side): rolling packed-key minimum over the
    * stride-1 window hashes via a monotonic deque, O(len) time,
    * O(winnow) working memory, emitting the distinct selected
    * positions. The packed key is (40-bit md5-prefix, 20-bit pos) —
    * IDENTICAL to the oracle's SQL construction, hex-for-hex (JVM
    * MessageDigest md5 == Spark md5() == DuckDB md5). Documents with
    * positions beyond the 20-bit packing fail FAST (corrupting the
    * key silently would mis-position fingerprints) — pre-chunk
    * anything above ~1 MiB, as the reference's chunker already does. */
  private val winnowSelectUdf = udf {
    (text: String, window: Int, winnow: Int) =>
      if (text == null || text.length < window) Array.empty[Long]
      else {
        require(text.length - window < 1048576,
          s"winnowing packed key overflows at ${text.length} chars: " +
            "pre-chunk documents above 1 MiB")
        val md = java.security.MessageDigest.getInstance("MD5")
        val n = text.length - window + 1
        def key(p: Int): Long = {
          md.reset()
          val d = md.digest(
            text.substring(p, p + window).getBytes("UTF-8"))
          // first 10 hex chars = first 5 bytes = 40 bits
          val h = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
            ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) |
            (d(4) & 0xffL)
          h * 1048576L + p
        }
        val keys = Array.tabulate(n)(key)
        // selected = { min(keys[i .. min(i+winnow-1, n-1)]) : ∀ i } —
        // full forward windows via a monotonic deque, plus the
        // trailing clipped windows as suffix minima (matches the
        // oracle's ROWS BETWEEN CURRENT ROW AND winnow-1 FOLLOWING
        // frame exactly, clipped frames included)
        val out = scala.collection.mutable.LinkedHashSet.empty[Long]
        if (n >= winnow) {
          val deque = new java.util.ArrayDeque[Int]()
          var j = 0
          while (j < n) {
            while (!deque.isEmpty && keys(deque.peekLast()) >= keys(j))
              deque.pollLast()
            deque.addLast(j)
            if (deque.peekFirst() <= j - winnow) deque.pollFirst()
            if (j >= winnow - 1) out += keys(deque.peekFirst())
            j += 1
          }
        }
        var m = Long.MaxValue
        var i = n - 1
        val lo = math.max(n - winnow + 1, 0)
        while (i >= lo) {
          m = math.min(m, keys(i)); out += m; i -= 1
        }
        out.toArray.map(_ % 1048576L)
      }
  }

  def winnowedFingerprints(df: DataFrame, idCol: String,
      textCol: String, window: Int = 48, winnow: Int = 8): DataFrame = {
    val docs = df.select(col(idCol), col(textCol))
      .filter(length(col(textCol)) >= window)
    val fps = docs
      .select(col(idCol), col(textCol),
        explode(winnowSelectUdf(col(textCol), lit(window),
          lit(winnow))).as("pos"))
      .select(col(idCol), col("pos"),
        col(textCol).substr((col("pos") + 1).cast("int"),
          lit(window)).as("fp"))
    fps
      .withColumn("n_occ",
        count(lit(1)).over(Window.partitionBy(col("fp"))))
      .filter(col("n_occ") > 1)
      .select(col(idCol), col("pos"), md5(col("fp")).as("fp_md5"),
        col("n_occ"))
  }

  /** Corpus snapshot DIFF — the change-data-capture report between
    * two crawls/exports of the same collection (reference analog: the
    * staging-dir re-scan deciding what to re-ingest,
    * `parquet_service.py:66-89` idempotent upsert): per document key,
    * whether it was `added`, `removed`, `changed` (same key,
    * different content md5), or `unchanged`. The summary a scheduled
    * ingest publishes, and the input to an incremental index update
    * (only added/changed rows re-embed and re-index — the 100 TB
    * point: the delta is what's paid for, not the corpus).
    *
    * Shape: one full outer hash join on the doc key comparing content
    * digests — no text comparison (md5s travel through the exchange,
    * not documents). */
  def snapshotDiff(before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // presence is keyed on the KEY, not the digest — a NULL text is
    // a present row with a null digest, and the null-safe digest
    // compare classifies it, matching the oracle's ka/kb semantics
    val a = before.select(col(idCol).as("k"),
      md5(col(textCol)).as("h_before"), lit(true).as("in_before"))
    val b = after.select(col(idCol).as("k"),
      md5(col(textCol)).as("h_after"), lit(true).as("in_after"))
    a.join(b, Seq("k"), "full_outer")
      .select(col("k").as(idCol),
        when(col("in_before").isNull, "added")
          .when(col("in_after").isNull, "removed")
          .when(col("h_before") <=> col("h_after"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Fuzzy string matching / entity resolution (the Gravano et al.
    * 2001 q-gram device): all DISTINCT-value pairs within Levenshtein
    * distance `maxDist`, found by a q-gram inverted index instead of
    * an all-pairs scan. Recall argument: `d` edits destroy at most
    * `d·q` q-grams, so two strings within distance d whose longer
    * side has length > d·q + q − 1 MUST share a q-gram — the gram
    * equi-join finds them.
    *
    * Names OUTSIDE the guarantee go to a residual path: (a) names
    * shorter than the (d+1)·q floor (a short pair need not share any
    * gram), and (b) names whose EVERY gram was discarded by the
    * `maxDf` stop-gram cap (their pairs would otherwise be silently
    * missed — the cap must not void the documented recall). Residual
    * names pair against the whole universe through a LENGTH-key
    * equi-join: the `|len_a − len_b| ≤ maxDist` necessary condition
    * becomes the join key (each residual probes its 2·maxDist+1
    * admissible lengths), so the plan stays hash-join shaped — no
    * CartesianProduct node anywhere (PlanSpec-pinned), and the
    * residual side is pathological-case small by construction.
    * Remaining documented precondition: a pair whose sides BOTH keep
    * surviving grams but share only stop-grams stays outside the
    * guarantee (the classic q-gram/stop-gram trade).
    *
    * Scale: the name universe is `distinct()` first (entity
    * resolution is over values, not rows); candidates come from hash
    * equi-joins (gram key / length key); the ≤-`maxDist` length
    * filter runs before the DP; `levenshtein` is the exact verify.
    * Never a cartesian over the full universe.
    *
    * Output: (name_a, name_b, dist), name_a < name_b, one row per
    * matched pair. */
  def fuzzyMatches(df: DataFrame, nameCol: String, maxDist: Int = 2,
      q: Int = 3, maxDf: Int = AutoDf): DataFrame = {
    val pre = fuzzyPrefix(df, nameCol, maxDist, q, maxDf)
    import pre.{keptGrams, namesL, residual}
    val viaGrams = keptGrams.select(col("name").as("name_a"), col("g"))
      .join(keptGrams.select(col("name").as("name_b"), col("g")), "g")
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"))
    val resExp = residual.select(col("name").as("name_r"),
      explode(sequence(col("_l") - maxDist, col("_l") + maxDist))
        .as("_l"))
    val viaResidual = resExp
      .join(namesL.select(col("name").as("name_o"), col("_l")), "_l")
      .filter(col("name_r") =!= col("name_o"))
      .select(least(col("name_r"), col("name_o")).as("name_a"),
        greatest(col("name_r"), col("name_o")).as("name_b"))
    viaGrams.union(viaResidual).distinct()
      .filter(abs(length(col("name_a")) - length(col("name_b")))
        <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }

  /** q-gram explosion of a `name` frame (passthrough columns ride
    * along): one row per (input row, DISTINCT gram) — the shared
    * candidate-index builder under [[fuzzyMatches]] / [[fuzzyJoin]]. */
  private def nameGrams(names: DataFrame, q: Int): DataFrame =
    names.withColumn("g", explode(array_distinct(
      transform(sequence(lit(1), greatest(length(col("name")) -
        (q - 1), lit(1))),
        i => col("name").substr(i, lit(q))))))

  /** Sentinel `maxDf` value: size the stop-gram cap from the DATA —
    * max(1000, the 95th percentile of each name's RAREST-gram df).
    * The r11 review proved any ABSOLUTE cap degenerates over a
    * fixed vocabulary: per-gram df grows ∝ corpus, so a constant
    * cap eventually drops every gram and the residual path silently
    * re-blocks on the ~|length-range|-value length key — the
    * quadratic hazard the gram device exists to avoid. A name stays
    * on the gram path iff its RAREST gram survives the cap, so the
    * per-name min-df quantile is the exact liveness requirement:
    * ≥95% of names keep a gram at ANY scale (DedupSpec pins 1× vs
    * 10× liveness and above-floor scaling), while every gram more
    * common than that is dropped — crucial, because a kept gram
    * costs up to df² candidate pairs, and a naive n-scaled cap
    * (1% of names) was measured 24× SLOWER at sf1 on q239 than the
    * old fixed cap precisely because it kept mid-frequency grams
    * the liveness contract never needed. The 1000 floor preserves
    * the historical small-corpus behavior exactly. Corpora whose
    * min-df distribution is heavy-tailed (a few names with ONLY
    * ultra-common grams) inflate the quantile; give those an
    * explicit `maxDf` measured on the data. */
  val AutoDf: Int = 0

  /** Gram index with its per-gram df attached — ONE window, shared
    * by the [[AutoDf]] sizing quantile and the kept-gram filter.
    * Under AutoDf the windowed frame is CHECKPOINTED: the sizing
    * pass is an eager action and the kept-gram filter a second
    * consumer, so without the barrier the explode + df exchange
    * (the hottest shuffle of every fuzzy call) would run twice
    * (r12 review). The frame is name-UNIVERSE-sized (~L grams per
    * distinct name), never corpus-sized. An explicit cap keeps the
    * historical single-lazy-window shape (no sizing action exists
    * to share with). */
  private def gramsWithDf(names: DataFrame, q: Int,
      auto: Boolean): DataFrame = {
    val w = nameGrams(names, q).withColumn("_df",
      count(lit(1)).over(Window.partitionBy(col("g"))))
    if (auto) w.localCheckpoint() else w
  }

  /** Resolve a caller `maxDf` (explicit > 0, or [[AutoDf]]) against
    * a [[gramsWithDf]] frame: the q95 of per-`keyCols` min gram df,
    * floored at 1000. One aggregate over the (checkpointed) gram
    * frame + a cumulative window over the DISTINCT min-df table
    * (value-bounded, the ksTwoSample device); two scalar driver
    * reads. */
  private[operators] def resolveDfCap(maxDf: Int, gramsW: DataFrame,
      keyCols: Seq[String]): Int =
    if (maxDf > 0) maxDf
    else {
      val minDf = gramsW
        .groupBy(keyCols.map(col): _*)
        .agg(min(col("_df")).as("_m"))
      val dm = minDf.groupBy(col("_m"))
        .agg(count(lit(1)).as("_c"))
        .localCheckpoint()
      val nRow = dm.agg(sum(col("_c")).as("_n")).head
      if (nRow.isNullAt(0)) 1000
      else {
        val k = math.ceil(0.95 * nRow.getLong(0)).toLong
        val wc = Window.orderBy(col("_m"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val cap = dm
          .select(col("_m"), sum(col("_c")).over(wc).as("_cum"))
          .filter(col("_cum") >= k)
          .agg(min(col("_m"))).head.getLong(0)
        math.min(Int.MaxValue.toLong, math.max(1000L, cap)).toInt
      }
    }

  /** The candidate-pipeline prefix SHARED by [[fuzzyMatches]] and
    * [[fuzzyBlockingStats]] — distinct universe (checkpointed: it
    * feeds the gram index, the length table, and the AutoDf count),
    * resolved cap, df-capped gram index, length table, residual
    * set. One definition, so the production diagnostic measures
    * exactly the pipeline the matcher runs (r12 review: two
    * hand-synced copies would let them drift — the failure the
    * diagnostic exists to catch). */
  private case class FuzzyPrefix(names: DataFrame, cap: Int,
      keptGrams: DataFrame, namesL: DataFrame, residual: DataFrame)

  private def fuzzyPrefix(df: DataFrame, nameCol: String,
      maxDist: Int, q: Int, maxDf: Int): FuzzyPrefix = {
    val names = df.select(col(nameCol).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct().localCheckpoint()
    val gramsW = gramsWithDf(names, q, auto = maxDf <= 0)
    val cap = resolveDfCap(maxDf, gramsW, Seq("name"))
    val shortCap = (maxDist + 1) * q // guarantee floor on max length
    val keptGrams = gramsW.filter(col("_df") <= cap).drop("_df")
    val namesL = names.withColumn("_l", length(col("name")))
    FuzzyPrefix(names, cap, keptGrams, namesL,
      residualNames(namesL, keptGrams, Seq("name"), shortCap))
  }

  /** Blocking-liveness diagnostic for the fuzzy devices: one row —
    * (n_names, df_cap, n_residual, residual_share) — over the same
    * distinct-name universe, gram index, and stop-gram cap
    * [[fuzzyMatches]] uses (literally [[fuzzyPrefix]]). A
    * residual_share creeping toward 1 means the cap is degenerating
    * the gram index into length-key blocking (the scale hazard);
    * with [[AutoDf]] it stays pinned near the short-name floor at
    * any corpus size. */
  def fuzzyBlockingStats(df: DataFrame, nameCol: String,
      maxDist: Int = 2, q: Int = 3, maxDf: Int = AutoDf): DataFrame = {
    val pre = fuzzyPrefix(df, nameCol, maxDist, q, maxDf)
    pre.names.agg(count(lit(1)).as("n_names"))
      .crossJoin(pre.residual.agg(count(lit(1)).as("n_residual")))
      .select(col("n_names"), lit(pre.cap).as("df_cap"),
        col("n_residual"),
        (col("n_residual").cast("double") / col("n_names"))
          .as("residual_share"))
  }

  /** The residual name set (rows of `namesL`, which carries `_l`):
    * names below the (d+1)·q guarantee floor ∪ names whose EVERY
    * gram was df-dropped — the recall patch both fuzzy devices
    * route through the length-key equi-join. `keyCols` identifies a
    * name row (name alone, or name+side for the bipartite form). */
  private def residualNames(namesL: DataFrame, keptGrams: DataFrame,
      keyCols: Seq[String], shortCap: Int): DataFrame = {
    val noGram = namesL.join(
      keptGrams.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")
    namesL.filter(col("_l") < shortCap)
      .unionByName(noGram.filter(col("_l") >= shortCap))
  }

  /** BIPARTITE [[fuzzyMatches]] — probe-vs-catalog fuzzy join: every
    * (left, right) pair within Levenshtein `maxDist`, via the same
    * Gravano q-gram candidate device (shared-gram equi-join under a
    * joint `maxDf` stop-gram cap) plus the same two-sided residual
    * discipline (short names and every-gram-dropped names probe the
    * OTHER side through the length-key equi-join). Candidates are
    * name-level (both sides `distinct()` first); ids join back at
    * the end, so repeated names fan out exactly. Per-gram join
    * output is bounded by the df cap (≤ maxDf² per gram) and, for
    * open name spaces, the gram-key cardinality scales with the
    * data — never a fixed block count, never a cartesian.
    *
    * SIZING (r11 review → r12 fix): over a FIXED vocabulary the
    * gram TYPE count plateaus while per-gram df grows with scale;
    * once df exceeds an ABSOLUTE `maxDf` for every gram, all names
    * fall to the residual path, which equi-joins on the LENGTH
    * key — a fixed ~|length-range| block count, i.e. the quadratic
    * hazard this device exists to avoid. The default is therefore
    * [[AutoDf]]: the cap is the q95 of per-name RAREST-gram df
    * (floored at 1000) — the exact liveness requirement, keeping
    * ≥95% of names on the gram path with the CHEAPEST grams that
    * suffice at every scale (DedupSpec pins 1× vs 10× liveness and
    * above-floor scaling; [[fuzzyBlockingStats]] is the production
    * diagnostic). Pass an explicit `maxDf > 0` only for corpora
    * whose df distribution you've measured.
    *
    * Output: (lid, rid, dist) — one row per (left-id, right-id)
    * pair whose names match within maxDist (including dist 0). */
  def fuzzyJoin(left: DataFrame, leftIdCol: String,
      leftNameCol: String, right: DataFrame, rightIdCol: String,
      rightNameCol: String, maxDist: Int = 2, q: Int = 3,
      maxDf: Int = AutoDf): DataFrame = {
    val l = left.select(col(leftIdCol).as("lid"),
      col(leftNameCol).cast("string").as("name_l"))
      .filter(col("name_l").isNotNull)
    val r = right.select(col(rightIdCol).as("rid"),
      col(rightNameCol).cast("string").as("name_r"))
      .filter(col("name_r").isNotNull)
    val ln = l.select(col("name_l").as("name")).distinct()
      .withColumn("side", lit(0))
    val rn = r.select(col("name_r").as("name")).distinct()
      .withColumn("side", lit(1))
    // both-side universe materialized once: gram index + length
    // table + (under AutoDf) the sizing aggregates all read it
    val names = ln.unionByName(rn).localCheckpoint()
    val gramsW = gramsWithDf(names, q, auto = maxDf <= 0)
    val cap = resolveDfCap(maxDf, gramsW, Seq("name", "side"))
    val shortCap = (maxDist + 1) * q
    val keptGrams = gramsW.filter(col("_df") <= cap).drop("_df")
    val viaGrams = keptGrams.filter(col("side") === 0)
      .select(col("name").as("name_l"), col("g"))
      .join(keptGrams.filter(col("side") === 1)
        .select(col("name").as("name_r"), col("g")), "g")
      .select(col("name_l"), col("name_r"))
    val namesL = names.withColumn("_l", length(col("name")))
    val residual = residualNames(namesL, keptGrams,
      Seq("name", "side"), shortCap)
    val resExp = residual.select(col("name").as("name_x"),
      col("side"),
      explode(sequence(col("_l") - maxDist, col("_l") + maxDist))
        .as("_l"))
    // each residual name probes the OTHER side's length buckets
    val viaResidual = resExp.filter(col("side") === 0)
      .join(namesL.filter(col("side") === 1)
        .select(col("name").as("name_r"), col("_l")), "_l")
      .select(col("name_x").as("name_l"), col("name_r"))
      .unionByName(resExp.filter(col("side") === 1)
        .join(namesL.filter(col("side") === 0)
          .select(col("name").as("name_l"), col("_l")), "_l")
        .select(col("name_l"), col("name_x").as("name_r")))
    val verified = viaGrams.union(viaResidual).distinct()
      .filter(abs(length(col("name_l")) - length(col("name_r")))
        <= maxDist)
      .withColumn("dist", levenshtein(col("name_l"), col("name_r")))
      .filter(col("dist") <= maxDist)
      // materialize the verified NAME-pair table (small by the
      // df-cap + residual bounds) before the id fan-out: without
      // the barrier the optimizer re-inlines the levenshtein into
      // the post-join projection, so `dist` is recomputed once per
      // (lid, rid) OUTPUT row instead of once per name pair —
      // measured 101 s vs 3 s at sf1, where 7k name pairs fan out
      // to 6.9e7 id pairs (r12)
      .localCheckpoint()
    verified
      .join(l, "name_l").join(r, "name_r")
      .select(col("lid"), col("rid"), col("dist"))
  }

  /** Train→test contamination check (the published LM-training
    * decontamination shape: GPT-3 appendix C / PaLM §6.3 measure
    * test examples sharing word n-grams with the training set). Per
    * test doc: its distinct n-gram span count, how many of those
    * spans occur anywhere in `train`, and the contaminated fraction.
    *
    * Shape: distinct train spans (one agg shuffle) feed a LEFT SEMI
    * hash join against the test span stream — never a cross product;
    * the semi join's build side carries only span strings (at 100 TB
    * hash spans to 16-byte digests first, same swap as
    * [[duplicateSpans]]). */
  def crossContamination(train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    def spans(df: DataFrame) = df.select(col(idCol).as("doc"),
      explode(array_distinct(wordShinglesFast(col(textCol), n)))
        .as("span"))
    val trainSpans = spans(train).select(col("span")).distinct()
    val testSpans = spans(test)
    val totals = testSpans.groupBy(col("doc"))
      .agg(count(lit(1)).as("n_spans"))
    val hits = testSpans.join(trainSpans, Seq("span"), "left_semi")
      .groupBy(col("doc")).agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq("doc"), "left")
      .select(col("doc"), col("n_spans"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)).cast("double")
          / col("n_spans")).as("contamination_rate"))
  }

  /** Exact dedup: keep the lowest-id row per md5(content).
    * `min_by` keeps the winner inside a single hash aggregation —
    * one shuffle on the 128-bit digest, no window needed. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Provenance-preserving dedup — one row per `key` group with the
    * lowest-id representative, the member count, and the SORTED
    * distinct `provCol` values merged onto the survivor: when dedup
    * collapses mirrors/re-crawls of the same content, attribution
    * and license trails must survive the drop (the "keep one copy,
    * keep every source" requirement of audited corpus builds). One
    * hash aggregation on the key — collect_set is bounded by the
    * group's distinct-source count (mirror multiplicity, not corpus
    * size); null provenance values are dropped by collect_set,
    * documented. */
  def dedupWithProvenance(df: DataFrame, idCol: String, key: Column,
      provCol: String): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(col(idCol)).as("rep_id"),
        count(lit(1)).as("n_members"),
        array_join(array_sort(collect_set(col(provCol))), ",")
          .as("provenance"))

  /** Universal-hash-family constants for MinHash permutations:
    * h_p(x) = (aSlope·p + aBase)·x + (bSlope·p + bBase) mod M.
    * Shared with the DuckDB oracle SQL. */
  val MhA1 = 1000003L; val MhA0 = 12345L
  val MhB1 = 999331L;  val MhB0 = 67890L
  val MhMod = 2147483647L

  /** MinHash signatures via a universal hash family: each distinct
    * shingle gets ONE md5-derived 28-bit base hash, and the
    * `numHashes` permutations are cheap affine maps
    * (a_p·h + b_p) mod 2^31−1 minimized per doc. Returns
    * (idCol, minhash ARRAY<BIGINT>); docs shorter than `shingleN`
    * tokens have no shingles and drop out.
    *
    * Shape: explode shingles once, hash once per shingle row, `min`
    * the permutations back per doc — one shuffle on the doc id with
    * map-side partial aggregation. (A per-row array-expression
    * formulation re-inlines the shingle build per hash under
    * projection collapse — 30× slower at sf0.1; per-permutation md5
    * costs numHashes digests per shingle instead of one.) */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16): DataFrame = {
    // fan out before the shingle explode: the md5-per-shingle stage
    // is expression-dense and must run at cluster width even when
    // the input is one small file/row group (no-op at scale)
    val sh = graft.GraftSession.fanOutForCompute(df)
      .select(col(idCol), explode(
        array_distinct(wordShinglesFast(col(textCol), shingleN))).as("s"))
      .withColumn("h", conv(substring(md5(col("s")), 1, 7), 16, 10)
        .cast("long"))
    sh.groupBy(col(idCol))
      .agg(array((0 until numHashes).map { p =>
        val a = MhA1 * p + MhA0
        val b = MhB1 * p + MhB0
        min((col("h") * a + b) % MhMod)
      }: _*).as("minhash"))
  }

  /** LSH banding: split the signature into `bands` bands and hash each
    * band — docs sharing any band hash are near-dup candidates.
    * Returns (idCol, band INT, band_hash STRING), one row per band. */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rowsPerBand = numHashes / bands
    val withSig = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
    withSig
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          md5(concat_ws("|", (0 until rowsPerBand).map(r =>
            element_at(col("minhash"), b * rowsPerBand + r + 1)
              .cast("string")): _*)))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** LSH candidate pairs: self-join on (band, band_hash), id_a < id_b,
    * distinct. The join shuffles on the band hash — collisions, not
    * the corpus, drive the pair count. */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val b = minhashBands(df, idCol, textCol, shingleN, numHashes, bands)
    val l = b.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val r = b.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Emit all i<j pairs of a sorted posting list in one pass, PACKED
    * into a single long (id_a << 32 | id_b) — halves the pair-shuffle
    * key width and avoids struct allocation per pair; the pair count
    * groupBy is the heaviest shuffle of the Jaccard path. Ids must
    * fit 32 bits (documents at any realistic shard size do; shard the
    * corpus before calling otherwise). The nested transform/slice
    * expression form rebuilds intermediate arrays per lambda level
    * under interpreted evaluation — hence a UDF (Array[Long] arg for
    * the primitive fast path; Seq boxes every element).
    *
    * The output array is O(n²) in the posting-list length, so the
    * caller-supplied df cap is a MEMORY bound, not just a skew guard:
    * at the 4096 ceiling a single row tops out at ~8M pairs = 64 MB,
    * the largest allocation one task should ever hold. Beyond that
    * the pair stream must come from a Generator, not an array. */
  private[operators] val MaxPostingDf = 4096
  private val postingPairsUdf = udf { (docs: Array[Long]) =>
    val n = docs.length
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = (docs(i) << 32) | docs(j); k += 1; j += 1
      }
      i += 1
    }
    out
  }

  /** Single-pass distinct-shingle fingerprints: tokenizes once,
    * hashes each n-gram with FNV-1a 64 (over the UTF-8 bytes of the
    * space-joined shingle) and dedupes in-pass — no shingle string is
    * ever materialized, and the inverted-index shuffle key is 8 bytes
    * instead of a ~25-byte string. Collision risk merges two shingles
    * corpus-wide: p ≈ k²/2^65 ≈ 1e-8 at a million distinct shingles —
    * far below any observable effect, and the DuckDB oracle
    * (string-keyed) would catch a collision as a hash mismatch. */
  private val shingleHashesUdf = udf { (s: String, n: Int) =>
    if (s == null) Array.empty[Long]
    else {
      val t = s.split(" ", -1)
      if (t.length < n) Array.empty[Long]
      else {
        val seen = new java.util.HashSet[java.lang.Long]()
        val out = new scala.collection.mutable.ArrayBuffer[Long]()
        var i = 0
        while (i <= t.length - n) {
          var h = 0xcbf29ce484222325L
          var k = 0
          while (k < n) {
            if (k > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
            val bytes = t(i + k).getBytes("UTF-8")
            var bi = 0
            while (bi < bytes.length) {
              h ^= (bytes(bi) & 0xffL); h *= 0x100000001b3L; bi += 1
            }
            k += 1
          }
          if (seen.add(h)) out += h
          i += 1
        }
        out.toArray
      }
    }
  }

  /** Exact n-gram Jaccard similarity via inverted shingle index:
    * explode distinct shingle hashes, drop shingles hotter than
    * `maxDf` docs (skew guard — a stop-shingle joins everything with
    * everything), self-join on shingle, count common, and compute
    * |A∩B| / (|A|+|B|-|A∩B|). Returns (id_a, id_b, common, jaccard)
    * for pairs sharing ≥1 surviving shingle. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, maxDf: Int = 50): DataFrame =
    jaccardPairsWide(df, idCol, textCol, shingleN, maxDf)
      .withColumn("jaccard", col("common").cast("double")
        / (col("n_a") + col("n_b") - col("common")))
      .select(col("id_a"), col("id_b"), col("common"), col("jaccard"))

  /** [[jaccardPairs]]'s shared core, keeping both kept-shingle set
    * sizes in the output so [[containmentPairs]] can normalize
    * asymmetrically: (id_a, id_b, common, n_a, n_b). */
  private[operators] def jaccardPairsWide(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int, maxDf: Int): DataFrame = {
    require(maxDf <= MaxPostingDf,
      s"maxDf=$maxDf would materialize O(maxDf²) pairs per posting " +
        s"list in one task allocation; cap is $MaxPostingDf")
    // Shape: group the inverted index by shingle hash (one shuffle
    // with map-side combine), drop hot shingles by posting-list size,
    // then EXPLODE each posting list's id pairs instead of
    // self-joining the raw index — the candidate-pair count is
    // identical but the two large shuffle joins disappear; per-doc
    // sizes derive from the same grouped lineage and broadcast back.
    val sh = df
      .select(col(idCol).as("doc"),
        explode(shingleHashesUdf(col(textCol), lit(shingleN))).as("s"))
    // Hot shingles are dropped BEFORE any posting list materializes:
    // the df pre-count is a plain partial-aggregating count (bounded
    // state), and only shingles that survive the cap reach the
    // collect — so every collected list is provably ≤ maxDf elements
    // (collecting first and filtering after would build a
    // stop-shingle's full posting array in one aggregation buffer —
    // the same unbounded-group-state class as the r4 centroid fold).
    // Both aggregations shuffle on `s`, so AQE's exchange reuse
    // materializes the explode shuffle once; the semi join is then
    // co-partitioned.
    val lowDf = sh.groupBy(col("s"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDf)
      .select(col("s"))
    val byShingle = sh.join(lowDf, Seq("s"), "left_semi")
      .groupBy(col("s"))
      .agg(array_sort(collect_list(col("doc"))).as("docs"))
    val sizes = byShingle
      .select(explode(col("docs")).as("doc"))
      .groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val pairs = byShingle
      .filter(size(col("docs")) >= 2)
      .select(explode(postingPairsUdf(col("docs"))).as("p"))
    val common = pairs.groupBy(col("p"))
      .agg(count(lit(1)).as("common"))
      .select(shiftright(col("p"), 32).as("id_a"),
        col("p").bitwiseAND(0xFFFFFFFFL).as("id_b"), col("common"))
    // sizes is one row per doc — AQE broadcasts it while it fits and
    // falls back to a shuffle join at corpus scale; no explicit hint.
    common
      .join(sizes.select(col("doc").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("doc").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("common"), col("n_a"),
        col("n_b"))
  }

  /** Asymmetric CONTAINMENT near-dup detection — the quote/subset
    * case symmetric Jaccard misses: a short document wholly quoted
    * inside a long one has |A∩B|/|A∪B| ≈ |A|/|B| (tiny) but
    * |A∩B|/|A| ≈ 1. Broder's containment coefficient over kept
    * shingles, computed on the SAME posting-list machinery as
    * [[jaccardPairs]] (inverted index grouped by shingle hash, hot
    * shingles df-capped before any posting list materializes, pairs
    * exploded from posting lists — never a self-join of the raw
    * index). `containment` = common / min(n_a, n_b): the smaller
    * side's coverage; `contained_id` names that side (ties → id_a).
    *
    * Semantics note (mirrors [[jaccardPairs]]): sizes and overlaps
    * count KEPT shingles — the df cap is part of the definition, and
    * the oracle replays it. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, maxDf: Int = 50,
      threshold: Double = 0.9): DataFrame = {
    val wide = jaccardPairsWide(df, idCol, textCol, shingleN, maxDf)
    wide
      .withColumn("containment", col("common").cast("double")
        / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("common"), col("containment"),
        when(col("n_a") <= col("n_b"), col("id_a"))
          .otherwise(col("id_b")).as("contained_id"))
  }

  /** 60-bit SimHash per document: each token hashes to a 60-bit value
    * (first 15 hex chars of md5), every bit votes ±1 weighted by term
    * frequency, and the sign vector becomes the fingerprint. Near-dups
    * have small Hamming distance. Pure column-expression formulation:
    * explode tokens × bits, aggregate votes, reassemble bits. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // fan out before the token x bit explode (see minhashSignatures)
    val tok = graft.GraftSession.fanOutForCompute(df)
      .select(col(idCol),
      explode(tokens(col(textCol))).as("t"))
      .withColumn("hv", conv(substring(md5(col("t")), 1, 15), 16, 10)
        .cast("long"))
    tok
      .select(col(idCol), col("hv"),
        explode(sequence(lit(0), lit(59))).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(sum(when(expr("shiftright(hv, b) & 1") === 1L, 1L)
        .otherwise(-1L)).as("vote"))
      .groupBy(col(idCol))
      .agg(sum(when(col("vote") > 0, expr("shiftleft(1L, b)"))
        .otherwise(0L)).as("simhash"))
  }

  /** SimHash banded LSH: split the 60-bit fingerprint into `bands`
    * equal bit-bands; by pigeonhole, any pair within Hamming distance
    * `bands − 1` shares at least one identical band, so the band-
    * equality join finds all such pairs without the exhaustive
    * pair scan (the 100 TB path for [[simhash]] mining). Returns
    * verified (id_a, id_b, hamming) for candidates within
    * `maxHamming`. */
  /** Per-row simhash, bit-identical to [[simhash]]'s explode/agg
    * form (DedupSpec pins the equality over the documents table).
    * The streaming near-dup path needs a row-local signature: an
    * explode+groupBy signature is a streaming aggregation, which
    * cannot feed an append-mode stateful candidate join. Same
    * device end-to-end: token hv = first 15 hex chars of md5 (60
    * bits), per-bit majority vote. */
  private[graft] def simhashOf(text: String): Long = {
    val votes = new Array[Int](60)
    // Spark's split(text, " ") keeps interior AND trailing empty
    // tokens (Java split with limit -1) — match it exactly
    text.split(" ", -1).foreach { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new StringBuilder(16)
      var i = 0
      while (i < 8) { hex.append(f"${d(i) & 0xff}%02x"); i += 1 }
      val hv = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      var b = 0
      while (b < 60) {
        if (((hv >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** [[simhashOf]] as a column (String arg — per-row, no shuffle). */
  val simhashRowUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => simhashOf(text))

  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, maxHamming: Int = 3): DataFrame =
    hashNearDups(simhash(df, idCol, textCol), idCol, "simhash",
      bits = 60, bands = bands, maxHamming = maxHamming)

  /** Banded LSH near-dup mining over a PRECOMPUTED `bits`-wide hash
    * column — the band-join core shared by text simhash
    * ([[simhashNearDups]], q57) and perceptual image hashes
    * ([[Multimodal.imageNearDups]] over dHash64). Pigeonhole: any
    * pair within Hamming `bands − 1` shares an identical bit-band,
    * so the band-equality join finds every such pair without an
    * exhaustive scan. Returns verified (id_a, id_b, hamming) within
    * `maxHamming`. */
  def hashNearDups(h: DataFrame, idCol: String, hashCol: String,
      bits: Int, bands: Int, maxHamming: Int): DataFrame = {
    require(maxHamming <= bands - 1,
      s"bands=$bands only guarantees recall up to hamming ${bands - 1}")
    require(bits % bands == 0, s"$bits bits must split into $bands bands")
    val bandBits = bits / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val banded = h.select(col(idCol), col(hashCol).as("_h"),
      posexplode(array((0 until bands).map(b =>
        expr(s"shiftright($hashCol, ${b * bandBits}) & $mask")): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val l = banded.select(col(idCol).as("id_a"),
      col("_h").as("h_a"), col("band"), col("band_val"))
    val r = banded.select(col(idCol).as("id_b"),
      col("_h").as("h_b"), col("band"), col("band_val"))
    // A pair sharing several bands would emit once per shared band;
    // instead of a distinct() exchange, keep only the FIRST
    // colliding band — checkable per-row from the two signatures
    // (for every earlier band b', the band values must differ), so
    // dedup costs bands-1 comparisons instead of a shuffle.
    val firstCollidingBand = (0 until bands).map { bp =>
      val bv = (h: Column) =>
        shiftright(h, bp * bandBits).bitwiseAND(lit(mask))
      col("band") <= bp || bv(col("h_a")) =!= bv(col("h_b"))
    }.reduce(_ && _)
    l.join(r, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .filter(firstCollidingBand)
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: cosine-similar pairs above `threshold` via
    * banded hyperplane-LSH candidates + exact verify
    * ([[SimilaritySearch.cosineNearDupsBanded]] — the scale path; use
    * [[SimilaritySearch.cosinePairsAbove]] as the exhaustive oracle
    * when the threshold is below the banding guarantee, ~0.9). */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame =
    SimilaritySearch.cosineNearDupsBanded(df, idCol, vecCol, threshold)

  /** Connected components over an undirected (id_a, id_b) pair graph
    * by iterative min-label propagation WITH shortcutting: every
    * round a node adopts the smallest of (its label, its neighbors'
    * labels, its label's own label). The extra label-of-label hop is
    * pointer doubling — convergence in O(log diameter) rounds instead
    * of O(diameter), which matters because each round costs fixed
    * Spark stage overhead regardless of data size (NOTES round-4:
    * q74's cost is round-count × overhead on a tiny graph). The
    * fixpoint is unchanged — comp = the component's minimum id — so
    * accelerated propagation cannot change the result (q74's oracle
    * equality holds for any round schedule). Each round is two keyed
    * joins + one aggregation; the driver only evaluates the
    * convergence count. Returns (id, comp).
    *
    * Small-graph finish: when the (deduplicated) edge list fits the
    * `localEdgeThreshold` (default 2^20 edges ≈ 16 MB of id pairs —
    * the same order as a broadcast-join build side), the components
    * are solved exactly by driver union-find instead of the loop.
    * Near-dup pair graphs are tiny relative to their corpora (the
    * candidates were already banded + verified), so this is the
    * common case, and it removes 4-6 rounds of fixed per-job
    * overhead (measured ~1-2 s/round at sf0.1 on a 10²-edge graph
    * regardless of size). The result is identical — exact minimum-id
    * labels — and the distributed loop remains the >threshold path,
    * exactly like a broadcast threshold falling back to a shuffle
    * join. DedupSpec pins local == distributed on the same graph. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
      localEdgeThreshold: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    val edgeCount = edges.count()
    if (edgeCount <= localEdgeThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.select(col("src").cast("long"),
        col("dst").cast("long")).as[(Long, Long)].collect()
      edges.unpersist()
      // union-find with path compression; roots resolve to the
      // component's minimum id because union always keeps the
      // smaller root as parent
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labels = parent.keys.toArray.sorted.map(id => (id, find(id)))
      return spark.createDataset(labels.toSeq).toDF("id", "comp")
    }
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      // shortcut hop: the current label of my current label
      val labelOfLabel = labels.select(col("id").as("_lid"),
        col("comp").as("lcomp"))
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .join(labelOfLabel, col("comp") === col("_lid"), "left")
        .select(col("id"),
          least(col("comp"),
            coalesce(col("ncomp"), col("comp")),
            coalesce(col("lcomp"), col("comp")))
            .as("comp"),
          col("comp").as("prev"))
        // localCheckpoint truncates the per-iteration lineage growth
        // that would otherwise re-execute the whole chain each round
        .localCheckpoint()
      converged =
        updated.filter(col("comp") =!= col("prev")).isEmpty
      // the new labels are a bare projection over the updated
      // checkpoint — no second copy; the PREVIOUS round's frame is
      // dead now, so free its backing blocks (round 0's persist via
      // unpersist, later rounds' checkpoint RDDs via the bridge —
      // Dataset.unpersist cannot reach those, and without the free
      // every round leaked one labels-sized RDD)
      if (i == 0) labels.unpersist()
      else org.apache.spark.sql.graftbridge.CheckpointBridge
        .freeCheckpointBlocks(labels)
      labels = updated.select(col("id"), col("comp"))
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Maximal duplicated CHARACTER spans — the distributed
    * approximation of suffix-array ExactSubstr dedup (Lee et al.
    * 2021): every stride-1 `window`-char window is grouped across
    * the corpus; windows occurring more than once anywhere (cross-
    * or same-document) mark their positions, and per document the
    * marked positions merge into maximal [span_start, span_end)
    * regions via gaps-and-islands. Complements [[duplicateSpans]]
    * (token 5-grams) at character granularity.
    *
    * Shape: one explode → hash aggregate on window content →
    * semi-join back → per-doc island window over REPEATED positions
    * only (a filtered stream, never all positions). At 100 TB
    * fingerprint the window before the exchange (md5/xxhash64) —
    * kept as literal content here so the q118 oracle replays
    * exactly. */
  def repeatedCharSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int = 48): DataFrame = {
    val docs = df.select(col(idCol), col(textCol))
      .filter(length(col(textCol)) >= window)
    // explode the POSITION sequence (ints), derive each window by
    // substr AFTER the explode: materializing all windows as an
    // in-memory array per row before exploding would hold ~window×
    // the text size per document in one buffer (a 10 MB doc → ~500 MB
    // array) — this form holds one position at a time
    val wins = docs
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0), length(col(textCol)) - window))
          .as("p"))
      .select(col(idCol), col("p").cast("long").as("pos"),
        col(textCol).substr(col("p") + 1, lit(window)).as("win"))
    // repeated-window detection as a windowed count: ONE pass over the
    // exploded stream and one exchange on the window content — the
    // groupBy+join-back form scans and explodes the corpus twice
    // (measured 2x slower at sf0.1)
    val rep = wins
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("win"))))
      .filter(col("c") > 1)
      .select(col(idCol), col("pos"))
    val wd = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = rep
      .withColumn("newi",
        (coalesce(col("pos") - lag(col("pos"), 1).over(wd),
          lit(window + 1L)) > window).cast("long"))
      .withColumn("island", sum(col("newi")).over(wd))
      .groupBy(col(idCol), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + window).as("span_end"))
    spans.join(docs, idCol)
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"),
        md5(col(textCol).substr((col("span_start") + 1).cast("int"),
          (col("span_end") - col("span_start")).cast("int")))
          .as("span_md5"))
  }

  /** End-to-end near-dup dedup: LSH candidates → exact-Jaccard verify
    * (≥ `threshold`) → connected components over the verified pair
    * graph (iterative min-id propagation, so transitive chains
    * A~B~C collapse to ONE survivor even when A≁C directly) → keep
    * each component's minimum id. Returns the surviving rows of
    * `df`. */
  def nearDupDedup(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, maxDf: Int = 50): DataFrame = {
    val cands = lshCandidatePairs(df, idCol, textCol, shingleN,
      numHashes, bands)
    val verified = jaccardPairs(df, idCol, textCol, shingleN, maxDf)
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .filter(col("jaccard") >= threshold)
    val dominated = connectedComponents(verified)
      .filter(col("comp") =!= col("id"))
      .select(col("id").as(idCol))
    df.join(dominated, Seq(idCol), "left_anti")
  }

  /** Near-dup cluster label for EVERY row of `df`: the same LSH →
    * exact-Jaccard → connected-components pipeline as
    * [[nearDupDedup]], but returning (idCol, cluster) — cluster is
    * the component's minimum id, and a row in no verified pair is its
    * own singleton cluster. The building block for cluster-level
    * policies (representative choice, cluster-size stats, audit
    * dumps) that plain survivor filtering can't express. */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, maxDf: Int = 50): DataFrame = {
    val cands = lshCandidatePairs(df, idCol, textCol, shingleN,
      numHashes, bands)
    val verified = jaccardPairs(df, idCol, textCol, shingleN, maxDf)
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .filter(col("jaccard") >= threshold)
    val comps = connectedComponents(verified)
      .select(col("id").as(idCol), col("comp"))
    df.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("comp"), col(idCol)).as("cluster"))
  }

  /** Quality-aware near-dup dedup: each cluster keeps its BEST row by
    * `rankCol` (maximum, ties broken by minimum id) instead of
    * [[nearDupDedup]]'s minimum id — the keep-longest /
    * keep-highest-quality policy production dedup pipelines prefer
    * (the min-id survivor of a near-dup cluster may be the truncated
    * or boilerplate-padded variant). Returns the surviving rows of
    * `df` plus their `cluster` label.
    *
    * Scale: the per-cluster argmax is a window over CLUSTERS, whose
    * partition sizes are near-dup component sizes (tiny by
    * construction — candidates were banded and verified), never
    * corpus-sized. */
  def nearDupDedupBy(df: DataFrame, idCol: String, textCol: String,
      rankCol: String, threshold: Double = 0.8, shingleN: Int = 3,
      numHashes: Int = 16, bands: Int = 4, maxDf: Int = 50): DataFrame = {
    val clusters = nearDupClusters(df, idCol, textCol, threshold,
      shingleN, numHashes, bands, maxDf)
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col(rankCol).desc, col(idCol))
    df.join(clusters, Seq(idCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** EXACT Jaccard-threshold self-join via prefix filtering (the
    * AllPairs/PPJoin family — Bayardo et al. 2007, Xiao et al.
    * 2008): every pair with token-set Jaccard ≥ `tau` is returned,
    * with NO false negatives — the guarantee the probabilistic
    * LSH/banding paths ([[minhashBands]], [[simhash]]) trade away.
    *
    * Device: order the vocabulary globally by ascending document
    * frequency (rarest first); a document's PREFIX is its first
    * |T| − ⌈τ·|T|⌉ + 1 tokens in that order. Two sets with Jaccard
    * ≥ τ MUST share a prefix token (pigeonhole on the overlap
    * bound), so the inverted index over PREFIX tokens alone
    * generates all candidates — and prefix tokens are by
    * construction the RAREST, so posting lists stay short on Zipf
    * vocabularies. Candidates then pass the length filter
    * (|B| ≥ ⌈τ·|A|⌉) and exact verification on rank arrays.
    *
    * Shapes: token df + global rank (one VOCABULARY-sized window —
    * vocab, not corpus; swap for a two-pass range rank at extreme
    * vocab), per-doc sorted rank array, prefix explode, per-token
    * pair explode, exact array_intersect verify. One corpus-sized
    * shuffle for the index, pair work bounded by prefix posting
    * lists.
    *
    * Output: (id_a, id_b, inter, sz_a, sz_b, jaccard), id_a < id_b,
    * jaccard ≥ tau exact. */
  def jaccardPrefixJoin(df: DataFrame, idCol: String,
      textCol: String, tau: Double = 0.7): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau in (0, 1] ($tau)")
    val toks = df.select(col(idCol).as("doc"),
      explode(array_distinct(filter(split(col(textCol), " "),
        x => length(x) > 0))).as("tok"))
    val ranks = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("_df"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("_df"), col("tok"))).cast("long"))
      .select(col("tok"), col("rank"))
    val docs = toks.join(ranks, "tok")
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("rank"))).as("ra"))
      .withColumn("sz", size(col("ra")))
      .withColumn("plen",
        (col("sz") - ceil(lit(tau) * col("sz")) + 1).cast("int"))
    val prefix = docs.select(col("doc"), col("sz"),
      explode(expr("slice(ra, 1, plen)")).as("rank"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.rank") === col("b.rank") &&
        col("a.doc") < col("b.doc") &&
        // length filter both ways: τ·max(|A|,|B|) ≤ min(|A|,|B|)
        col("b.sz") >= ceil(lit(tau) * col("a.sz")) &&
        col("a.sz") >= ceil(lit(tau) * col("b.sz")))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()
    cand
      .join(docs.select(col("doc").as("id_a"), col("ra").as("raa"),
        col("sz").as("sz_a")), "id_a")
      .join(docs.select(col("doc").as("id_b"), col("ra").as("rab"),
        col("sz").as("sz_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("raa"), col("rab"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("inter"),
        col("sz_a").cast("long").as("sz_a"),
        col("sz_b").cast("long").as("sz_b"), col("jaccard"))
  }

  /** Cross-source exact-content overlap matrix — the provenance
    * audit a multi-source corpus runs before mixing weights are
    * chosen (two "independent" sources sharing half their content
    * double-count in every mixture computation; the matrix says
    * which pairs do). One row per unordered source pair with the
    * number of distinct content keys (md5 of the text) present in
    * BOTH.
    *
    * Scale: the corpus collapses to DISTINCT (key, source) first —
    * key-pair work is then Σ C(sources-per-key, 2), bounded by the
    * SOURCE count per key, never by document multiplicity; the pair
    * join is a hash equi-join on the key. */
  def crossSourceOverlap(df: DataFrame, textCol: String,
      srcCol: String): DataFrame = {
    val keyed = df.select(md5(col(textCol)).as("_k"),
      col(srcCol).as("source")).distinct()
    keyed.as("a")
      .join(keyed.as("b"), col("a._k") === col("b._k") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared_keys"))
  }

  /** Exact-dup cluster-size histogram + dedup savings — the
    * before/after numbers a dedup pass is justified with: clusters
    * by content key (md5 of text), keep-lowest-id survivor, and per
    * cluster-size bucket the cluster count, document count, and
    * characters saved (total chars − survivor chars). One content-
    * key aggregation + one bucket aggregation; text never
    * self-joins. */
  def dedupSavingsHistogram(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val clusters = df.select(md5(col(textCol)).as("_k"),
        col(idCol).as("_id"),
        length(col(textCol)).cast("long").as("_chars"))
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("cluster_size"),
        sum(col("_chars")).as("_total"),
        min(struct(col("_id"), col("_chars"))).as("_survivor"))
      .select(col("cluster_size"),
        (col("_total") - col("_survivor").getField("_chars"))
          .as("_saved"))
    clusters.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        (count(lit(1)) * col("cluster_size").cast("long"))
          .as("n_docs"),
        sum(col("_saved")).as("chars_saved"))
  }

  /** Per-document duplicated-n-gram fraction — the memorization-risk
    * audit (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better", reports exactly this: the fraction of
    * a document's n-grams that occur elsewhere in the corpus;
    * high-fraction docs are the ones a model regurgitates). For each
    * doc: its distinct n-gram shingles, how many of them appear in
    * ≥ 2 documents, and the fraction.
    *
    * Shape: one shingle explode (distinct-per-doc in-pass), one
    * gram-level count aggregate, one gram-keyed join back, one
    * per-doc aggregate — the q218 inverted-index family; the widest
    * exchange carries one row per distinct (doc, gram). Docs with
    * fewer than n tokens surface with n_shingles = 0 and a null
    * fraction (never silently dropped). */
  def duplicatedNgramFraction(df: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val sh = df.select(col(idCol),
      explode(array_distinct(wordShinglesFast(col(textCol), n))).as("g"))
    val gc = sh.groupBy(col("g")).agg(count(lit(1)).as("nd"))
    val per = sh.join(gc, Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("nd") >= 2, 1)).as("n_dup"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        when(col("n_shingles") > 0,
          col("n_dup").cast("double") /
            col("n_shingles").cast("double")).as("dup_frac"))
  }

  /** LSH candidate-quality sweep — the measured counterpart of the
    * analytic [[lshPlanCurve]]: run the ACTUAL banding
    * ([[lshCandidatePairs]]) against the indexed-exact Jaccard truth
    * ([[jaccardPairs]], same shingles and df cap) and report, per
    * similarity threshold, how many truly-similar pairs the bands
    * caught (recall) and what fraction of candidates were worth
    * verifying (precision). This is the table that justifies a
    * chosen (numHashes, bands) before an exact-verify pass burns a
    * corpus-sized join.
    *
    * Shape: the two established pair pipelines, one full-outer join
    * on the pair key, a broadcast of the |thresholds|-row grid, one
    * conditional aggregate. Pair-frame-sized work, same bound as the
    * q28 path that feeds it. */
  def lshQualitySweep(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      maxDf: Int = 50,
      thresholds: Seq[Double] = Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8))
      : DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val truth = jaccardPairs(df, idCol, textCol, shingleN, maxDf)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val cand = lshCandidatePairs(df, idCol, textCol, shingleN,
        numHashes, bands)
      .withColumn("is_cand", lit(true))
    val pairs = truth.join(cand, Seq("id_a", "id_b"), "full_outer")
      .select(coalesce(col("jaccard"), lit(0.0)).as("jacc"),
        coalesce(col("is_cand"), lit(false)).as("is_cand"))
    val thr = thresholds.toDF("t")
    pairs.crossJoin(broadcast(thr))
      .groupBy(col("t"))
      .agg(count(when(col("jacc") >= col("t"), 1)).as("n_true"),
        count(when(col("is_cand"), 1)).as("n_cand"),
        count(when(col("is_cand") && col("jacc") >= col("t"), 1))
          .as("n_hit"))
      .withColumn("precision", when(col("n_cand") > 0,
        col("n_hit").cast("double") / col("n_cand").cast("double")))
      .withColumn("recall", when(col("n_true") > 0,
        col("n_hit").cast("double") / col("n_true").cast("double")))
  }

  /** LSH parameter planner: the banding S-curve P(candidate | sim=s)
    * = 1 − (1 − s^r)^b for each (bands b, rows-per-band r)
    * candidate, tabulated on a similarity grid — the table an
    * operator of [[minhashBands]] reads to pick (b, r) for a target
    * threshold before burning a corpus-sized pass (Leskovec–
    * Rajaraman–Ullman, MMDS §3.4; the threshold sits near
    * (1/b)^(1/r), where the curve crosses ~0.5).
    *
    * Determinism discipline: s^r and (1−p)^b are expanded as
    * explicit left-associated multiply chains — repeated IEEE
    * multiplication, NOT pow() (whose libm rounding differs across
    * engines) — so the DuckDB oracle reproduces every cell
    * bit-identically. Planner-sized frame (|combos| × gridSteps
    * rows); no data is touched. */
  def lshPlanCurve(spark: org.apache.spark.sql.SparkSession,
      combos: Seq[(Int, Int)], gridSteps: Int = 20): DataFrame = {
    require(combos.nonEmpty && combos.forall { case (b, r) =>
      b >= 1 && r >= 1 }, "need (bands, rowsPerBand) combos >= 1")
    require(gridSteps >= 2, "need a grid")
    def chain(base: Column, n: Int): Column =
      (1 until n).foldLeft(base)((acc, _) => acc * base)
    combos.map { case (b, r) =>
      val grid = spark.range(1L, gridSteps.toLong).toDF("i")
        .select((col("i").cast("double") / gridSteps.toDouble).as("s"))
      val p1 = chain(col("s"), r)
      val miss = chain(lit(1.0) - p1, b)
      grid.select(lit(b).as("bands"), lit(r).as("rows_per_band"),
        col("s"), (lit(1.0) - miss).as("collision_p"))
        .withColumn("crossed_half", col("collision_p") >= 0.5)
    }.reduce(_ unionByName _)
  }
}
