package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Dedup-family behavior on planted duplicates (reference invariant
  * D2: re-ingest ⇒ identical representative set). */
class DedupSpec extends SparkTestBase {

  private lazy val docs = {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    Seq(
      (1L, base),
      (2L, base),                                  // exact dup of 1
      (3L, base.replace("theta", "THETA")),        // near dup of 1
      (4L, "completely different words entirely unrelated content " +
        "nothing shared with the others at all in any way"),
      (5L, base + " extra trailing tokens appended here")  // near dup
    ).toDF("doc_id", "text")
  }

  test("exactDedup keeps lowest id per content hash") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
    assert(out.count() === 4) // 1&2 collapse
    val dup = out.filter(col("n_copies") === 2).head()
    assert(dup.getAs[Long]("doc_id") === 1L)
  }

  test("dedupWithProvenance merges sorted distinct sources onto the " +
      "lowest-id representative; singletons keep their own") {
    import spark.implicits._
    val df = Seq(
      (1L, "same text", "web"),
      (7L, "same text", "archive"),
      (3L, "same text", "web"),
      (5L, "unique text", "wiki"))
      .toDF("id", "text", "src")
    val out = Dedup.dedupWithProvenance(df, "id", col("text"), "src")
      .select("dedup_key", "rep_id", "n_members", "provenance")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(_._2)
    assert(out.toSeq === Seq(
      ("same text", 1L, 3L, "archive,web"),
      ("unique text", 5L, 1L, "wiki")))
  }

  test("exactDedup is idempotent under re-ingestion (D2)") {
    val once = Dedup.exactDedup(docs, "doc_id", "text")
    val twice = Dedup.exactDedup(docs.union(docs), "doc_id", "text")
    assert(once.select("content_hash", "doc_id").collect().toSet
      === twice.select("content_hash", "doc_id").collect().toSet)
  }

  test("jaccardPairs finds planted near-dups with correct similarity") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    // exact dup pair has jaccard 1.0
    assert(pairs((1L, 2L)) === 1.0)
    // near dups score high but < 1
    assert(pairs((1L, 3L)) > 0.5 && pairs((1L, 3L)) < 1.0)
    assert(pairs((1L, 5L)) > 0.5 && pairs((1L, 5L)) < 1.0)
    // unrelated doc 4 pairs with nobody
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH candidates cover the true near-dup pairs") {
    val cands = Dedup.lshCandidatePairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(cands.contains((1L, 5L)) || cands.contains((2L, 5L)))
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash signatures of identical docs are identical") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(4L))
  }

  test("simhash: near-dups have small hamming distance, unrelated large") {
    val hs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(2L)) === 0)
    assert(hamming(hs(1L), hs(3L)) < 10)
    assert(hamming(hs(1L), hs(4L)) > 15)
  }

  test("nearDupDedup keeps lowest-id representative per dup cluster") {
    val survivors = Dedup.nearDupDedup(docs, "doc_id", "text",
      threshold = 0.8, bands = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 2 (exact dup of 1) must drop; 1 and the unrelated 4 survive
    assert(survivors.contains(1L) && survivors.contains(4L))
    assert(!survivors.contains(2L))
  }

  test("nearDupClusters labels every row; singletons are their own " +
      "cluster") {
    val cl = Dedup.nearDupClusters(docs, "doc_id", "text",
        threshold = 0.8, bands = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.keySet === Set(1L, 2L, 3L, 4L, 5L),
      "every input row must be labeled")
    // the dup family collapses to min id 1; unrelated 4 is a singleton
    assert(cl(1L) === 1L && cl(2L) === 1L)
    assert(cl(4L) === 4L)
  }

  test("nearDupDedupBy keeps the LONGEST member per cluster, not the " +
      "min id (ties broken by min id)") {
    import spark.implicits._
    val withLen = docs.withColumn("len", length(col("text")))
    // threshold 0.5 verifies (1,2), (1,3), (1,5): one cluster whose
    // LONGEST member is 5 (base + extra tokens)
    val survivors = Dedup.nearDupDedupBy(withLen, "doc_id", "text",
        "len", threshold = 0.5, bands = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.contains(5L),
      s"longest member must survive; got $survivors")
    assert(!survivors.contains(1L) && !survivors.contains(2L))
    assert(survivors.contains(4L))
    // same pipeline, min-id policy: survivor flips to 1
    val minId = Dedup.nearDupDedup(withLen, "doc_id", "text",
        threshold = 0.5, bands = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId.contains(1L) && !minId.contains(5L))
  }

  test("connectedComponents propagates the minimum id across chains") {
    import spark.implicits._
    val pairs = Seq((2L, 3L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: union-find finish equals the " +
      "distributed loop on the same graph") {
    import spark.implicits._
    // long chain (deep diameter) + star + singleton pair, shuffled
    val chain = (0L until 40L).map(i => (i + 1, i))
    val star = Seq((100L, 105L), (100L, 103L), (100L, 104L))
    val pairs = scala.util.Random.shuffle(chain ++ star)
      .toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(pairs, maxIter = 50,
        localEdgeThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === dist)
    assert((0L to 40L).forall(local(_) === 0L))
    assert(Seq(100L, 103L, 104L, 105L).forall(local(_) === 100L))
  }

  test("nearDupDedup collapses transitive chains A~B~C with A!~C " +
      "to one survivor (connected components)") {
    import spark.implicits._
    // sliding 100-token windows stepping by 10: adjacent windows have
    // 3-gram Jaccard ~0.815 (>= 0.8), window i vs i+2 only ~0.66
    def window(start: Int) =
      (start until start + 100).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, window(1)), (2L, window(11)), (3L, window(21)),
      (9L, ("unrelated zz " * 60).trim)).toDF("doc_id", "text")
    val survivors = Dedup.nearDupDedup(docs, "doc_id", "text",
      threshold = 0.8, bands = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 9L),
      s"chain must collapse to its minimum id; got $survivors")
  }

  test("simhash banded LSH recovers all pairs within the hamming bound") {
    // exhaustive truth on the small corpus
    val hs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val truth = (for {
      a <- hs.keys; b <- hs.keys if a < b
      if hamming(hs(a), hs(b)) <= 3
    } yield (a, b)).toSet
    val banded = Dedup.simhashNearDups(docs, "doc_id", "text",
      bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === truth)
    assert(truth.contains((1L, 2L))) // exact dups at hamming 0
  }

  test("embedding near-dups surface planted duplicate vectors") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.01f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f))).toDF("id", "vec")
    val out = Dedup.embeddingNearDups(vecs, "id", "vec", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("duplicateSpans attributes shared spans to the earliest " +
      "(doc, pos) and counts every occurrence") {
    import spark.implicits._
    val spanDocs = Seq(
      (10L, "x y one two three four five z"),   // span at pos 2
      (3L, "one two three four five tail words here"), // pos 0 (first)
      (7L, "lead one two three four five one two three four five"),
      (9L, "totally unrelated words with no shared span at all")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(spanDocs, "doc_id", "text", n = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    // the only repeated 5-word span: doc3@0 (first), doc7@{1,6}, doc10@2
    assert(out === Map(
      "one two three four five" -> ((4L, 3L, 3L, 0))))
  }

  test("span rewrite drops repeated blocks corpus-wide, keeps the " +
      "first occurrence, and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),  // blocks: "a b c d e", "f g h i j"
      (2L, "a b c d e x y z w v"),  // first block duplicates doc1's
      (3L, "f g h i j")             // whole doc duplicates doc1 block 2
    ).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateSpans(docs, "doc_id", "text", n = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((2L, 2L, "a b c d e f g h i j")))
    assert(got(2L) === ((2L, 1L, "x y z w v")))
    assert(got(3L) === ((1L, 0L, "")))
    assert(got.size === 3, "every input document must appear")
  }

  test("paragraph dedup drops corpus-wide repeated paragraphs, " +
      "normalizes blank separators, and keeps first occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha\nshared boiler\nbeta beta"),
      (2L, "gamma gamma\nshared boiler\n\ndelta delta"), // blank line
      (3L, "shared boiler"),                 // entirely a duplicate
      (4L, "same line\nsame line\nother line") // intra-doc repeat
    ).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateParagraphs(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((3L, 3L, "alpha alpha\nshared boiler\nbeta beta")))
    // doc2: blank paragraph excluded from count AND rebuild; the
    // shared paragraph went to doc1
    assert(got(2L) === ((3L, 2L, "gamma gamma\ndelta delta")))
    assert(got(3L) === ((1L, 0L, "")))
    assert(got(4L) === ((3L, 2L, "same line\nother line")))
    assert(got.size === 4, "every doc with content must appear")
  }

  test("paragraph dedup keeps one row per INPUT doc: an all-blank " +
      "doc reports (0, 0, empty) instead of vanishing") {
    import spark.implicits._
    val docs = Seq((1L, "real paragraph"), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.dropDuplicateParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === ((0L, 0L, "")))
    assert(got(3L) === ((0L, 0L, "")))
  }

  test("boilerplate-line removal drops every occurrence of a line " +
      "over the doc-frequency threshold, case-insensitively; " +
      "low-frequency shared lines and intra-doc repeats survive") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique opening\nCookie Banner Text\nunique tail one"),
      (2L, "cookie banner text\nquoted passage shared twice"),
      (3L, "  cookie banner text  \nquoted passage shared twice\nown"),
      (4L, "cookie banner text"),              // entirely boilerplate
      (5L, "echo echo\necho echo\necho echo\nsolo line"), // intra-doc
      (6L, "line a\n\n\nline b")               // blank separators
    ).toDF("doc_id", "text")
    val got = Dedup.dropBoilerplateLines(docs, "doc_id", "text",
        maxDocFreq = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "cookie banner text" is in 4 distinct docs (> 2) under the
    // lower(trim) identity — removed everywhere, original casing and
    // padding notwithstanding
    assert(got(1L) === ((3L, 2L, "unique opening\nunique tail one")))
    // "quoted passage shared twice" is in only 2 docs — kept in both
    assert(got(2L) === ((2L, 1L, "quoted passage shared twice")))
    assert(got(3L) === ((3L, 2L, "quoted passage shared twice\nown")))
    assert(got(4L) === ((1L, 0L, "")))
    // intra-doc repetition is one distinct doc — never boilerplate
    assert(got(5L) === ((4L, 4L,
      "echo echo\necho echo\necho echo\nsolo line")))
    assert(got(6L) === ((2L, 2L, "line a\nline b")))
    assert(got.size === 6)
  }

  test("boilerplate-line removal keeps one row per INPUT doc") {
    import spark.implicits._
    val docs = Seq((1L, "content"), (2L, "   \n  "), (3L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.dropBoilerplateLines(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(2L) === ((0L, 0L, "")))
    assert(got(3L) === ((0L, 0L, "")))
  }

  test("snapshot diff keys presence on the id, not the digest: null " +
      "text is present, and null==null is unchanged") {
    import spark.implicits._
    val before = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
    val after = Seq((1L, "now has text"), (2L, null: String))
      .toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(before, after, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("winnowing fails fast on documents beyond the 20-bit packed-" +
      "position contract instead of silently corrupting keys") {
    import spark.implicits._
    val big = Seq((1L, "x" * 1100000)).toDF("doc_id", "text")
    val e = intercept[org.apache.spark.SparkException] {
      Dedup.winnowedFingerprints(big, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("pre-chunk") ||
      Option(e.getCause).exists(_.getMessage.contains("pre-chunk")))
  }

  test("snapshot diff classifies added / removed / changed / " +
      "unchanged exactly") {
    import spark.implicits._
    val before = Seq((1L, "stable content"), (2L, "will change"),
      (3L, "will vanish")).toDF("doc_id", "text")
    val after = Seq((1L, "stable content"), (2L, "has changed"),
      (4L, "brand new")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(before, after, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("winnowing guarantee: a shared substring of length >= " +
      "window + winnow - 1 shares a selected fingerprint; selection " +
      "is sparse") {
    import spark.implicits._
    val shared = (1 to 60).map(i => ('a' + (i * 7 % 26)).toChar)
      .mkString // 60 deterministic chars >= 48 + 8 - 1
    // non-periodic filler: distinct 2-char blocks, so no 48-window
    // ever repeats within a filler run (a constant run would repeat
    // ITSELF and legitimately fingerprint — not what this case tests)
    def filler(n: Int, base: Char) = (0 until n).map(i =>
      s"${(base + i / 26).toChar}${('a' + i % 26).toChar}").mkString
    val docs = Seq(
      (1L, filler(40, 'A') + shared + filler(40, 'G')),
      (2L, filler(48, 'M') + shared + filler(33, 'T')),
      (3L, filler(100, 'a'))).toDF("doc_id", "text")
    val out = Dedup.winnowedFingerprints(docs, "doc_id", "text",
      window = 48, winnow = 8).collect()
    val byFp = out.groupBy(_.getString(2)).view
      .mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(byFp.values.exists(s => s == Set(1L, 2L)),
      s"docs 1 and 2 must share a selected fingerprint: $byFp")
    assert(!out.exists(_.getLong(0) == 3L),
      "the unrelated doc must produce no repeated fingerprints")

    // density: identical twin docs repeat EVERY selected fingerprint;
    // selection must be well under the full window stream
    val twin = Seq((1L, shared * 4), (2L, shared * 4))
      .toDF("doc_id", "text")
    val sel = Dedup.winnowedFingerprints(twin, "doc_id", "text",
      window = 48, winnow = 8)
      .filter($"doc_id" === 1L).count()
    val nWindows = shared.length * 4 - 48 + 1
    assert(sel < nWindows * 0.4,
      s"winnowing must thin the stream: $sel of $nWindows selected")
    assert(sel > 0)
  }

  test("containment finds a quoted subset doc that Jaccard misses") {
    import spark.implicits._
    val long = "quartz nebula crimson harbor velvet meadow lantern " +
      "orchid thunder saffron glacier ember willow cascade prism " +
      "juniper marble falcon tundra zephyr"
    val slice = "velvet meadow lantern orchid thunder saffron " +
      "glacier ember willow cascade"
    val corpus = Seq((1L, long), (2L, slice),
      (3L, "basalt quill mosaic fjord topaz bramble cinder vale"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(corpus, "doc_id", "text",
      shingleN = 3, maxDf = 50, threshold = 0.9).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert((p.getAs[Long]("id_a"), p.getAs[Long]("id_b")) === ((1L, 2L)))
    assert(p.getAs[Double]("containment") === 1.0)
    assert(p.getAs[Long]("contained_id") === 2L,
      "the smaller (quoted) doc is the contained side")
    // the same pair scores well under 0.9 on symmetric Jaccard:
    // 8 shared shingles of 18∪8 − 8 = 18
    val j = Dedup.jaccardPairs(corpus, "doc_id", "text", shingleN = 3)
      .filter($"id_a" === 1L && $"id_b" === 2L)
      .head().getAs[Double]("jaccard")
    assert(j < 0.5, s"jaccard $j should miss the quote pair")
  }

  test("bloom decontamination flags exactly the train docs sharing a " +
      "5-gram with test, via a native bloom probe (no UDF)") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely clean training document with original words"),
      (3L, "prefix words then the quick brown fox jumps over suffix")
    ).toDF("doc_id", "text")
    val test = Seq(
      (100L, "unrelated opener the quick brown fox jumps closing bits")
    ).toDF("doc_id", "text")
    val out = Dedup.bloomDecontaminate(train, test, "doc_id", "text",
        n = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // "the quick brown fox jumps" is the shared 5-gram
    assert(out === Map(1L -> true, 2L -> false, 3L -> true))

    // the prefilter is the codegen'd BloomFilterMightContain
    // expression, not a scala UDF
    val plan = Dedup.bloomDecontaminate(train, test, "doc_id", "text",
      n = 5).queryExecution.executedPlan.toString
    // (the shingle builder is the documented wordShingles UDF; the
    // PROBE itself must be the native expression over xxhash64)
    assert(plan.contains("might_contain"), plan.take(500))
    assert(plan.contains("xxhash64(span"), plan.take(500))
  }

  test("bloom decontamination is value-identical to the exact screen " +
      "on a corpus with planted overlaps") {
    import spark.implicits._
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    def text(seed: Int) = (0 until 12)
      .map(i => vocab((seed * 7 + i * 3) % vocab.length)).mkString(" ")
    val docs = (0 until 40).map(i => (i.toLong, text(i)))
      .toDF("doc_id", "text")
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val test = docs.filter($"doc_id" % 5 === 0)
    val bloomOut = Dedup.bloomDecontaminate(train, test, "doc_id",
      "text", n = 5).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // exact screen: any shared distinct 5-gram
    val spans = docs.select($"doc_id", explode(array_distinct(
      graft.functions.TextFunctions.wordShinglesFast($"text", 5)))
      .as("span"))
    val testSpans = spans.filter($"doc_id" % 5 === 0)
      .select("span").distinct()
    val exact = spans.filter($"doc_id" % 5 =!= 0)
      .join(testSpans, Seq("span"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(bloomOut === train.select("doc_id").as[Long].collect()
      .map(id => id -> exact(id)).toMap)
    assert(exact.nonEmpty, "planted overlaps must actually exist")
  }

  test("fuzzy matching finds typo pairs via q-grams and short pairs " +
      "via the exhaustive bucket") {
    import spark.implicits._
    val rows = Seq(
      "wrench industrial",  // long: 1 substitution from the next
      "wrinch industrial",
      "bolt", "bolz",       // short (<9): no gram guarantee → bucket
      "completely different phrase"
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    val got = Dedup.fuzzyMatches(rows, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(got === Set(
      ("wrench industrial", "wrinch industrial", 1),
      ("bolt", "bolz", 1)))
  }

  test("fuzzy matching: stop-gram names route through the residual " +
      "path (the maxDf cap must not void recall) and the plan has " +
      "no CartesianProduct (r5)") {
    import spark.implicits._
    // "abcdefghi" (9 chars ≥ the (d+1)·q=9 floor) shares every gram
    // with the fillers, so at maxDf=2 ALL its grams are stop-grams;
    // its distance-1 partner "abcdefghz" keeps the unshared gram
    // "ghz"/"hgz"… — without residual routing the pair is missed.
    // fillers are mutually far apart (so the exhaustive truth below
    // only contains guaranteed-recall pairs) but share every gram of
    // the probe name, driving those grams over the df cap
    val fillers = Seq("abcdefghi alpha one", "abcdefghi bravo two",
      "abcdefghi charlie three", "abcdefghi delta four")
    val rows = (Seq("abcdefghi", "abcdefghz", "bolt", "bolz") ++ fillers)
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "name")
    val got = Dedup.fuzzyMatches(rows, "name", maxDist = 1, maxDf = 2)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "fuzzy matching must stay hash-join shaped")
    val pairs = got.collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // exhaustive truth at maxDist=1 over the same distinct universe
    val names = (Seq("abcdefghi", "abcdefghz", "bolt", "bolz")
      ++ fillers)
    val want = (for {
      a <- names; b <- names if a < b
      d = {
        val la = a.length; val lb = b.length
        val dp = Array.tabulate(la + 1)(i => i)
        var prev = 0
        for (j <- 1 to lb) {
          prev = dp(0); dp(0) = j
          for (i <- 1 to la) {
            val t = dp(i)
            dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
              prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
            prev = t
          }
        }
        dp(la)
      }
      if d <= 1
    } yield (a, b, d)).toSet
    assert(pairs === want)
    assert(pairs.contains(("abcdefghi", "abcdefghz", 1)),
      "stop-gram pair must be recovered via the residual path")
  }

  test("fuzzyJoin: bipartite pairs across the q-gram and residual " +
      "paths, id fan-out on repeated names, no CartesianProduct") {
    import spark.implicits._
    val probes = Seq((10L, "wrinch industrial"), (11L, "bolz"),
      (12L, "nothing like these")).toDF("pid", "pname")
    val catalog = Seq((1L, "wrench industrial"),
      (2L, "wrench industrial"), // repeated name → both ids pair
      (3L, "bolt"), (4L, "unrelated catalog entry"))
      .toDF("cid", "cname")
    val got = Dedup.fuzzyJoin(probes, "pid", "pname",
      catalog, "cid", "cname", maxDist = 2)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "fuzzyJoin must stay hash-join shaped")
    val pairs = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((10L, 1L, 1), (10L, 2L, 1), (11L, 3L, 1)))
    // dist-0 (exact) pairs are emitted too — a probe that IS a
    // catalog name must not be dropped
    val exact = Dedup.fuzzyJoin(
      Seq((20L, "bolt")).toDF("pid", "pname"), "pid", "pname",
      catalog, "cid", "cname", maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(exact === Set((20L, 3L, 0)))
  }

  test("fuzzy blocking stays LIVE on a 10x fixed-vocabulary corpus " +
      "under AutoDf, where an absolute cap degenerates (r12)") {
    import spark.implicits._
    // fixed 12-word vocabulary, 4-word names (the TPC-H p_name
    // shape; base-12 digits of i pick the words, so names are
    // distinct combos): gram TYPES plateau while per-gram df grows
    // with n — exactly the regime the r11 review flagged. No
    // per-name salt: every gram must come from the fixed vocabulary
    // or the degeneration never manifests. Word ends/starts are all
    // DISTINCT letters so a boundary 3-gram "x y" identifies one
    // word PAIR — a name's rarest gram, with df ≈ n/144, the
    // cleanest possible df ∝ n signal.
    val vocab = ('a' to 'l').map(c => s"${c}zz$c").toVector
    def corpus(n: Int) = spark.range(n).map { i =>
      val a = vocab((i % 12).toInt)
      val b = vocab(((i / 12) % 12).toInt)
      val c = vocab(((i / 144) % 12).toInt)
      val d = vocab(((i / 1728) % 12).toInt)
      (i, s"$a $b $c $d")
    }.toDF("id", "name")
    def share(n: Int, maxDf: Int): Double =
      Dedup.fuzzyBlockingStats(corpus(n), "name", maxDf = maxDf)
        .collect().head.getAs[Double]("residual_share")
    // absolute cap 50: live at 1x (pair-gram df = 1728/144 = 12),
    // but at 10x every pair-gram df = 120-144 exceeds the cap -> all
    // names fall to the length-key residual (the documented
    // quadratic hazard)
    assert(share(1728, 50) < 0.05)
    assert(share(17280, 50) > 0.95)
    // AutoDf: the rarest (word-pair boundary) grams stay far under
    // the cap at both scales -> gram blocking stays live
    assert(share(1728, Dedup.AutoDf) < 0.05)
    assert(share(17280, Dedup.AutoDf) < 0.05)
    // ABOVE the 1000 floor the cap tracks the per-name rarest-gram
    // df quantile: 5-word names (12^5 combos) at n = 50000 put the
    // rarest (boundary-pair) grams at df ~ 1000-2500 > the floor,
    // and the q95 contract bounds the residual share at 5% BY
    // CONSTRUCTION while the cap stays far below the interior-gram
    // dfs (~ n*5/12 = 20833) a naive n-scaled cap would have kept
    def corpus5(n: Int) = spark.range(n).map { i =>
      val ws = (0 until 5).map(j =>
        vocab(((i / math.pow(12, j).toLong) % 12).toInt))
      (i, ws.mkString(" "))
    }.toDF("id", "name")
    val stats = Dedup.fuzzyBlockingStats(corpus5(50000), "name")
      .collect().head
    val cap = stats.getAs[Int]("df_cap")
    assert(cap > 1000 && cap < 5000,
      s"cap $cap must track the boundary-gram df band, not the floor")
    assert(stats.getAs[Double]("residual_share") <= 0.051)
    // explicit maxDf still wins over the data-derived cap
    val statsExplicit = Dedup.fuzzyBlockingStats(corpus5(50000),
      "name", maxDf = 7).collect().head
    assert(statsExplicit.getAs[Int]("df_cap") === 7)
  }

  test("fuzzy matching resolves over distinct values, not rows") {
    import spark.implicits._
    val rows = Seq((1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "alpha betz")).toDF("id", "name")
    val got = Dedup.fuzzyMatches(rows, "name", maxDist = 1).collect()
    assert(got.length === 1, "duplicate values must not duplicate pairs")
    assert(got(0).getInt(2) === 1)
  }

  test("span rewrite is the identity on a duplicate-free corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u v"),
      (2L, "h i j k l m n o")
    ).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateSpans(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got === Map(1L -> "p q r s t u v", 2L -> "h i j k l m n o"))
  }

  test("jaccardPrefixJoin: COMPLETE vs the brute-force truth (no " +
      "false negatives, no false positives) on a Zipf-ish corpus") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    // Zipf-ish vocab: token t drawn with weight ~ 1/(t+1)
    def draw(): String = {
      val u = r.nextDouble()
      s"w${math.min(99, (math.pow(200.0, u) - 1).toInt)}"
    }
    val raw = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    (0 until 120).foreach { i =>
      if (i % 10 == 1 && raw.nonEmpty)
        // planted near-dup: previous doc with one token swapped
        raw += raw.last.dropRight(1) :+ "swapped"
      else raw += (0 until 20).map(_ => draw()).distinct
    }
    val docs = raw.zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val tau = 0.6
    val got = Dedup.jaccardPrefixJoin(docs, "doc_id", "text", tau)
      .collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1)) -> r2.getDouble(5))
      .toMap
    // brute force truth on the same distinct-token sets
    val sets = docs.collect().map { row =>
      row.getLong(0) -> row.getString(1).split(" ")
        .filter(_.nonEmpty).distinct.toSet
    }
    val truth = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.intersect(sb).size
      jac = inter.toDouble / (sa.size + sb.size - inter)
      if jac >= tau
    } yield (ia, ib) -> jac).toMap
    assert(got === truth, s"${got.size} vs truth ${truth.size}")
    assert(truth.nonEmpty, "test corpus produced no similar pairs")
  }

  test("jaccardPrefixJoin prunes: candidate pairs stay far below " +
      "the quadratic bound on a diverse corpus, and the plan has " +
      "no cartesian") {
    import spark.implicits._
    val docs = (0L until 200L).map(i =>
      (i, (0 until 15).map(t => s"tok_${i}_$t").mkString(" ")))
      .toSeq.toDF("doc_id", "text")
    // fully disjoint docs: zero pairs, and the run is cheap
    val out = Dedup.jaccardPrefixJoin(docs, "doc_id", "text", 0.8)
    assert(out.count() === 0L)
    val plan = out.queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("crossSourceOverlap: distinct keys per pair, multiplicity " +
      "collapsed, unordered pairs once") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared one", "a"), (2L, "shared one", "b"),
      (3L, "shared one", "b"),   // multiplicity inside b collapses
      (4L, "shared two", "a"), (5L, "shared two", "c"),
      (6L, "only a", "a"),
      (7L, "tri", "a"), (8L, "tri", "b"), (9L, "tri", "c"))
      .toDF("id", "text", "src")
    val out = Dedup.crossSourceOverlap(docs, "text", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(out === Map(("a", "b") -> 2L, ("a", "c") -> 2L,
      ("b", "c") -> 1L))
  }

  test("dedupSavingsHistogram: lowest-id survivor's chars kept, " +
      "bucket counts exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "xxxx"), (2L, "xxxx"), (3L, "xxxx"), // cluster of 3
      (10L, "yy"), (11L, "yy"),                 // cluster of 2
      (20L, "zzz"))                             // singleton
      .toDF("id", "text")
    val out = Dedup.dedupSavingsHistogram(docs, "id", "text")
      .orderBy("cluster_size").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 0L),
      (2L, 1L, 2L, 2L),   // 4 total - 2 survivor
      (3L, 1L, 3L, 8L)))  // 12 total - 4 survivor
  }

  test("duplicatedNgramFraction counts cross-corpus shingle reuse " +
      "per doc, keeps short docs with null fraction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),     // shingles: "a b c d e","b c d e f"
      (2L, "a b c d e x"),     // shares "a b c d e" with doc 1
      (3L, "p q r s t"),       // unique single shingle
      (4L, "short doc")        // < 5 tokens -> no shingles
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramFraction(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((1L, 0L, 0.0)))
    assert(out(4L) === ((0L, 0L, -1.0))) // null fraction, not dropped
    // within-doc repetition is NOT cross-corpus duplication: a
    // shingle repeated inside one doc only counts once
    val rep = Seq((1L, "a b c d e a b c d e"), (2L, "z z z z z"))
      .toDF("doc_id", "text")
    val r2 = Dedup.duplicatedNgramFraction(rep, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(r2(1L) === 0L && r2(2L) === 0L)
  }

  test("lshPlanCurve: S-curve values, monotonicity, and band shift") {
    val out = Dedup.lshPlanCurve(spark, Seq((8, 16), (32, 4)),
        gridSteps = 20)
      .collect().map(r => ((r.getInt(0), r.getInt(1),
        r.getDouble(2)), r.getDouble(3))).toMap
    // closed-form replay with the same left-assoc multiply chain
    def chain(x: Double, n: Int): Double =
      (1 until n).foldLeft(x)((a, _) => a * x)
    for (((b, r, s), p) <- out)
      assert(p === 1.0 - chain(1.0 - chain(s, r), b), s"b=$b r=$r s=$s")
    // monotone increasing in s for each combo
    for ((b, r) <- Seq((8, 16), (32, 4))) {
      val curve = (1 until 20).map(i => out((b, r, i / 20.0)))
      assert(curve.zip(curve.tail).forall { case (a, c) => a <= c })
    }
    // more, shorter bands catch lower similarities: at s=0.5 the
    // (32,4) layout collides far more often than (8,16)
    assert(out((32, 4, 0.5)) > 0.8 && out((8, 16, 0.5)) < 0.001)
  }
}
