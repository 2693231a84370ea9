package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the gear/FastCDC family — Xia et al.
  * 2016): split text at positions where a rolling content hash hits
  * a boundary pattern, so chunk boundaries SURVIVE insertions and
  * deletions — the property that makes chunk-hash dedup robust
  * across near-identical documents where fixed-size windows would
  * misalign after one edit. This is the chunking layer under
  * suffix/ExactSubstr-style corpus dedup at 100 TB.
  *
  * Hash: the gear recurrence h ← (2·h + code(c)) mod 2^20. Because
  * the multiplier is 2, a character j positions back contributes
  * code·2^j, which vanishes mod 2^20 once j ≥ 20 — the recurrence
  * IS a sliding 20-char window hash with no explicit subtraction,
  * so the hash, the boundary test, and the min/max size rule all
  * ride ONE O(n) in-row fold whose state is (h, last boundary,
  * boundary list). No second pass, no per-position array — and
  * nothing for CollapseProject to inline quadratically (the lesson:
  * a column referenced inside a higher-order-function lambda gets
  * substituted into the loop body; keep per-element state IN the
  * fold). Codes are `ascii` code points — ASCII/BMP corpora;
  * pre-normalize wider text upstream, as [[SuffixArray]] documents.
  *
  * Boundaries: h ≡ 0 mod `divisor` (mean chunk ≈ divisor chars)
  * accepted only ≥ `minSize` after the previous boundary; a
  * boundary is FORCED at `maxSize` (FastCDC's normalized-size
  * bounds). Per-doc cost is O(n) fold steps plus O(n/minSize)
  * boundary-list rebuilds per accepted boundary.
  *
  * Output: one row per chunk (idCol, chunk_idx, start, chunk_len,
  * chunk_md5) — start 0-based; the md5 carries chunk identity into
  * dedup joins without materializing chunk text twice. Empty
  * documents yield no rows. */
object Cdc {

  def chunks(docs: DataFrame, idCol: String, textCol: String,
      divisor: Int = 64, minSize: Int = 16,
      maxSize: Int = 256): DataFrame = {
    require(divisor >= 2 && minSize >= 1 && maxSize > minSize,
      s"need divisor >= 2, 1 <= minSize < maxSize " +
        s"($divisor, $minSize, $maxSize)")
    val mod = 1 << 20
    // ONE expression end to end: the fold input is the pre-computed
    // code-point array (ascii evaluated once per char, no substring
    // seek per step), the finish lambda closes the boundary list AND
    // emits the (start, end) spans — so the O(n) fold is evaluated
    // exactly once (any separate helper column would be
    // CollapseProject-inlined into every consumer; the closed list
    // `bs2` is re-evaluated a few times inside the O(b)-element
    // finish, an O(b²) cost with b = boundary count — negligible)
    val bs2 = "if(acc.last = n and size(acc.bs) > 0, acc.bs, " +
      "concat(acc.bs, array(cast(n as int))))"
    val spansExpr =
      s"""aggregate(
         |  transform(split(t, ''), ch -> ascii(ch)),
         |  named_struct('i', 0, 'h', cast(0 as long), 'last', 0,
         |    'bs', cast(array() as array<int>)),
         |  (acc, c) -> if(acc.i + 1 - acc.last >= $maxSize
         |      or (acc.i + 1 - acc.last >= $minSize
         |        and (acc.h * 2 + c) % $mod % $divisor = 0),
         |    named_struct('i', acc.i + 1,
         |      'h', (acc.h * 2 + c) % $mod,
         |      'last', acc.i + 1,
         |      'bs', concat(acc.bs, array(acc.i + 1))),
         |    named_struct('i', acc.i + 1,
         |      'h', (acc.h * 2 + c) % $mod,
         |      'last', acc.last, 'bs', acc.bs)),
         |  acc -> transform(sequence(1, size($bs2)),
         |    gi -> named_struct(
         |      's', if(gi = 1, 0, element_at($bs2, gi - 1)),
         |      'e', element_at($bs2, gi))))""".stripMargin
    // the per-character boundary fold is the whole cost of this
    // operator; a one-split documents scan would run it on a single
    // core (r15 StageProbe on q218: 3.9 s of a 10.6 s row on 1 of 32
    // tasks) — fan the narrow scan out first (no-op once the scan
    // splits naturally at scale)
    graft.GraftSession.fanOutForCompute(docs
        .select(col(idCol), col(textCol).as("t"),
          length(col(textCol)).as("n")))
      .filter(col("n") > 0)
      .withColumn("spans", expr(spansExpr))
      .select(col(idCol), col("t"),
        posexplode(col("spans")).as(Seq("chunk_idx", "sp")))
      .select(col(idCol),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("sp.s").cast("long").as("start"),
        (col("sp.e") - col("sp.s")).cast("long").as("chunk_len"),
        md5(expr("substring(t, sp.s + 1, sp.e - sp.s)"))
          .as("chunk_md5"))
  }

  /** Chunk-hash near-dup pairs — the dedup join [[chunks]] exists
    * to feed: documents sharing content-defined chunks, found by an
    * inverted index over chunk md5s. Because boundaries are
    * content-defined, a shared span keeps producing IDENTICAL chunk
    * hashes even when its position shifts between documents — the
    * property that makes this robust where fixed windows misalign.
    *
    * Hot hashes (boilerplate chunks appearing in > `maxDf` docs)
    * are dropped BEFORE the pair join, the same skew guard as the
    * shingle index ([[Dedup.jaccardPairsWide]]); remaining posting
    * lists bound pair work. Output: (id_a, id_b, shared_chunks,
    * shared_chars), id_a < id_b, only pairs sharing ≥ `minShared`
    * chunks. */
  def sharedChunkPairs(docs: DataFrame, idCol: String,
      textCol: String, divisor: Int = 64, minSize: Int = 16,
      maxSize: Int = 256, maxDf: Int = 50,
      minShared: Int = 2): DataFrame = {
    require(maxDf >= 2 && minShared >= 1,
      s"maxDf >= 2, minShared >= 1 ($maxDf, $minShared)")
    val ch = chunks(docs, idCol, textCol, divisor, minSize, maxSize)
      .select(col(idCol).as("doc"), col("chunk_md5"),
        col("chunk_len"))
      // one row per (doc, hash): a chunk repeated WITHIN a doc
      // counts once toward a cross-doc pair
      .groupBy(col("doc"), col("chunk_md5"))
      .agg(max(col("chunk_len")).as("chunk_len"))
    val cool = ch
      .withColumn("_df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("chunk_md5"))))
      .filter(col("_df") <= maxDf)
      .drop("_df")
    cool.as("a")
      .join(cool.as("b"),
        col("a.chunk_md5") === col("b.chunk_md5") &&
          col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("shared_chunks"),
        sum(col("a.chunk_len")).as("shared_chars"))
      .filter(col("shared_chunks") >= minShared)
  }
}
