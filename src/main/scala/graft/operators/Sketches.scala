package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches — the sublinear-state
  * summaries a 100 TB profiling pass runs instead of exact
  * `COUNT(DISTINCT)` / full term counts (the reference's corpus-stats
  * jobs are exact because its corpora cap at ~50K chunks; at cluster
  * scale the exact forms are an expanded multi-distinct aggregate
  * whose shuffle carries every distinct value — these sketches carry
  * k values / 1024 registers / d·w counters per group, full stop).
  *
  * All three are the published classics: KMV / K-minimum-values
  * (Bar-Yossef et al. 2002; the Θ-sketch special case with θ = k-th
  * min), HyperLogLog (Flajolet et al. 2007), count-min (Cormode &
  * Muthukrishnan 2005). Each is implemented DETERMINISTICALLY so the
  * DuckDB oracle replays it bit-exactly — the hash is an md5-prefix
  * (`conv(substr(md5(v),1,15),16,10)` ≡ `('0x'||substr(md5(v),1,15))
  * ::UBIGINT`, the engine-portable device every hash-routing operator
  * in this repo uses; built-ins like `approx_count_distinct` or
  * DuckDB's `hash()` are engine-specific and would never gate):
  *
  *  - register/heap contents are integers (exact under any merge
  *    order);
  *  - the HLL harmonic sum is an INTEGER sum of 2^(51−rank) terms
  *    (Σ 2^-M_j would round order-dependently in doubles — scaled by
  *    2^51 every term and the total are exact longs, ≤ 2^61);
  *  - the only floats are final single-row divisions, truncated to 9
  *    decimals, and `ln` goes through the repo's ln-trunc9 discipline.
  *
  * Estimator error is pinned by SketchesSpec (KMV ~1/√k, HLL
  * ~1.04/√m, CMS overestimate-only with εN bound) and each gate query
  * carries the EXACT count next to the estimate so the oracle
  * value-checks both the sketch replay and its accuracy.
  */
object Sketches {

  /** 60-bit uniform hash: first 15 hex chars of md5. Non-negative,
    * engine-portable (DuckDB: `('0x'||substr(md5(v),1,15))::UBIGINT`). */
  def h60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  private def t9(x: Column): Column =
    floor(x * lit(1e9)).cast("double") / lit(1e9)

  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  /** Bounded SORTED vector of the k smallest DISTINCT hashes — the
    * KMV sketch state. Once the buffer is full, every hash ≥ the
    * current k-th minimum exits on an O(1) compare (the overwhelming
    * path on a big stream); candidates below it pay an O(k)
    * dedup+insert, k small by design. Merge folds one buffer into the
    * other, so partial aggregation is map-side and the shuffle
    * carries ≤ k longs per partition per group. The buffer is a plain
    * `Seq[Long]` under an ExpressionEncoder — Tungsten-serialized
    * like any array column, no Kryo (kryo buffers need JVM module
    * opens the serializer can't guarantee in every launcher). */
  class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], h: Long): Seq[Long] = {
      if (buf.length >= k && h >= buf.last) buf
      else if (buf.contains(h)) buf
      else {
        val idx = buf.indexWhere(_ > h)
        val pos = if (idx < 0) buf.length else idx
        val ins = buf.patch(pos, Seq(h), 0)
        if (ins.length > k) ins.dropRight(1) else ins
      }
    }
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(reduce)
    def finish(buf: Seq[Long]): Seq[Long] = buf
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Raw KMV sketch per group: (groupCol, kmin array<long>) — the k
    * smallest distinct hashes, sorted ascending. The mergeable
    * artifact behind [[kmvDistinct]] and [[kmvSetOps]]; persist it
    * per shard/snapshot and merge later (array_union + sort + trim)
    * instead of re-scanning the corpus. */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 128): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2 ($k)")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new KmvAgg(k).toColumn
    df.select(col(groupCol).cast("string").as("grp"),
        h60(col(valueCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.name("kmin"))
      .toDF(groupCol, "kmin")
  }

  /** KMV set algebra over every PAIR of group sketches (Beyer et al.
    * 2007): from the k-smallest-hash sketches of A and B alone —
    * without touching the raw data again —
    *
    *  - |A∪B|: the union sketch is the k smallest of kmin_A ∪ kmin_B
    *    (provably the KMV sketch of A∪B), estimated as in
    *    [[kmvDistinct]];
    *  - ρ = |kmin_A ∩ kmin_B ∩ union-sketch|, i.e. shared hashes at
    *    or below the union's k-th minimum — a k-sample of A∪B in
    *    which ρ/k estimates the Jaccard similarity;
    *  - |A∩B| = (ρ · est_union) / k.
    *
    * When the union sketch is not full both input sketches are
    * complete, so union/intersection counts are EXACT (and the
    * estimators below reduce to them). All arithmetic is the trunc9 /
    * IEEE-ordered discipline, replayed by the oracle.
    *
    * Intended for a BOUNDED group set (languages, sources, shards —
    * the profiling regime); the pair join is a self-join on k-long
    * arrays, |G|² pairs of O(k) work each.
    *
    * Output: (grp_a, grp_b, union_n, est_union, rho, est_inter,
    * est_jaccard) for grp_a < grp_b, ordered by (grp_a, grp_b). */
  def kmvSetOps(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 128): DataFrame = {
    val sk = kmvSketch(df, groupCol, valueCol, k)
    val a = sk.select(col(groupCol).as("grp_a"), col("kmin").as("ka"))
    val b = sk.select(col(groupCol).as("grp_b"), col("kmin").as("kb"))
    val u = slice(array_sort(array_union(col("ka"), col("kb"))), 1, k)
    val pairs = a.join(b, col("grp_a") < col("grp_b"))
      .withColumn("u", u)
      .withColumn("union_n", size(col("u")).cast("long"))
      .withColumn("kth", element_at(col("u"), size(col("u"))))
      .withColumn("rho",
        size(filter(array_intersect(col("ka"), col("kb")),
          x => x <= col("kth"))).cast("long"))
    val full = col("union_n") === k
    val estU = when(!full, col("union_n").cast("double"))
      .otherwise(t9(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
        col("kth").cast("double")))
    pairs
      .withColumn("est_union", estU)
      .withColumn("est_inter",
        when(!full, col("rho").cast("double"))
          .otherwise(t9(col("rho").cast("double") * col("est_union") /
            lit(k.toDouble))))
      .withColumn("est_jaccard",
        t9(col("rho").cast("double") / col("union_n").cast("double")))
      .select(col("grp_a"), col("grp_b"), col("union_n"),
        col("est_union"), col("rho"), col("est_inter"),
        col("est_jaccard"))
      .orderBy(col("grp_a"), col("grp_b"))
  }

  /** KMV distinct-count estimate per group: keep the k smallest
    * distinct 60-bit hashes; with h_(k) the k-th smallest,
    * est = (k−1) · 2^60 / h_(k) (the classic unbiased form — the k-th
    * order statistic of n uniform draws sits at ≈ k/(n+1) of the
    * range). Fewer than k distinct hashes ⇒ the sketch IS the exact
    * distinct set and the estimate is its size.
    *
    * Output: (groupCol, kmv_n, kmv_est) — kmv_n = sketch fill
    * (min(k, distinct)), kmv_est truncated to 9 decimals. Callers
    * wanting accuracy eval join the exact distinct count alongside
    * (the q191 gate does).
    *
    * Scale: ONE hash-aggregate whose state is ≤ k longs per group —
    * vs exact count-distinct's shuffle of every distinct value. The
    * sketch column is also mergeable across corpus shards (union =
    * merge), which is what makes it a profiling artifact worth
    * persisting. */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 128): DataFrame = {
    kmvSketch(df, groupCol, valueCol, k)
      .select(col(groupCol),
        size(col("kmin")).cast("long").as("kmv_n"),
        element_at(col("kmin"), size(col("kmin"))).as("hk"))
      .select(col(groupCol), col("kmv_n"),
        when(col("kmv_n") < k, col("kmv_n").cast("double"))
          .otherwise(t9(lit((k - 1).toDouble) * lit(math.pow(2, 60)) /
            col("hk").cast("double")))
          .as("kmv_est"))
      .orderBy(col(groupCol))
  }

  /** HyperLogLog distinct-count estimate per group, m = 1024
    * registers (p = 10): register = h mod 1024, and the register
    * value is the leading-zero rank of the remaining 50-bit word
    * (rank = 51 − len(bin(w)), 51 for w = 0 — `bin` drops leading
    * zeros in both engines, so len(bin(w)) = ⌊log2 w⌋+1 exactly).
    *
    * Estimate: E = α_m · m² · 2^51 / Z_int with
    * Z_int = Σ_j 2^(51−M_j) over all 1024 registers (empty ⇒ 2^51) —
    * the harmonic-mean sum kept INTEGER (≤ 2^61) so aggregation
    * order can't round it. Small-range correction (Flajolet §4): when
    * E ≤ 2.5m and V = empty registers > 0, linear counting
    * m·ln(m/V) (ln trunc9) replaces E.
    *
    * Output: (groupCol, hll_filled, hll_est) — filled register count
    * and the 9-decimal-truncated estimate.
    *
    * Scale: state is ≤ 1024 (register, max-rank) pairs per group with
    * map-side partials; the register table is mergeable across shards
    * by register-wise MAX. */
  def hllDistinct(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val regs = hllRegisters(df, groupCol, valueCol)
    hllEstimate(regs, groupCol).orderBy(col(groupCol))
  }

  /** The HLL register table alone: max-rank rows `(grp, b, r)` for
    * `valueCol` per group — the mergeable state [[hllDistinct]]
    * estimates from, exposed so iterative consumers (the
    * [[Graph.hyperBall]] neighborhood sketches) can UNION register
    * tables across rounds and re-estimate. */
  def hllRegisters(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val h = h60(col(valueCol))
    val w = expr("_hll_h div 1024")
    df.select(col(groupCol).cast("string").as("grp"), h.as("_hll_h"))
      .select(col("grp"), (col("_hll_h") % 1024).as("b"),
        when(w === 0, lit(51))
          .otherwise(lit(51) - length(bin(w))).as("rank"))
      .groupBy(col("grp"), col("b")).agg(max(col("rank")).as("r"))
  }

  /** Estimate from a `(grp, b, r)` register table (the exact
    * [[hllDistinct]] arithmetic: integer harmonic sum, α_m bias,
    * linear-counting small-range correction, 9-decimal truncation).
    * Returns `(groupCol, hll_filled, hll_est)`, unordered. */
  def hllEstimate(regs: DataFrame, groupCol: String): DataFrame = {
    val m = 1024
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(1024.0))
    val stats = regs.groupBy(col("grp")).agg(
      count(lit(1)).as("filled"),
      sum(expr("shiftleft(1L, CAST(51 - r AS INT))")).as("zf"))
    val zInt = col("zf") + (lit(m.toLong) - col("filled")) *
      lit(1L << 51)
    val rawE = alpha * lit(m.toDouble) * lit(m.toDouble) *
      lit(math.pow(2, 51)) / zInt.cast("double")
    val v = lit(m.toLong) - col("filled")
    stats.select(col("grp").as(groupCol), col("filled").as("hll_filled"),
      t9(when(rawE <= lit(2.5 * m) && v > 0,
        lit(m.toDouble) * ln9(lit(m.toDouble) / v.cast("double")))
        .otherwise(rawE)).as("hll_est"))
  }

  /** Count-min frequency sketch: d hash rows × w buckets of exact
    * counts; bucket_i(t) = md5-hash of "i:t" mod w, estimate =
    * min_i counter[i][bucket_i(t)]. Overestimates only (collisions
    * add), within εN (ε = e/w) with probability 1−e^-d — the
    * streaming-standard point-frequency summary next to the repo's
    * Misra-Gries heavy hitters (MG keeps the top survivors; CMS
    * answers ANY point query from d·w integers).
    *
    * Returns (`termCol`, cms_est) for every probe term — join exact
    * counts alongside to eval (the q193 gate does). Build is one
    * d·|terms| explode + hash-aggregate into ≤ d·w counter rows;
    * probes then broadcast-join the counter table d times each and
    * take the min. */
  def cmsEstimates(terms: DataFrame, termCol: String,
      probes: DataFrame, probeCol: String, d: Int = 4,
      w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 2, s"cms needs d >= 1, w >= 2 ($d, $w)")
    def bucket(t: Column, i: Column): Column =
      conv(substring(md5(concat(i.cast("string"), lit(":"),
        t.cast("string"))), 1, 8), 16, 10).cast("long") % w
    val rows = explode(sequence(lit(0), lit(d - 1))).as("i")
    val counters = terms
      .select(col(termCol).cast("string").as("t"))
      .select(col("t"), rows)
      .select(col("i"), bucket(col("t"), col("i")).as("b"))
      .groupBy(col("i"), col("b")).agg(count(lit(1)).as("cnt"))
    val probed = probes
      .select(col(probeCol).cast("string").as("p")).distinct()
      .select(col("p"), rows)
      .select(col("p"), col("i"), bucket(col("p"), col("i")).as("b"))
    probed
      .join(counters, Seq("i", "b"), "left")
      .groupBy(col("p"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
      .select(col("p").as(termCol), col("cms_est"))
      .orderBy(col(termCol))
  }

  /** Rank-guarantee check for approximate quantile estimates
    * (Greenwald–Khanna 2001 — the sketch behind Spark's
    * `approx_percentile`): an estimate for quantile q over n values
    * must occupy a rank within ε·n of ⌈q·n⌉. `ests` supplies one
    * (q, est, n) row per probed quantile; the check joins every
    * estimate against the value stream ONCE (one broadcast + one
    * aggregate pass for ALL quantiles — never a per-quantile scan)
    * and reports whether the estimate's rank interval
    * [#{v < est}+1, #{v ≤ est}] intersects the allowed band.
    *
    * This is the CONTRACT half of a sketch gate: the estimates
    * themselves are merge-order dependent (any mergeable sketch's
    * are), but the guarantee is not — within_bound is stable run to
    * run, which is what lets a driver gate sit on top of a
    * nondeterministic sketch. */
  def quantileRankCheck(values: DataFrame, valueCol: String,
      ests: DataFrame, eps: Double): DataFrame = {
    require(eps > 0 && eps < 1, "eps in (0, 1)")
    values.select(col(valueCol).as("__v"))
      .crossJoin(broadcast(ests.select(col("q"), col("est"),
        col("n"))))
      .groupBy(col("q"), col("n"))
      .agg(
        sum(when(col("__v") < col("est"), lit(1L)).otherwise(lit(0L)))
          .as("__rlo"),
        sum(when(col("__v") <= col("est"), lit(1L))
          .otherwise(lit(0L))).as("__rhi"))
      .select(col("q"), col("n").as("n_rows"),
        ((col("__rlo") + lit(1L)).cast("double") <=
          ceil(col("q") * col("n")).cast("double") +
            lit(eps) * col("n") &&
          col("__rhi").cast("double") >=
            ceil(col("q") * col("n")).cast("double") -
              lit(eps) * col("n")).as("within_bound"))
  }
}
