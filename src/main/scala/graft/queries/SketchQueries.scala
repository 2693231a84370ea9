package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._
import graft.operators.Sketches

/** Sketch suite — KMV / HyperLogLog cardinality estimation and
  * count-min point frequencies ([[graft.operators.Sketches]]), each
  * gated with the EXACT statistic alongside so the oracle
  * value-checks both the deterministic sketch replay and its
  * accuracy at this corpus size. Hashes are the md5-prefix device
  * (`conv(substr(md5(v),1,15),16,10)` ≡
  * `('0x'||substr(md5(v),1,15))::UBIGINT`), so DuckDB replays every
  * register / heap / counter bit-exactly.
  */
object SketchQueries {

  /** Whitespace tokens of `documents.text` (single-space split,
    * empties dropped) — the shared term stream for q192/q193. */
  private def docTokens(s: SparkSession, d: String): DataFrame =
    // fan the one-split documents scan out BEFORE the tokenize
    // explode (r15 StageProbe on q193: the tokenize+md5 stage ran on
    // 1 of 32 tasks); no-op once the scan splits naturally at scale
    graft.queries.Tables.fanOutForCompute(
        documents(s, d).select(col("lang"), col("text")))
      .select(col("lang"),
        explode(filter(split(col("text"), " "),
          x => length(x) > 0)).as("tok"))

  private val docTokensSql: String =
    """toks AS (
      |  SELECT lang,
      |    unnest(list_filter(string_split(text, ' '),
      |      x -> len(x) > 0)) AS tok
      |  FROM documents)""".stripMargin

  /** q191: KMV (k=128) distinct-customer estimate per order priority
    * vs the exact count — the groupwise COUNT(DISTINCT) a 100 TB
    * profiling pass replaces with a k-long mergeable sketch. */
  def q191KmvDistinct(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val est = Sketches.kmvDistinct(o, "o_orderpriority", "o_custkey",
      k = 128)
    val exact = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
    est.join(exact, "o_orderpriority")
      .select(col("o_orderpriority"), col("exact_distinct"),
        col("kmv_n"), col("kmv_est"))
      .orderBy(col("o_orderpriority"))
  }

  private val q191Oracle: String =
    """WITH h AS (
      |  SELECT DISTINCT o_orderpriority,
      |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
      |      ::UBIGINT::BIGINT AS h
      |  FROM orders),
      |r AS (
      |  SELECT o_orderpriority, h,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h)
      |      AS rn
      |  FROM h),
      |sk AS (
      |  SELECT o_orderpriority,
      |    COUNT(CASE WHEN rn <= 128 THEN 1 END) AS kmv_n,
      |    MAX(CASE WHEN rn <= 128 THEN h END) AS hk
      |  FROM r GROUP BY 1),
      |e AS (
      |  SELECT o_orderpriority,
      |    COUNT(DISTINCT o_custkey) AS exact_distinct
      |  FROM orders GROUP BY 1)
      |SELECT e.o_orderpriority, e.exact_distinct, sk.kmv_n,
      |  CASE WHEN sk.kmv_n < 128 THEN CAST(sk.kmv_n AS DOUBLE)
      |  ELSE floor(127e0 * 1152921504606846976e0 / CAST(sk.hk AS DOUBLE)
      |    * 1e9) / 1e9 END AS kmv_est
      |FROM e JOIN sk USING (o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin

  /** q192: HyperLogLog (m=1024) vocabulary-size estimate per document
    * language vs the exact distinct token count — the per-slice vocab
    * profile that runs in 1024 integers per group instead of a
    * distinct-token shuffle. */
  def q192HllVocab(s: SparkSession, d: String): DataFrame = {
    val toks = docTokens(s, d)
    val est = Sketches.hllDistinct(toks, "lang", "tok")
    val exact = toks.groupBy(col("lang"))
      .agg(countDistinct(col("tok")).as("exact_vocab"))
    est.join(exact, "lang")
      .select(col("lang"), col("exact_vocab"), col("hll_filled"),
        col("hll_est"))
      .orderBy(col("lang"))
  }

  private val q192Oracle: String =
    s"""WITH $docTokensSql,
       |h AS (
       |  SELECT lang,
       |    ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT AS h
       |  FROM toks),
       |regs AS (
       |  SELECT lang, h % 1024 AS b,
       |    MAX(CASE WHEN h // 1024 = 0 THEN 51
       |        ELSE 51 - length(bin(h // 1024)) END) AS r
       |  FROM h GROUP BY 1, 2),
       |st AS (
       |  SELECT lang, COUNT(*) AS filled,
       |    SUM(1::BIGINT << CAST(51 - r AS INT))::BIGINT AS zf
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT lang, filled,
       |    (0.7213e0 / (1e0 + 1.079e0 / 1024e0)) * 1024e0 * 1024e0
       |      * 2251799813685248e0
       |      / CAST(zf + (1024 - filled) * (1::BIGINT << 51) AS DOUBLE)
       |      AS rawE
       |  FROM st),
       |e AS (
       |  SELECT lang, COUNT(DISTINCT tok) AS exact_vocab FROM toks
       |  GROUP BY 1)
       |SELECT e.lang, e.exact_vocab, est.filled AS hll_filled,
       |  floor(CASE WHEN est.rawE <= 2560e0 AND est.filled < 1024
       |    THEN 1024e0 * (floor(ln(1024e0 /
       |      CAST(1024 - est.filled AS DOUBLE)) * 1e9) / 1e9)
       |    ELSE est.rawE END * 1e9) / 1e9 AS hll_est
       |FROM e JOIN est USING (lang)
       |ORDER BY lang""".stripMargin

  /** q193: count-min (d=4, w=256) point-frequency estimates for every
    * token with exact count ≥ 100, next to the exact counts — the
    * overestimate-only guarantee (est ≥ exact, within εN) is visible
    * in the gated values. */
  def q193CmsTermFreq(s: SparkSession, d: String): DataFrame = {
    val toks = docTokens(s, d).select(col("tok"))
    val exact = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("exact_cnt"))
    val probes = exact.filter(col("exact_cnt") >= 100)
    val est = Sketches.cmsEstimates(toks, "tok", probes, "tok",
      d = 4, w = 256)
    probes.join(est, "tok")
      .select(col("tok"), col("exact_cnt"), col("cms_est"))
      .orderBy(col("tok"))
  }

  private val q193Oracle: String =
    s"""WITH $docTokensSql,
       |cnt AS (
       |  SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY 1),
       |counters AS (
       |  SELECT i,
       |    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 8))
       |      ::UBIGINT::BIGINT % 256 AS b,
       |    COUNT(*) AS c
       |  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
       |  GROUP BY 1, 2),
       |probes AS (SELECT tok, exact_cnt FROM cnt WHERE exact_cnt >= 100),
       |pb AS (
       |  SELECT p.tok, i.i,
       |    ('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':' || p.tok),
       |      1, 8))::UBIGINT::BIGINT % 256 AS b
       |  FROM probes p
       |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i),
       |est AS (
       |  SELECT pb.tok, MIN(COALESCE(counters.c, 0)) AS cms_est
       |  FROM pb LEFT JOIN counters
       |    ON counters.i = pb.i AND counters.b = pb.b
       |  GROUP BY 1)
       |SELECT p.tok, p.exact_cnt, est.cms_est
       |FROM probes p JOIN est USING (tok)
       |ORDER BY tok""".stripMargin

  /** q196: KMV set algebra between per-language vocabulary sketches —
    * union / intersection / Jaccard estimated from the k=128 sketches
    * ALONE ([[graft.operators.Sketches.kmvSetOps]]), gated next to
    * the exact pairwise counts. */
  def q196SketchSetops(s: SparkSession, d: String): DataFrame = {
    val toks = docTokens(s, d)
    val ops = graft.operators.Sketches.kmvSetOps(toks, "lang", "tok",
      k = 128)
    val vt = toks.distinct()
    val inter = vt.select(col("lang").as("grp_a"), col("tok"))
      .join(vt.select(col("lang").as("grp_b"), col("tok")), Seq("tok"))
      .filter(col("grp_a") < col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val sizes = vt.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
    val pairs = sizes.select(col("lang").as("grp_a"), col("n").as("na"))
      .join(sizes.select(col("lang").as("grp_b"), col("n").as("nb")),
        col("grp_a") < col("grp_b"))
    val exact = pairs.join(inter, Seq("grp_a", "grp_b"), "left")
      .select(col("grp_a"), col("grp_b"),
        (col("na") + col("nb") - coalesce(col("exact_inter"), lit(0L)))
          .as("exact_union"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
    exact.join(ops, Seq("grp_a", "grp_b"))
      .select(col("grp_a"), col("grp_b"), col("exact_union"),
        col("exact_inter"), col("union_n"), col("est_union"),
        col("rho"), col("est_inter"), col("est_jaccard"))
      .orderBy(col("grp_a"), col("grp_b"))
  }

  private val q196Oracle: String =
    s"""WITH $docTokensSql,
       |h AS (
       |  SELECT DISTINCT lang,
       |    ('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT AS h
       |  FROM toks),
       |r AS (
       |  SELECT lang, h,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn
       |  FROM h),
       |sk AS (
       |  SELECT lang, list(h ORDER BY h) AS kmin
       |  FROM r WHERE rn <= 128 GROUP BY lang),
       |p AS (
       |  SELECT a.lang AS grp_a, b.lang AS grp_b,
       |    a.kmin AS ka, b.kmin AS kb,
       |    list_sort(list_distinct(list_concat(a.kmin, b.kmin)))[1:128]
       |      AS u
       |  FROM sk a JOIN sk b ON a.lang < b.lang),
       |q AS (
       |  SELECT grp_a, grp_b, CAST(len(u) AS BIGINT) AS union_n,
       |    u[len(u)] AS kth,
       |    CAST(len(list_filter(list_intersect(ka, kb),
       |      x -> x <= u[len(u)])) AS BIGINT) AS rho
       |  FROM p),
       |est AS (
       |  SELECT grp_a, grp_b, union_n, rho,
       |    CASE WHEN union_n < 128 THEN CAST(union_n AS DOUBLE)
       |      ELSE floor(127e0 * 1152921504606846976e0 /
       |        CAST(kth AS DOUBLE) * 1e9) / 1e9 END AS est_union
       |  FROM q),
       |est2 AS (
       |  SELECT grp_a, grp_b, union_n, est_union, rho,
       |    CASE WHEN union_n < 128 THEN CAST(rho AS DOUBLE)
       |      ELSE floor(CAST(rho AS DOUBLE) * est_union / 128e0 * 1e9)
       |        / 1e9 END AS est_inter,
       |    floor(CAST(rho AS DOUBLE) / CAST(union_n AS DOUBLE) * 1e9)
       |      / 1e9 AS est_jaccard
       |  FROM est),
       |vt AS (SELECT DISTINCT lang, tok FROM toks),
       |iv AS (
       |  SELECT a.lang AS grp_a, b.lang AS grp_b, COUNT(*) AS exact_inter
       |  FROM vt a JOIN vt b ON a.tok = b.tok AND a.lang < b.lang
       |  GROUP BY 1, 2),
       |sz AS (SELECT lang, COUNT(*) AS n FROM vt GROUP BY 1),
       |ex AS (
       |  SELECT a.lang AS grp_a, b.lang AS grp_b,
       |    a.n + b.n - COALESCE(iv.exact_inter, 0) AS exact_union,
       |    COALESCE(iv.exact_inter, 0) AS exact_inter
       |  FROM sz a JOIN sz b ON a.lang < b.lang
       |  LEFT JOIN iv ON iv.grp_a = a.lang AND iv.grp_b = b.lang)
       |SELECT ex.grp_a, ex.grp_b, ex.exact_union, ex.exact_inter,
       |  est2.union_n, est2.est_union, est2.rho, est2.est_inter,
       |  est2.est_jaccard
       |FROM ex JOIN est2 USING (grp_a, grp_b)
       |ORDER BY grp_a, grp_b""".stripMargin

  /** q197: sketched column profile of `orders`
    * ([[graft.operators.Profile.profileSketched]]) — exact null
    * accounting + HLL distinct estimates, gated next to the exact
    * distinct counts from the exact profiler. */
  def q197ProfileSketched(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
      "o_orderpriority", "o_orderstatus")
    val o = orders(s, d)
    val sk = graft.operators.Profile.profileSketched(o, cols)
    val ex = graft.operators.Profile.profile(o, cols)
      .select(col("column_name"), col("n_distinct"))
    sk.join(ex, "column_name")
      .select(col("column_name"), col("non_null"), col("nulls"),
        col("n_distinct"), col("distinct_est"))
      .orderBy(col("column_name"))
  }

  private val q197Oracle: String = {
    val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
      "o_orderpriority", "o_orderstatus")
    val stack = cols.map(c =>
      s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS v FROM orders")
      .mkString("\n  UNION ALL ")
    s"""WITH stacked AS (
       |  $stack),
       |cnts AS (
       |  SELECT column_name, COUNT(v) AS non_null,
       |    COUNT(*) - COUNT(v) AS nulls
       |  FROM stacked GROUP BY 1),
       |ex AS (
       |  SELECT column_name, COUNT(DISTINCT v) AS n_distinct
       |  FROM stacked GROUP BY 1),
       |h AS (
       |  SELECT column_name,
       |    ('0x' || substr(md5(v), 1, 15))::UBIGINT::BIGINT AS h
       |  FROM stacked WHERE v IS NOT NULL),
       |regs AS (
       |  SELECT column_name, h % 1024 AS b,
       |    MAX(CASE WHEN h // 1024 = 0 THEN 51
       |        ELSE 51 - length(bin(h // 1024)) END) AS r
       |  FROM h GROUP BY 1, 2),
       |st AS (
       |  SELECT column_name, COUNT(*) AS filled,
       |    SUM(1::BIGINT << CAST(51 - r AS INT))::BIGINT AS zf
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT column_name, filled,
       |    (0.7213e0 / (1e0 + 1.079e0 / 1024e0)) * 1024e0 * 1024e0
       |      * 2251799813685248e0
       |      / CAST(zf + (1024 - filled) * (1::BIGINT << 51) AS DOUBLE)
       |      AS rawE
       |  FROM st)
       |SELECT c.column_name, c.non_null, c.nulls, ex.n_distinct,
       |  floor(CASE WHEN est.rawE <= 2560e0 AND est.filled < 1024
       |    THEN 1024e0 * (floor(ln(1024e0 /
       |      CAST(1024 - est.filled AS DOUBLE)) * 1e9) / 1e9)
       |    ELSE est.rawE END * 1e9) / 1e9 AS distinct_est
       |FROM cnts c JOIN ex USING (column_name)
       |  JOIN est USING (column_name)
       |ORDER BY column_name""".stripMargin
  }

  private val Q314Quantiles =
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  /** q314: GK-sketch quantiles under the published rank guarantee
    * ([[Sketches.quantileRankCheck]]) — the 100 TB quantile path is
    * Spark's mergeable `approx_percentile` (one pass, no global
    * sort), whose ESTIMATES are merge-order dependent and therefore
    * ungateable; what IS gateable is the Greenwald–Khanna contract
    * itself: every estimate's rank must sit within ε·n of ⌈q·n⌉.
    * The engine computes the sketch, then independently rank-checks
    * each estimate against the raw values (one broadcast + one
    * aggregate pass for all 7 quantiles) and emits only the stable
    * (q, n_rows, within_bound) verdicts; the oracle asserts the
    * contract (the q306 ordering-gate device) — any run where the
    * sketch violated its bound flips the row red. ε = 1/accuracy =
    * 1/1000. */
  def q314ApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_extendedprice").as("v"))
    val qArr = Q314Quantiles.map(q => s"${q}D").mkString(", ")
    val ests = li
      .agg(expr(s"approx_percentile(v, array($qArr), 1000)")
        .as("ests"), count(lit(1)).as("n"))
      .select(posexplode(col("ests")).as(Seq("qi", "est")), col("n"))
      .select(element_at(array(Q314Quantiles.map(lit): _*),
        col("qi") + 1).as("q"), col("est"), col("n"))
    Sketches.quantileRankCheck(li, "v", ests, eps = 0.001)
      .orderBy(col("q"))
  }

  private val q314Oracle: String = {
    val vals = Q314Quantiles.map(q => s"(${q}e0)").mkString(", ")
    s"""WITH n AS (SELECT COUNT(*) AS n_rows FROM lineitem)
      |SELECT q, n.n_rows, TRUE AS within_bound
      |FROM (VALUES $vals) t(q) CROSS JOIN n
      |ORDER BY q""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q314_approx_quantiles" -> (q314ApproxQuantiles _),
    "q191_kmv_distinct" -> (q191KmvDistinct _),
    "q192_hll_vocab" -> (q192HllVocab _),
    "q193_cms_term_freq" -> (q193CmsTermFreq _),
    "q196_sketch_setops" -> (q196SketchSetops _),
    "q197_profile_sketched" -> (q197ProfileSketched _),
  )

  val oracle: Map[String, String] = Map(
    "q314_approx_quantiles" -> q314Oracle,
    "q191_kmv_distinct" -> q191Oracle,
    "q192_hll_vocab" -> q192Oracle,
    "q193_cms_term_freq" -> q193Oracle,
    "q196_sketch_setops" -> q196Oracle,
    "q197_profile_sketched" -> q197Oracle,
  )
}
