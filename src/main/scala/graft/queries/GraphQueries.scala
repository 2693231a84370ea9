package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Link-analysis suite over the customer→supplier endorsement graph
  * (distinct (o_custkey → l_suppkey) pairs through orders⋈lineitem):
  * the graph workload a corpus pipeline runs to weight sources by
  * centrality (host/domain quality priors). Algorithms in
  * [[graft.operators.Graph]]; oracles are the same fixed number of
  * iterations UNROLLED into chained CTEs, so DuckDB replays every
  * round value-exactly (12-decimal truncation + DECIMAL(18,15) sums
  * make each round engine- and partitioning-deterministic).
  */
object GraphQueries {

  /** Distinct customer→supplier endorsement edges. */
  private def edgesDf(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))

  /** Co-order part pairs (src < dst, raw — the Graph operators all
    * canonicalize + dedup their input): each order's part set is
    * packed ONCE (collect_set per order, one keyed shuffle) and the
    * ordered pairs stream out of codegen generators
    * (posexplode + explode(slice(tail))). The previous lineitem
    * self-join on l_orderkey shuffled the table twice, sort-merged
    * it, and generated BOTH orders of every pair before the pa < pb
    * filter — measured 2.6× slower at the 10× SF (r13 profile);
    * the pair SET is identical. Shared by q179/q186/q188/q190/q195. */
  private def coOrderEdges(s: SparkSession, d: String,
      minQty: Option[Int] = None): DataFrame = {
    val base = lineitem(s, d)
    val li = minQty.map(q => base.filter(col("l_quantity") >= q))
      .getOrElse(base)
    li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "src")))
      .select(col("src"), explode(slice(col("ps"), col("i") + 2,
        size(col("ps")))).as("dst"))
  }

  /** q162: 5-round PageRank (d=0.85, no dangling redistribution)
    * over the endorsement graph — see [[graft.operators.Graph.pageRank]]
    * for the per-iteration shuffle budget and checkpoint discipline. */
  def q162PageRank(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.pageRank(edgesDf(s, d))

  /** q224: 5-round WEIGHTED PageRank over the endorsement graph
    * with edge multiplicity as the weight (how many line items a
    * customer bought from a supplier) —
    * [[graft.operators.Graph.pageRankWeighted]]; the uniform q162
    * flattens a 50-lineitem relationship to the same pull as a
    * 1-lineitem one, the weighted walk does not. */
  def q224PageRankWeighted(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.pageRankWeighted(
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .agg(count(lit(1)).cast("long").as("w")),
      "w")

  /** Weighted-PageRank oracle rounds over an `ew(src, dst, w)` CTE
    * the caller supplies (q224: the endorsement graph; q234: the
    * outlink web graph extracted from raw HTML). */
  private def wprOracleFrom(ewPrefix: String,
      finalSelect: String = "SELECT node, pr FROM wpr5 ORDER BY node")
      : String = {
    val rounds = (1 to 5).map { i =>
      s"""wpr$i AS MATERIALIZED (
         |  SELECT n.node,
         |    floor((0.15 / wcnt.nn + 0.85 * COALESCE(s$i.m, 0.0))
         |      * 1e12) / 1e12 AS pr
         |  FROM wnodes n CROSS JOIN wcnt
         |  LEFT JOIN (
         |    SELECT ew.dst,
         |      CAST(SUM(CAST(p.pr * ew.w / od.wsum
         |        AS DECIMAL(18,15))) AS DOUBLE) AS m
         |    FROM ew JOIN wpr${i - 1} p ON ew.src = p.node
         |           JOIN wod od ON ew.src = od.onode
         |    GROUP BY ew.dst) s$i ON s$i.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $ewPrefix,
       |wnodes AS MATERIALIZED (
       |  SELECT src AS node FROM ew UNION SELECT dst FROM ew),
       |wcnt AS MATERIALIZED (SELECT COUNT(*) AS nn FROM wnodes),
       |wod AS (SELECT src AS onode, CAST(SUM(w) AS BIGINT) AS wsum
       |  FROM ew GROUP BY 1),
       |wpr0 AS (
       |  SELECT node, floor((1.0 / nn) * 1e12) / 1e12 AS pr
       |  FROM wnodes CROSS JOIN wcnt),
       |$rounds
       |$finalSelect""".stripMargin
  }

  private val q224Oracle: String = wprOracleFrom(
    """ew AS MATERIALIZED (
       |  SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2)""".stripMargin)

  /** q234: WEB AUTHORITY composed end-to-end from raw HTML — the
    * q232 extraction chain (script strip → href regex → host
    * resolution) aggregated to a weighted host graph and pushed
    * through the SAME 5-round weighted PageRank as q224: the "which
    * domains does the corpus itself endorse" signal real web-curation
    * pipelines rank crawl frontiers and source weights by. The oracle
    * chains the q232 CTEs into the q224 round replay — the hash match
    * proves the COMPOSITION, not just the parts. */
  def q234WebAuthority(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.pageRankWeighted(
      CorpusQueries.outlinkResolved(s, d)
        .groupBy(col("src_host").as("src"), col("dst_host").as("dst"))
        .agg(count(lit(1)).cast("long").as("w")),
      "w")

  private val q234Oracle: String = wprOracleFrom(
    s"""${CorpusQueries.OutlinkCtes},
       |ew AS MATERIALIZED (
       |  SELECT src_host AS src, dst_host AS dst,
       |    CAST(COUNT(*) AS BIGINT) AS w
       |  FROM e GROUP BY 1, 2)""".stripMargin)

  /** q285: TextRank keyword extraction (Mihalcea & Tarau 2004) —
    * the corpus token co-occurrence graph (adjacent-token window,
    * symmetrized, co-occurrence count as edge weight) pushed through
    * the SAME 5-round weighted PageRank as q224/q234, top-30 tokens
    * by rank with a (pr DESC, token) tie-break. The graph-centrality
    * keyphrase ranker that needs no training data; composition is
    * hash-proven end-to-end by chaining the pair CTEs into the q224
    * round replay. */
  def q285TextrankKeywords(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.pageRankWeighted(tokenCoocEdges(s, d), "w")
      .orderBy(col("pr").desc, col("node")).limit(30)

  /** The symmetrized adjacent-token co-occurrence graph over
    * `documents` — shared by q285 (TextRank) and q286 (HyperBall):
    * `(src, dst, w)` with w = co-occurrence count, self-pairs
    * dropped. */
  private def tokenCoocEdges(s: SparkSession, d: String): DataFrame = {
    val tk = split(col("text"), " ")
    val pairs = documents(s, d)
      .select(explode(zip_with(
        slice(tk, lit(1), size(tk) - 1),
        slice(tk, lit(2), size(tk) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"),
        col("a").as("dst")))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).cast("long").as("w"))
  }

  /** The q285/q286 shared oracle CTEs ending at `ew(src, dst, w)` —
    * the exact [[tokenCoocEdges]] replay. */
  private val TokenEdgeCtes: String =
    """tokp AS (
      |  SELECT string_split(text, ' ') AS tk FROM documents),
      |adjp AS MATERIALIZED (
      |  SELECT tk[i] AS a, tk[i + 1] AS b
      |  FROM tokp, LATERAL unnest(
      |    generate_series(1, len(tk) - 1)) t(i)
      |  WHERE tk[i] <> tk[i + 1]),
      |ew AS MATERIALIZED (
      |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM (
      |    SELECT a AS src, b AS dst FROM adjp
      |    UNION ALL SELECT b AS src, a AS dst FROM adjp)
      |  GROUP BY 1, 2)""".stripMargin

  private val q285Oracle: String = wprOracleFrom(TokenEdgeCtes,
    finalSelect =
      "SELECT node, pr FROM wpr5 ORDER BY pr DESC, node LIMIT 30")

  /** q286: HyperBall neighborhood function + harmonic centrality
    * ([[graft.operators.Graph.hyperBall]], 4 rounds) over the same
    * token co-occurrence graph — per-token reach estimates at
    * radius 4 and the Σ(|B_t|−|B_{t−1}|)/t harmonic score, all from
    * HLL register merges (no per-node BFS). The oracle replays every
    * register table and every estimate round bit-identically. */
  def q286Hyperball(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.hyperBall(
        tokenCoocEdges(s, d).select(col("src"), col("dst")),
        rounds = 4)
      .orderBy(col("node"))

  /** The full q286/q287 shared HyperBall CTE chain: token edges →
    * register tables hregs0..4 → per-node estimates hest0..4. */
  private val HyperballCtes: String = {
    def estCte(t: Int): String =
      s"""hest$t AS MATERIALIZED (
        |  SELECT node,
        |    floor(CASE WHEN rawE <= 2560e0 AND filled < 1024
        |      THEN 1024e0 * (floor(ln(1024e0 /
        |        CAST(1024 - filled AS DOUBLE)) * 1e9) / 1e9)
        |      ELSE rawE END * 1e9) / 1e9 AS est
        |  FROM (
        |    SELECT node, filled,
        |      (0.7213e0 / (1e0 + 1.079e0 / 1024e0)) * 1024e0 * 1024e0
        |        * 2251799813685248e0
        |        / CAST(zf + (1024 - filled) * (1::BIGINT << 51)
        |            AS DOUBLE) AS rawE
        |    FROM (
        |      SELECT node, COUNT(*) AS filled,
        |        SUM(1::BIGINT << CAST(51 - r AS INT))::BIGINT AS zf
        |      FROM hregs$t GROUP BY 1)))""".stripMargin
    val rounds = (1 to 4).map { t =>
      s"""hregs$t AS MATERIALIZED (
        |  SELECT node, b, MAX(r) AS r FROM (
        |    SELECT e.src AS node, p.b, p.r
        |    FROM hedges e JOIN hregs${t - 1} p ON e.dst = p.node
        |    UNION ALL SELECT node, b, r FROM hregs${t - 1})
        |  GROUP BY 1, 2),
        |${estCte(t)}""".stripMargin
    }.mkString(",\n")
    s"""$TokenEdgeCtes,
      |hedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ew),
      |hnodes AS MATERIALIZED (
      |  SELECT src AS node FROM hedges
      |  UNION SELECT dst FROM hedges),
      |hregs0 AS MATERIALIZED (
      |  SELECT node, h % 1024 AS b,
      |    MAX(CASE WHEN h // 1024 = 0 THEN 51
      |      ELSE 51 - length(bin(h // 1024)) END) AS r
      |  FROM (
      |    SELECT node,
      |      ('0x' || substr(md5(node), 1, 15))::UBIGINT::BIGINT AS h
      |    FROM hnodes)
      |  GROUP BY 1, 2),
      |${estCte(0)},
      |$rounds""".stripMargin
  }

  private val q286Oracle: String = {
    val harmonic = (1 to 4)
      .map(t => s"floor((hest$t.est - hest${t - 1}.est) " +
        s"/ ${t}e0 * 1e9) / 1e9")
      .mkString(" + ")
    s"""WITH $HyperballCtes
      |SELECT hest0.node, hest4.est AS ball_est,
      |  $harmonic AS harmonic_est
      |FROM hest0
      |  JOIN hest1 ON hest0.node = hest1.node
      |  JOIN hest2 ON hest0.node = hest2.node
      |  JOIN hest3 ON hest0.node = hest3.node
      |  JOIN hest4 ON hest0.node = hest4.node
      |ORDER BY hest0.node""".stripMargin
  }

  /** q287: the HyperBall graph-level profile
    * ([[graft.operators.Graph.hyperBallProfile]]) — the neighborhood
    * function N(t) per radius with its fraction of N(4), plus the
    * 90%-interpolated EFFECTIVE DIAMETER (the statistic HyperBall
    * exists to compute at web scale), over the same token graph. */
  def q287HyperballProfile(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.hyperBallProfile(
        tokenCoocEdges(s, d).select(col("src"), col("dst")),
        rounds = 4)
      .orderBy(col("t"))

  private val q287Oracle: String = {
    val profRows = (0 to 4).map { t =>
      s"""SELECT CAST($t AS BIGINT) AS t,
        |      floor(CAST(SUM(CAST(est AS DECIMAL(38,9))) AS DOUBLE)
        |        * 1e9) / 1e9 AS total FROM hest$t""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH $HyperballCtes,
      |prof AS MATERIALIZED (
      |  $profRows),
      |fin AS (SELECT MAX(CASE WHEN t = 4 THEN total END)
      |    AS final_total FROM prof),
      |rowsx AS (
      |  SELECT t, total,
      |    floor(total / final_total * 1e9) / 1e9 AS frac,
      |    lag(total) OVER (ORDER BY t) AS prev, final_total
      |  FROM prof, fin),
      |eff AS (
      |  SELECT CASE WHEN prev IS NULL OR total <= prev
      |      THEN CAST(t AS DOUBLE)
      |      ELSE t - 1 + (final_total * 0.9 - prev) / (total - prev)
      |    END AS eff_diameter
      |  FROM rowsx WHERE total >= final_total * 0.9
      |  ORDER BY t LIMIT 1)
      |SELECT rowsx.t, rowsx.total AS total_reach, rowsx.frac,
      |  eff.eff_diameter
      |FROM rowsx, eff ORDER BY rowsx.t""".stripMargin
  }

  /** q163: 5-round HITS (max-normalized) over the same graph — the
    * auth side ranks suppliers by weighted endorsement, the hub side
    * ranks customers by breadth of good suppliers. */
  def q163Hits(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.hits(edgesDf(s, d))

  private val edgeCtes: String =
    """e AS MATERIALIZED (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |nodes AS MATERIALIZED (
      |  SELECT src AS node FROM e UNION SELECT dst FROM e),
      |cnt AS MATERIALIZED (SELECT COUNT(*) AS nn FROM nodes)""".stripMargin

  /** PageRank oracle: pr0 (uniform) then five unrolled update CTEs,
    * each the exact Spark expression shape. */
  private val q162Oracle: String = {
    val rounds = (1 to 5).map { i =>
      s"""pr$i AS MATERIALIZED (
         |  SELECT n.node,
         |    floor((0.15 / cnt.nn + 0.85 * COALESCE(s$i.m, 0.0)) * 1e12)
         |      / 1e12 AS pr
         |  FROM nodes n CROSS JOIN cnt
         |  LEFT JOIN (
         |    SELECT e.dst,
         |      CAST(SUM(CAST(p.pr / od.deg AS DECIMAL(18,15))) AS DOUBLE)
         |        AS m
         |    FROM e JOIN pr${i - 1} p ON e.src = p.node
         |           JOIN outdeg od ON e.src = od.onode
         |    GROUP BY e.dst) s$i ON s$i.dst = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |outdeg AS (SELECT src AS onode, COUNT(*) AS deg FROM e GROUP BY 1),
       |pr0 AS (
       |  SELECT node, floor((1.0 / nn) * 1e12) / 1e12 AS pr
       |  FROM nodes CROSS JOIN cnt),
       |$rounds
       |SELECT node, pr FROM pr5 ORDER BY node""".stripMargin
  }

  /** HITS oracle: h0 = 1.0, then five unrolled (auth, hub) rounds.
    * Every per-round CTE is MATERIALIZED: each is referenced twice
    * (raw by max and by the normalize), and DuckDB's default CTE
    * inlining would re-evaluate the whole chain per reference —
    * exponential in the round count (measured: round 5 never
    * finishes). Materialization restores the linear replay the
    * Spark loop (localCheckpoint per round) performs. */
  private val q163Oracle: String = {
    val rounds = (1 to 5).map { i =>
      s"""a${i}raw AS MATERIALIZED (
         |  SELECT e.dst, CAST(SUM(CAST(h.hub AS DECIMAL(18,15)))
         |    AS DOUBLE) AS a
         |  FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY e.dst),
         |a${i}max AS MATERIALIZED (SELECT MAX(a) AS am FROM a${i}raw),
         |a$i AS MATERIALIZED (
         |  SELECT n.node,
         |    floor((COALESCE(r.a, 0.0) / x.am) * 1e12) / 1e12 AS auth
         |  FROM nodes n LEFT JOIN a${i}raw r ON r.dst = n.node
         |  CROSS JOIN a${i}max x),
         |h${i}raw AS MATERIALIZED (
         |  SELECT e.src, CAST(SUM(CAST(a.auth AS DECIMAL(18,15)))
         |    AS DOUBLE) AS h
         |  FROM e JOIN a$i a ON e.dst = a.node GROUP BY e.src),
         |h${i}max AS MATERIALIZED (SELECT MAX(h) AS hm FROM h${i}raw),
         |h$i AS MATERIALIZED (
         |  SELECT n.node,
         |    floor((COALESCE(r.h, 0.0) / x.hm) * 1e12) / 1e12 AS hub
         |  FROM nodes n LEFT JOIN h${i}raw r ON r.src = n.node
         |  CROSS JOIN h${i}max x)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |h0 AS (SELECT node, 1.0 AS hub FROM nodes),
       |$rounds
       |SELECT a5.node, a5.auth, h5.hub
       |FROM a5 JOIN h5 ON a5.node = h5.node
       |ORDER BY a5.node""".stripMargin
  }

  /** q175: personalized PageRank from the high-balance customer seed
    * set (c_acctbal ≥ 9900) — proximity-to-seeds ranking vs q162's
    * global prior. */
  def q175Ppr(s: SparkSession, d: String): DataFrame = {
    val seeds = customer(s, d)
      .filter(col("c_acctbal") >= 9900)
      .select(concat(lit("c"), col("c_custkey")).as("node"))
    graft.operators.Graph.pageRankPersonalized(edgesDf(s, d), seeds)
  }

  /** q176: weakly connected components of the SPARSE endorsement
    * graph (only quantity-49+ line items — rare enough that the
    * graph fragments) by min-label propagation run to the exact
    * fixpoint. The oracle is the recursive-CTE reachability closure:
    * component = min reachable node id. */
  def q176Components(s: SparkSession, d: String): DataFrame = {
    val e = orders(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    graft.operators.Graph.connectedComponents(e)
  }

  private val q175Oracle: String = {
    val rounds = (1 to 5).map { i =>
      s"""pr$i AS MATERIALIZED (
         |  SELECT t.node,
         |    floor((0.15 * t.tele + 0.85 * COALESCE(s$i.m, 0.0)) * 1e12)
         |      / 1e12 AS pr
         |  FROM tele t
         |  LEFT JOIN (
         |    SELECT e.dst,
         |      CAST(SUM(CAST(p.pr / od.deg AS DECIMAL(18,15))) AS DOUBLE)
         |        AS m
         |    FROM e JOIN pr${i - 1} p ON e.src = p.node
         |           JOIN outdeg od ON e.src = od.onode
         |    GROUP BY e.dst) s$i ON s$i.dst = t.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCtes,
       |outdeg AS (SELECT src AS onode, COUNT(*) AS deg FROM e GROUP BY 1),
       |seeds AS (SELECT DISTINCT 'c' || c_custkey AS snode
       |          FROM customer WHERE c_acctbal >= 9900),
       |scnt AS (SELECT COUNT(*) AS ns FROM seeds),
       |tele AS MATERIALIZED (
       |  SELECT n.node,
       |    CASE WHEN s.snode IS NOT NULL
       |      THEN floor((1.0 / ns) * 1e12) / 1e12 ELSE 0.0 END AS tele
       |  FROM nodes n LEFT JOIN seeds s ON n.node = s.snode
       |  CROSS JOIN scnt),
       |pr0 AS (SELECT node, tele AS pr FROM tele),
       |$rounds
       |SELECT node, pr FROM pr5 ORDER BY node""".stripMargin
  }

  /** q179: per-part triangle count + local clustering coefficient of
    * the co-order graph (parts appearing together in an order are
    * linked — the item-item co-occurrence graph every recommender /
    * corpus-cohesion pass builds). [[graft.operators.Graph.triangleStats]]
    * runs the degree-ordered wedge enumeration; the oracle counts the
    * same triangles by the canonical a<b<c three-way self-join. */
  def q179Triangles(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.triangleStats(coOrderEdges(s, d))
      .orderBy(col("node"))

  private val q179Oracle: String =
    """WITH e AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey),
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |  GROUP BY node),
      |tr AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM e e1 JOIN e e2 ON e2.u = e1.v
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |pern AS (SELECT a AS node FROM tr UNION ALL SELECT b FROM tr
      |  UNION ALL SELECT c FROM tr),
      |tric AS (SELECT node, COUNT(*) AS tri FROM pern GROUP BY node)
      |SELECT d.node, d.deg, COALESCE(t.tri, 0) AS tri,
      |  CASE WHEN d.deg >= 2 THEN floor(2.0 * COALESCE(t.tri, 0) /
      |    (d.deg * (d.deg - 1)) * 1e12) / 1e12 ELSE 0.0 END AS lcc
      |FROM deg d LEFT JOIN tric t ON t.node = d.node
      |ORDER BY d.node""".stripMargin

  /** q186: degree assortativity of the same co-order part graph as
    * q179 ([[graft.operators.Graph.assortativity]]) — one-row graph
    * health stat; the integer degree-product sums are hash-pinned
    * exactly, the coefficient 12-decimal-truncated. */
  def q186Assortativity(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.assortativity(coOrderEdges(s, d))

  private val q186Oracle: String =
    """WITH e AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey),
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |  GROUP BY node),
      |s AS (SELECT COUNT(*) AS m,
      |    CAST(SUM(ju.deg + jv.deg) AS BIGINT) AS s1,
      |    CAST(SUM(ju.deg * ju.deg + jv.deg * jv.deg) AS BIGINT) AS s2,
      |    CAST(SUM(ju.deg * jv.deg) AS BIGINT) AS sp
      |  FROM e JOIN deg ju ON ju.node = e.u
      |    JOIN deg jv ON jv.node = e.v)
      |SELECT m, s1, s2, sp,
      |  CASE WHEN (CAST(s2 AS DOUBLE) / (2 * m) -
      |      (CAST(s1 AS DOUBLE) / (2 * m)) *
      |      (CAST(s1 AS DOUBLE) / (2 * m))) <> 0
      |  THEN floor(((CAST(sp AS DOUBLE) / m -
      |      (CAST(s1 AS DOUBLE) / (2 * m)) *
      |      (CAST(s1 AS DOUBLE) / (2 * m))) /
      |    (CAST(s2 AS DOUBLE) / (2 * m) -
      |      (CAST(s1 AS DOUBLE) / (2 * m)) *
      |      (CAST(s1 AS DOUBLE) / (2 * m)))) * 1e12) / 1e12
      |  END AS assortativity
      |FROM s""".stripMargin

  /** q188: top-50 part pairs by shared-neighbor Jaccard over the
    * HIGH-VOLUME co-order graph (quantity ≥ 25 line items —
    * [[graft.operators.Graph.sharedNeighborSimilarity]]) —
    * co-citation similarity, the "related items" signal; minShared=2
    * floors hapax overlaps, maxDegree=1000 (non-binding at sf0.01,
    * replayed in the oracle) documents the hot-middle prune. The
    * quantity cut is the operator's intended regime: co-citation is
    * a SIGNAL-graph query — on the full co-order graph (avg degree
    * ~90 at sf0.1) the wedge volume Σ C(deg,2) is ~80M and the
    * overlap is noise; the thinned graph keeps wedge volume ~25×
    * smaller and the overlaps meaningful (bench: 27 s → ~1 s). */
  def q188SharedNeighbors(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.sharedNeighborSimilarity(
      coOrderEdges(s, d, minQty = Some(25)),
      minShared = 2, maxDegree = 1000, k = 50)

  private val q188Oracle: String =
    """WITH e AS MATERIALIZED (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  WHERE a.l_quantity >= 25 AND b.l_quantity >= 25),
      |deg AS (SELECT node, COUNT(*) AS deg FROM
      |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      |  GROUP BY node),
      |adj AS (SELECT u AS n, v AS x FROM e
      |        UNION ALL SELECT v, u FROM e),
      |mids AS (SELECT adj.n, adj.x FROM adj
      |  JOIN deg ON deg.node = adj.n WHERE deg.deg <= 1000),
      |sh AS (SELECT m1.x AS a, m2.x AS b, COUNT(*) AS shared
      |  FROM mids m1 JOIN mids m2 ON m1.n = m2.n AND m1.x < m2.x
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      |SELECT sh.a, sh.b, sh.shared, ja.deg AS da, jb.deg AS db,
      |  floor((CAST(sh.shared AS DOUBLE) /
      |    (ja.deg + jb.deg - sh.shared)) * 1e12) / 1e12 AS jaccard
      |FROM sh JOIN deg ja ON ja.node = sh.a
      |  JOIN deg jb ON jb.node = sh.b
      |ORDER BY jaccard DESC, a, b LIMIT 50""".stripMargin

  /** q190: the 80-core of the co-order part graph
    * ([[graft.operators.Graph.kCore]]) — 143 peripheral parts peel
    * over 5 cascade rounds at sf0.01, 1857 survive with their
    * within-core degrees. The oracle unrolls 8 peeling rounds
    * (fixpoint + safety margin; extra rounds are no-ops, so the
    * engine's early exit is value-identical). */
  def q190KCore(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.kCore(coOrderEdges(s, d), k = 80)
      .orderBy(col("node"))

  private val q190Oracle: String = {
    val rounds = (1 to 8).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, COUNT(*) AS deg FROM
         |    (SELECT u AS node FROM e${i - 1}
         |     UNION ALL SELECT v FROM e${i - 1})
         |  GROUP BY node),
         |e$i AS MATERIALIZED (
         |  SELECT p.u, p.v FROM e${i - 1} p
         |  JOIN d$i a ON a.node = p.u AND a.deg >= 80
         |  JOIN d$i b ON b.node = p.v AND b.deg >= 80)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey),
       |$rounds
       |SELECT node, COUNT(*) AS deg FROM
       |  (SELECT u AS node FROM e8 UNION ALL SELECT v FROM e8)
       |GROUP BY node ORDER BY node""".stripMargin
  }

  /** q194: BFS hop distance (≤ 6, undirected) from the nation-3
    * supplier seed set over the SPARSE endorsement graph (q176's
    * quantity ≥ 49 cut, so distances actually spread) — the
    * distance-from-trusted-seeds prior
    * ([[graft.operators.Graph.hopDistance]]). The oracle is the
    * recursive-CTE frontier closure with MIN(dist) per node. */
  def q194HopDistance(s: SparkSession, d: String): DataFrame = {
    val e = orders(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    val seeds = supplier(s, d).filter(col("s_nationkey") === 3)
      .select(concat(lit("s"), col("s_suppkey")).as("node"))
    graft.operators.Graph.hopDistance(e, seeds, maxHops = 6)
  }

  private val q194Oracle: String =
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE l_quantity >= 49),
      |e AS (SELECT src, dst FROM e0
      |      UNION SELECT dst, src FROM e0),
      |seeds AS (SELECT DISTINCT 's' || s_suppkey AS node
      |          FROM supplier WHERE s_nationkey = 3),
      |r AS (
      |  SELECT node, 0 AS dist FROM seeds
      |  UNION
      |  SELECT e.dst AS node, r.dist + 1
      |  FROM r JOIN e ON e.src = r.node WHERE r.dist < 6)
      |SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
      |FROM r GROUP BY node ORDER BY node""".stripMargin

  /** q195: 4-round synchronous label propagation over the sparse
    * co-order part graph (quantity ≥ 45 line items) —
    * [[graft.operators.Graph.labelPropagation]] community labels with
    * the deterministic (count DESC, label ASC) tie order; the oracle
    * unrolls the same four mode-relabel rounds. */
  def q195LabelPropagation(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.labelPropagation(
      coOrderEdges(s, d, minQty = Some(45)), iters = 4)

  private val q195Oracle: String = {
    val rounds = (1 to 4).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT node, lab FROM (
         |    SELECT e.dst AS node, p.lab, COUNT(*) AS cnt,
         |      ROW_NUMBER() OVER (PARTITION BY e.dst
         |        ORDER BY COUNT(*) DESC, p.lab) AS rn
         |    FROM e JOIN l${i - 1} p ON e.src = p.node
         |    GROUP BY e.dst, p.lab)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS MATERIALIZED (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  WHERE a.l_quantity >= 45 AND b.l_quantity >= 45),
       |e AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
       |     UNION SELECT v, u FROM e0),
       |l0 AS (SELECT DISTINCT src AS node, src AS lab FROM e),
       |$rounds
       |SELECT node, lab AS community FROM l4 ORDER BY node""".stripMargin
  }

  /** q200: weighted co-occurrence graph construction
    * ([[graft.operators.Graph.coOccurrence]]) from the order→part
    * incidence list — maxGroupSize = 6 (BINDING: the largest orders
    * are excluded before the pair join, exercising the skew guard)
    * and a weight ≥ 2 floor. */
  def q200Cooccurrence(s: SparkSession, d: String): DataFrame =
    graft.operators.Graph.coOccurrence(
      lineitem(s, d).select(col("l_orderkey").as("g"),
        col("l_partkey").as("it")),
      "g", "it", maxGroupSize = 6, minWeight = 2)

  private val q200Oracle: String =
    """WITH gi AS (
      |  SELECT DISTINCT l_orderkey AS g, l_partkey AS it
      |  FROM lineitem),
      |sz AS (SELECT g, COUNT(*) AS c FROM gi GROUP BY 1),
      |kept AS (
      |  SELECT gi.g, gi.it FROM gi JOIN sz USING (g) WHERE sz.c <= 6)
      |SELECT a.it AS src, b.it AS dst, COUNT(*) AS weight
      |FROM kept a JOIN kept b ON a.g = b.g AND a.it < b.it
      |GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |ORDER BY src, dst""".stripMargin

  /** q203: deterministic 4-step random walks
    * ([[graft.operators.Graph.randomWalks]]) from every node of the
    * sparse endorsement graph — the DeepWalk sequence
    * materialization; the oracle replays each transition through the
    * same lexicographically-indexed adjacency. */
  def q203RandomWalks(s: SparkSession, d: String): DataFrame = {
    val e = orders(s, d)
      .join(lineitem(s, d).filter(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
    graft.operators.Graph.randomWalks(e, steps = 4)
  }

  private val q203Oracle: String = {
    val steps = (1 to 4).map { t =>
      s"""w$t AS MATERIALIZED (
         |  SELECT w.start, a.nxt AS node
         |  FROM w${t - 1} w JOIN adj a ON a.cur = w.node
         |    AND a.idx = ('0x' || substr(md5('walk:' || w.start ||
         |      ':' || $t), 1, 15))::UBIGINT::BIGINT % a.deg + 1)"""
        .stripMargin
    }.mkString(",\n")
    val sel = (0 to 4).map(t =>
      s"SELECT start, CAST($t AS BIGINT) AS step, node FROM w$t")
      .mkString("\n  UNION ALL ")
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  WHERE l_quantity >= 49),
       |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |adj AS MATERIALIZED (
       |  SELECT src AS cur, dst AS nxt,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) AS idx,
       |    COUNT(*) OVER (PARTITION BY src) AS deg
       |  FROM e WHERE src <> dst),
       |w0 AS (SELECT DISTINCT cur AS start, cur AS node FROM adj),
       |$steps
       |SELECT * FROM (
       |  $sel)
       |ORDER BY start, step""".stripMargin
  }

  private val q176Oracle: String =
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  WHERE l_quantity >= 49),
      |e AS (SELECT src, dst FROM e0
      |      UNION SELECT dst, src FROM e0),
      |nodes AS (SELECT DISTINCT src AS node FROM e),
      |r AS (
      |  SELECT node, node AS lab FROM nodes
      |  UNION
      |  SELECT e.dst AS node, r.lab
      |  FROM r JOIN e ON e.src = r.node)
      |SELECT node, MIN(lab) AS component
      |FROM r GROUP BY node ORDER BY node""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_pagerank" -> (q162PageRank _),
    "q224_pagerank_weighted" -> (q224PageRankWeighted _),
    "q285_textrank_keywords" -> (q285TextrankKeywords _),
    "q286_hyperball" -> (q286Hyperball _),
    "q287_hyperball_profile" -> (q287HyperballProfile _),
    "q234_web_authority" -> (q234WebAuthority _),
    "q163_hits" -> (q163Hits _),
    "q175_personalized_pagerank" -> (q175Ppr _),
    "q176_components" -> (q176Components _),
    "q179_triangles" -> (q179Triangles _),
    "q186_assortativity" -> (q186Assortativity _),
    "q188_shared_neighbors" -> (q188SharedNeighbors _),
    "q190_kcore" -> (q190KCore _),
    "q194_hop_distance" -> (q194HopDistance _),
    "q195_label_propagation" -> (q195LabelPropagation _),
    "q200_cooccurrence" -> (q200Cooccurrence _),
    "q203_random_walks" -> (q203RandomWalks _),
  )

  val oracle: Map[String, String] = Map(
    "q162_pagerank" -> q162Oracle,
    "q224_pagerank_weighted" -> q224Oracle,
    "q285_textrank_keywords" -> q285Oracle,
    "q286_hyperball" -> q286Oracle,
    "q287_hyperball_profile" -> q287Oracle,
    "q234_web_authority" -> q234Oracle,
    "q163_hits" -> q163Oracle,
    "q175_personalized_pagerank" -> q175Oracle,
    "q176_components" -> q176Oracle,
    "q179_triangles" -> q179Oracle,
    "q186_assortativity" -> q186Oracle,
    "q188_shared_neighbors" -> q188Oracle,
    "q190_kcore" -> q190Oracle,
    "q194_hop_distance" -> q194Oracle,
    "q195_label_propagation" -> q195Oracle,
    "q200_cooccurrence" -> q200Oracle,
    "q203_random_walks" -> q203Oracle,
  )
}
