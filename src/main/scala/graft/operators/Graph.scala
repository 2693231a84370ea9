package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative link-analysis over an edge table — the Pregel-class
  * workload expressed as a fixed number of join+aggregate rounds on
  * DataFrames (the reference has no graph engine; these are the
  * standard algorithms a corpus pipeline runs over citation / link /
  * endorsement graphs to weight sources, e.g. harvesting per-domain
  * quality priors for a crawl the way Common-Crawl-derived corpora
  * weight pages by host centrality).
  *
  * Engine-portability (the q101/q102 discipline): every per-node
  * score is truncated to 12 decimals after each update
  * (`floor(x·1e12)/1e12` — doubles agree across engines far beyond
  * 12 digits for these magnitudes), and every neighbor sum runs as
  * an exact DECIMAL(18,15) aggregation, so results are bit-identical
  * across engines AND across partitionings (IEEE addition never
  * reorders).
  *
  * Scale: per iteration exactly ONE data-sized shuffle (the
  * neighbor-sum aggregation keyed by target node; the score join
  * rides the same hash partitioning). Lineage is cut per iteration
  * with `localCheckpoint` — without it the plan doubles per round and
  * the optimizer re-derives the whole chain each action. On a real
  * cluster swap localCheckpoint for reliable `checkpoint` (HDFS) so
  * executor loss doesn't force a full recompute; the shapes are
  * identical. Node/edge tables stay fully distributed — no
  * driver-side state beyond the one-row count/max frames, which are
  * broadcast.
  */
object Graph {

  /** Truncate to 12 decimals — deterministic across engines. */
  private def t12(x: Column): Column =
    floor(x * lit(1e12)).cast("double") / lit(1e12)

  /** Exact sum of a double column via DECIMAL(18,15) terms (scores
    * are ≤ 1-ish here, so 3 integer digits is ample headroom). */
  private def xsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 15))).cast("double")

  /** Simplified PageRank (Page et al. 1999) without dangling-mass
    * redistribution: pr'(v) = 0.15/N + d·Σ_{u→v} pr(u)/outdeg(u),
    * each update truncated to 12 decimals. Dangling nodes (no
    * out-edges) leak their mass — fine for RANKING (the reference
    * use), and it keeps the per-iteration plan at one shuffle; the
    * full-conservation variant adds one more one-row aggregate per
    * round if ever needed.
    *
    * `edges`: (src: string, dst: string); duplicates collapse.
    * Output: (node, pr) over src ∪ dst, ordered by node.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    // The out-degree is loop-INVARIANT: fold it into the edge table
    // once and leave that table hash-partitioned by src (checkpoint
    // preserves partitioning). Locally the rank side broadcasts (AQE)
    // so rounds are job-overhead-bound either way; at cluster scale —
    // where ranks exceed the broadcast threshold and the join falls
    // back to shuffle — this removes the per-round EDGE re-exchange,
    // the term that grows with data.
    val ed = e.join(e.groupBy(col("src").as("onode"))
          .agg(count(lit(1)).as("deg")),
        col("src") === col("onode"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .localCheckpoint()
    val cnt = nodes.agg(count(lit(1)).as("nn"))
    var pr = nodes.crossJoin(broadcast(cnt))
      .select(col("node"), t12(lit(1.0) / col("nn")).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val agg = ed
        .join(pr, col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst")).agg(xsum(col("c")).as("m"))
      pr = nodes
        .join(agg, nodes("node") === agg("dst"), "left")
        .crossJoin(broadcast(cnt))
        .select(col("node"),
          t12(lit(0.15) / col("nn") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    pr.orderBy(col("node"))
  }

  /** Personalized PageRank (random walk with restart): the teleport
    * mass lands on the SEED set instead of uniformly —
    * pr'(v) = 0.15·tele(v) + d·Σ_{u→v} pr(u)/outdeg(u) with
    * tele(v) = 1/|S| on seeds, 0 elsewhere. Ranks nodes by proximity
    * to the seeds (the related-content / similar-source score next
    * to the global prior [[pageRank]] computes). Same per-round
    * shapes, precision discipline, and checkpoint policy.
    *
    * `seeds`: one string column `node`. Output: (node, pr). */
  def pageRankPersonalized(edges: DataFrame, seeds: DataFrame,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val ed = e.join(e.groupBy(col("src").as("onode"))
          .agg(count(lit(1)).as("deg")),
        col("src") === col("onode"))
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .localCheckpoint()
    val sd = seeds.select(col("node").as("snode")).distinct()
    val scnt = sd.agg(count(lit(1)).as("ns"))
    // teleport vector: 1/|S| on seeds (12-trunc), 0 elsewhere
    val tele = nodes
      .join(sd, nodes("node") === sd("snode"), "left")
      .crossJoin(broadcast(scnt))
      .select(col("node"),
        when(col("snode").isNotNull, t12(lit(1.0) / col("ns")))
          .otherwise(lit(0.0)).as("tele"))
      .localCheckpoint()
    var pr = tele.select(col("node"), col("tele").as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val agg = ed
        .join(pr, col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("dst")).agg(xsum(col("c")).as("m"))
      pr = tele
        .join(agg, tele("node") === agg("dst"), "left")
        .select(col("node"),
          t12(lit(0.15) * col("tele") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("pr"))
        .localCheckpoint()
    }
    pr.orderBy(col("node"))
  }

  /** Weakly connected components by min-label propagation to a
    * FIXPOINT: label(v) starts as v's own id and each round takes the
    * min over the closed neighborhood (edges symmetrized); the loop
    * runs until NO label changes — exact components, not a fixed
    * round count. Rounds are bounded by component diameter; each is
    * one join + one aggregate over the (pre-partitioned,
    * checkpointed) symmetric edge table, with the convergence check
    * riding the same per-round action. The min-label device is the
    * distributed-safe one: monotone (labels only decrease), so
    * convergence is order- and partitioning-independent.
    *
    * Output: (node, component) where component = lexicographic min
    * node id of the component. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
    val sym = e0.union(e0.select(col("dst"), col("src")))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = sym.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var lab = nodes.select(col("node"), col("node").as("lab"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym
        .join(lab.withColumnRenamed("node", "ln"),
          col("src") === col("ln"))
        .groupBy(col("dst").as("n2"))
        .agg(min(col("lab")).as("nmin"))
      val next = lab
        .join(nbrMin, col("node") === col("n2"), "left")
        .select(col("node"),
          least(col("lab"), coalesce(col("nmin"), col("lab")))
            .as("lab"), col("lab").as("old"))
        .localCheckpoint()
      changed = next.filter(col("lab") =!= col("old")).count()
      lab = next.select(col("node"), col("lab"))
    }
    lab.select(col("node"), col("lab").as("component"))
      .orderBy(col("node"))
  }

  /** HITS (Kleinberg 1999): auth'(v) = Σ_{u→v} hub(u), then
    * hub'(u) = Σ_{u→v} auth'(v), each vector normalized by its MAX
    * (exact under any partitioning, unlike an L2 norm) and truncated
    * to 12 decimals per round. On a bipartite endorsement graph the
    * auth side ranks endorsees, the hub side ranks endorsers.
    *
    * Output: (node, auth, hub) over src ∪ dst, ordered by node.
    */
  def hits(edges: DataFrame, iters: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    // Two loop-invariant edge layouts: the auth pass joins hubs by
    // src, the hub pass joins auths by dst — keep one copy
    // pre-partitioned per key so each round only exchanges the
    // nodes-sized score frames (the pageRank device, both ways).
    val eSrc = e.repartition(col("src")).localCheckpoint()
    val eDst = e.repartition(col("dst")).localCheckpoint()
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
      .localCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val araw = eSrc
        .join(hub, col("src") === col("node"))
        .groupBy(col("dst")).agg(xsum(col("hub")).as("a"))
      val amax = araw.agg(max(col("a")).as("am"))
      auth = nodes
        .join(araw, nodes("node") === araw("dst"), "left")
        .crossJoin(broadcast(amax))
        .select(col("node"),
          t12(coalesce(col("a"), lit(0.0)) / col("am")).as("auth"))
        .localCheckpoint()
      val hraw = eDst
        .join(auth.withColumnRenamed("node", "anode"),
          col("dst") === col("anode"))
        .groupBy(col("src")).agg(xsum(col("auth")).as("h"))
      val hmax = hraw.agg(max(col("h")).as("hm"))
      hub = nodes
        .join(hraw, nodes("node") === hraw("src"), "left")
        .crossJoin(broadcast(hmax))
        .select(col("node"),
          t12(coalesce(col("h"), lit(0.0)) / col("hm")).as("hub"))
        .localCheckpoint()
    }
    auth.select(col("node"), col("auth"))
      .join(hub.withColumnRenamed("node", "hnode"),
        col("node") === col("hnode"))
      .select(col("node"), col("auth"), col("hub"))
      .orderBy(col("node"))
  }
}
