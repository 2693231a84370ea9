package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dotF64, l2Norm}

/** Greedy k-center (Gonzalez 1985 farthest-first traversal) diverse
  * subset selection over an embedding column — the embedding-space
  * counterpart of the [[CoveragePlanner]] shingle planner: pick K
  * exemplars such that every point is close to some pick (a
  * 2-approximation to the optimal covering radius). This is the
  * "diversity sampling" step curation pipelines run before human
  * review or eval-set construction: the selection ORDER is a
  * coverage curriculum, and each pick's distance IS the covering
  * radius achieved so far.
  *
  * Determinism: seeded at the lowest id; each round is an exact MIN
  * aggregate over cosine distances (order-free) and a
  * (dist DESC, id ASC) sort-limit argmax — no randomness, so the
  * whole traversal replays in SQL. Distance arithmetic is the
  * q31-proven device: per-element double promotion, sequential
  * accumulation (`DotF64` ≡ DuckDB `list_dot_product` on
  * `DOUBLE[]`).
  *
  * Scale shape: per round one broadcast of the ≤K center frame
  * against the point table (no point×point work), one min
  * aggregate, one sort-limit-1. K rounds of corpus-linear passes —
  * the standard trade for farthest-first; K is reviewer-bounded. */
object DiverseSelection {

  /** Select `k` exemplars; returns `(round, idCol, dist)` where
    * `dist` is the pick's distance to the nearest earlier center
    * (0 for the seed) — the covering radius at that step. */
  def kCenterSelect(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pts = df.select(col(idCol).as("pid"), col(vecCol).as("pvec"))
      .withColumn("pnorm", l2Norm(col("pvec")))
      .localCheckpoint()
    var centers = pts.orderBy(col("pid")).limit(1)
      .select(lit(1L).as("round"), col("pid"), col("pvec"),
        col("pnorm"), lit(0.0).as("dist"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val cts = broadcast(centers.select(col("pid").as("cid"),
        col("pvec").as("cvec"), col("pnorm").as("cnorm")))
      val far = pts
        .join(centers.select(col("pid")), Seq("pid"), "left_anti")
        .crossJoin(cts)
        // zero-norm vectors have no direction: their cosine distance
        // is pinned to 1 (neutral) rather than left to divide-by-zero
        .select(col("pid"),
          when(col("pnorm") > 0 && col("cnorm") > 0,
            lit(1.0) - dotF64(col("pvec"), col("cvec")) /
              (col("pnorm") * col("cnorm")))
            .otherwise(lit(1.0)).as("d"))
        .groupBy(col("pid")).agg(min(col("d")).as("dist"))
        .orderBy(col("dist").desc, col("pid")).limit(1)
      val next = far.join(pts, Seq("pid"))
        .select(lit(r.toLong).as("round"), col("pid"), col("pvec"),
          col("pnorm"), col("dist"))
      centers = centers.unionByName(next).localCheckpoint()
    }
    centers.select(col("round"), col("pid").as(idCol), col("dist"))
  }
}
