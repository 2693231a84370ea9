package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-tiled all-pairs self-join — the shape that lets an EXACT
  * quadratic pair scan (cosine pairs, Hamming pairs) run without a
  * cartesian product or a full-side broadcast.
  *
  * Both copies of the input get a block id `pmod(hash(id), B)`. The
  * left copy is replicated across the B possible right-blocks, the
  * right copy across the B possible left-blocks, and the two meet in
  * a plain equi-join on the composite tile key `(blk_a, blk_b)`:
  * every unordered row pair {x, y} with `x.id < y.id` lands in
  * exactly one of the B² tiles — tile `(blk(x), blk(y))`.
  *
  * Cost model (n input rows, B blocks):
  *   - shuffle: 2·n·B rows (each side replicated B ways) — linear in
  *     n, vs. the broadcast shape's n-per-executor memory wall;
  *   - per-task memory: one tile ≈ n/B rows per side, so B is the
  *     dial that fits a tile to executor memory at any corpus size;
  *   - compute: n²/2 pair evaluations (the semantics — an exact scan
  *     at an arbitrary threshold is inherently quadratic), spread
  *     over B² independently schedulable tiles.
  *
  * At 100 TB: pick B ≈ corpusBytes / targetTaskBytes; tiles scale out
  * across executors with no single task ever holding more than two
  * tile slices. The quadratic *compute* is unavoidable for exactness
  * — the banded-LSH paths ([[Dedup.simhashNearDups]],
  * [[SimilaritySearch.cosineNearDupsBanded]]) are the sub-quadratic
  * alternatives where a recall guarantee exists.
  */
object Tiling {

  /** All unordered row pairs of `df` (`idCol_a < idCol_b`), via the
    * B×B tile equi-join. Every input column appears twice in the
    * output with `_a` / `_b` suffixes. The id inequality is applied
    * before any downstream projection, so per-pair work added after
    * this call runs on exactly n·(n−1)/2 rows. */
  def selfPairs(df: DataFrame, idCol: String, blocks: Int): DataFrame = {
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    val tileIds = array((0 until blocks).map(lit): _*)
    val a = df.select(df.columns.map(c => col(c).as(s"${c}_a")): _*)
      .withColumn("_blk_a", pmod(hash(col(s"${idCol}_a")), lit(blocks)))
      .withColumn("_blk_b", explode(tileIds))
    val b = df.select(df.columns.map(c => col(c).as(s"${c}_b")): _*)
      .withColumn("_blk_b", pmod(hash(col(s"${idCol}_b")), lit(blocks)))
      .withColumn("_blk_a", explode(tileIds))
    // Own the partitioning: AQE sizes post-shuffle partitions by BYTES,
    // but a tile's cost is quadratic in its rows — a few-MB shuffle
    // would be coalesced into one task doing all n²/2 comparisons. A
    // fixed-width repartition on the tile key (which AQE never
    // coalesces) pins one tile per task, so parallelism is B² by
    // construction at any data size. The hash join beats sort-merge
    // here: with B² distinct keys a sort is pure overhead, and the
    // build side is one tile (~n/B rows) — bounded by the same dial
    // that bounds tile memory.
    val tiles = blocks * blocks
    a.repartition(tiles, col("_blk_a"), col("_blk_b"))
      .join(b.repartition(tiles, col("_blk_a"), col("_blk_b"))
        .hint("shuffle_hash"), Seq("_blk_a", "_blk_b"))
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .drop("_blk_a", "_blk_b")
  }
}
