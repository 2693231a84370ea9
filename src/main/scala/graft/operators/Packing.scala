package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-data assembly (builder brief): bin
  * documents/chunks into fixed token-budget training sequences — the
  * step between chunking/splitting and the trainer, where unpacked
  * short documents would waste most of each context window.
  *
  * Packing rule: within a shard, documents are laid end-to-end in key
  * order and a document belongs to the bin where its FIRST token
  * lands (floor(exclusive-cumsum / budget)). Deterministic, one
  * window pass, no driver state; a bin may overflow by at most one
  * document's tail — the standard streaming-packing trade, preferred
  * at scale over exact first-fit (which is inherently sequential).
  *
  * Scale: the window partitions by `shards` (pmod of the key), so no
  * global sort / single-partition window exists; each shard packs
  * independently and bin ids are disjoint across shards. More shards
  * = more parallelism and marginally more padding at shard tails. */
object Packing {

  /** Adds `bin`: the packed-sequence id for each row.
    * `tokenCol` must be a numeric token count. */
  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
      budget: Int, shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col("_shard")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_shard", pmod(col(keyCol), lit(shards)))
      .withColumn("_cum", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        col("_shard") * 1000000L +
          floor((col("_cum") - col(tokenCol)) / budget).cast("long"))
      .drop("_shard", "_cum")
  }

  /** Exact next-fit packing: within each shard, documents (in key
    * order) go into the current bin while they fit; a document that
    * would overflow CLOSES the bin and opens the next — so no bin
    * ever exceeds `budget` (except a single document longer than the
    * budget, which gets a bin alone). Runs as one `mapPartitions`
    * pass over shard-repartitioned, key-sorted partitions —
    * deterministic and distributed, but inherently sequential within
    * a shard (the window-cumsum [[packSequences]] is the cheaper
    * approximation that tolerates ≤1-doc overflow). Output adds
    * `bin`, disjoint across shards. */
  def packSequencesNextFit(df: DataFrame, keyCol: String,
      tokenCol: String, budget: Int, shards: Int = 32): DataFrame = {
    require(budget > 0 && shards > 0)
    val spark = df.sparkSession
    val keyed = df.select(col(keyCol).cast("long").as("key"),
        col(tokenCol).cast("long").as("tok"))
      .withColumn("_shard", pmod(col("key"), lit(shards)).cast("int"))
      .repartition(shards, col("_shard"))
      .sortWithinPartitions(col("_shard"), col("key"))
    import spark.implicits._
    val packed = keyed.as[(Long, Long, Int)].mapPartitions { rows =>
      // a partition holds one or more whole shards (hash partitioning
      // may co-locate shards); pack each shard independently
      var curShard = Int.MinValue
      var bin = 0L
      var used = 0L
      rows.map { case (key, tok, shard) =>
        if (shard != curShard) {
          curShard = shard; bin = shard * 1000000L; used = 0L
        }
        if (used > 0 && used + tok > budget) { bin += 1; used = 0L }
        used += tok
        (key, tok, bin)
      }
    }.toDF("key", "tok", "bin")
    df.join(packed.select(col("key"), col("bin")),
      df(keyCol) === col("key"))
      .drop("key")
  }

  /** Context-window fit report — the sizing study run before choosing
    * a training sequence length: for each candidate context length,
    * how many documents overflow it, what fraction of corpus tokens a
    * hard truncation would discard, and what fraction of sequence
    * slots one-doc-per-sequence padding would waste (the two losses
    * [[packSequences]] exists to beat).
    *
    * Shape: ONE scan, one partial/final aggregate computing every
    * context's counters simultaneously (3 counters × contexts in a
    * single `HashAggregate`), then a `|contexts|`-row Generate off
    * the one aggregate row — the q117-funnel device; never one pass
    * per context. All counters are exact longs; the two fractions
    * are final per-row IEEE divisions, so the oracle is value-exact.
    *
    * Output: (ctx, n_docs, n_tokens, docs_over, trunc_tokens,
    * trunc_frac, pad_frac) one row per context, where `pad_frac` =
    * 1 − Σ min(len, ctx) / (n_docs·ctx). */
  def contextFitReport(df: DataFrame, tokenCol: String,
      contexts: Seq[Int]): DataFrame = {
    require(contexts.nonEmpty, "at least one context length")
    val base = Seq(count(lit(1)).as("n_docs"),
      sum(col(tokenCol)).cast("long").as("n_tokens"))
    val perCtx = contexts.flatMap { c =>
      Seq(
        count_if(col(tokenCol) > c).as(s"over_$c"),
        sum(greatest(col(tokenCol) - c, lit(0))).cast("long")
          .as(s"trunc_$c"),
        sum(least(col(tokenCol), lit(c))).cast("long").as(s"kept_$c"))
    }
    val aggCols = base ++ perCtx
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    one.select(explode(array(contexts.map { c =>
        struct(lit(c).as("ctx"), col("n_docs"), col("n_tokens"),
          col(s"over_$c").as("docs_over"),
          col(s"trunc_$c").as("trunc_tokens"),
          col(s"kept_$c").as("kept"))
      }: _*)).as("r"))
      .select(col("r.ctx").as("ctx"), col("r.n_docs").as("n_docs"),
        col("r.n_tokens").as("n_tokens"),
        col("r.docs_over").as("docs_over"),
        col("r.trunc_tokens").as("trunc_tokens"),
        (col("r.trunc_tokens").cast("double") /
          col("r.n_tokens").cast("double")).as("trunc_frac"),
        (lit(1.0) - col("r.kept").cast("double") /
          (col("r.n_docs") * col("r.ctx")).cast("double"))
          .as("pad_frac"))
      .orderBy(col("ctx"))
  }

  /** Length-bucketed inference batching — the dynamic-batching step
    * teacher scoring / embedding / reranking fleets run so a batch
    * pads every item to ITS OWN max, not the corpus max: items sort
    * by (length desc, id), fixed `batchSize` groups slice off the
    * rank, and each batch reports its padding waste. A random-order
    * batcher pads to the global tail; length-sorted batching is the
    * standard fix (the bucketing behind every serving framework's
    * length-grouped sampler).
    *
    * Output per batch: (batch_id, n_items, max_len, sum_len,
    * padding, pad_frac) — `padding` = n_items·max_len − sum_len,
    * `pad_frac` its share of the padded volume (NULL when the padded
    * volume is zero: all-empty batches have no meaningful fraction).
    * Integer counters + one final IEEE division — oracle-exact.
    *
    * Scale: the global length order comes from
    * [[graft.operators.Corpus.globalRank]] (range repartition +
    * two-pass index — never a single-partition window); the batch
    * aggregate groups on `batch_id`, which the rank makes contiguous
    * within range partitions (near-local aggregation). */
  def lengthBucketedBatches(df: DataFrame, idCol: String,
      tokenCol: String, batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize >= 1 ($batchSize)")
    val ranked = Corpus.globalRank(
      df.select(col(idCol), col(tokenCol)),
      Seq(col(tokenCol).desc, col(idCol)), "rnk")
    val batched = ranked.withColumn("batch_id",
      floor((col("rnk") - 1) / batchSize).cast("long"))
    val agg = batched.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_items"),
        max(col(tokenCol)).cast("long").as("max_len"),
        sum(col(tokenCol)).cast("long").as("sum_len"))
      .withColumn("padding",
        col("n_items") * col("max_len") - col("sum_len"))
    agg.withColumn("pad_frac",
      when(col("n_items") * col("max_len") > 0,
        col("padding").cast("double") /
          (col("n_items") * col("max_len")).cast("double")))
  }
}
