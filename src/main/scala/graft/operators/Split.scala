package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Deterministic dataset splitting for training pipelines (builder
  * brief: the operations a large-scale training-data pipeline needs
  * beyond the reference's own surface — train/val/test assignment is
  * the step between dedup/quality-gating and the trainer).
  *
  * Split assignment must be (a) deterministic across runs and engines
  * — a re-run of the pipeline must put every document in the same
  * split, or eval sets silently contaminate; (b) a pure per-row
  * function of a stable key — never `rand()`, never row order, never
  * partition id; (c) leakage-aware — near-duplicate documents must
  * co-travel to one split, or the val set contains paraphrases of
  * train rows ("split leakage", the standard LLM-eval failure).
  *
  * The bucket hash is the md5-prefix trick (same device as the
  * simhash oracle): bucket = uint(md5("split:" || key)[0:8]) mod
  * 10000 — built from engine-portable native functions (codegen'd in
  * Spark, reproducible in any engine with md5, which is how the
  * DuckDB oracle value-checks q73/q74).
  *
  * Scale: per-row hash + chained `when` — no shuffle, no UDF, fully
  * codegen. The cluster-aware variant adds one hash join against the
  * (small) component map from [[Dedup.connectedComponents]].
  */
object Split {

  val Buckets = 10000

  /** Deterministic bucket in [0, [[Buckets]]) from a stable key. */
  def splitBucket(key: Column): Column =
    (conv(substring(md5(concat(lit("split:"), key.cast("string"))), 1, 8),
      16, 10).cast("long") % Buckets).cast("int")

  /** `split` label from cumulative weight thresholds, e.g.
    * Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1). Weights are
    * proportions of the 10000-bucket space (floored cumulatively, so
    * every bucket maps to exactly one split). */
  def splitLabel(key: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val b = splitBucket(key)
    val cuts = weights.scanLeft(0.0)(_ + _._2).tail
      .map(c => math.floor(c * Buckets).toLong)
    weights.zip(cuts).dropRight(1)
      .foldRight(lit(weights.last._1)) { case (((name, _), cut), elseCol) =>
        when(b < cut, lit(name)).otherwise(elseCol)
      }
  }

  /** Adds a `split` column keyed on `keyCol`. */
  def hashSplit(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitLabel(col(keyCol), weights))

  /** Deterministic stratified downsampling — the corpus-rebalancing
    * step (keep X% of an over-represented language/source, all of
    * the rest). A row survives iff its [[splitBucket]] falls under
    * its stratum's rate threshold, so the sample is (a) reproducible
    * across runs and engines, (b) a pure per-row filter (no shuffle,
    * no rand()), and (c) NESTED: lowering a rate removes rows but
    * never swaps which ones survive — the property temperature-style
    * rebalancing needs when rates are retuned between runs. */
  def stratifiedSample(df: DataFrame, keyCol: String,
      strataCol: String, rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r =>
      r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val threshold = rates.toSeq.sortBy(_._1)
      .foldRight(lit(math.floor(defaultRate * Buckets))) {
        case ((stratum, rate), elseCol) =>
          when(col(strataCol) === stratum,
            lit(math.floor(rate * Buckets))).otherwise(elseCol)
      }
    df.filter(splitBucket(col(keyCol)) < threshold)
  }

  /** Truncated natural log (9 decimals): the engine-portable float
    * discipline shared with [[LanguageModel]]/[[Importance]]. */
  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  /** Deterministic uniform in (0, 1) from a stable key: the md5
    * bucket's midpoint. Salted differently from [[splitBucket]] so
    * sampling decisions are independent of split assignment. */
  private def unitHash(key: Column): Column =
    ((conv(substring(md5(concat(lit("sample:"), key.cast("string"))),
      1, 8), 16, 10).cast("long") % Buckets).cast("double") + lit(0.5)) /
      lit(Buckets.toDouble)

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * A-ES): keep the k rows with the greatest u^(1/w) — each row's
    * inclusion probability is proportional to its weight. Ranking by
    * ln(u)/w is monotone-equivalent and engine-portable (truncated
    * ln, IEEE division); u comes from [[unitHash]], so the sample is
    * deterministic across runs AND engines — re-running a pipeline
    * draws the same rows (the reproducibility contract every other
    * Split operator keeps).
    *
    * Scale: a per-row hash + one TakeOrdered top-k — no shuffle
    * beyond k rows per partition. Rows with non-positive weight are
    * dropped (zero weight = never sampled).
    *
    * Output: df's columns + `es_key`, the ranking key. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame =
    df.filter(col(weightCol) > 0)
      .withColumn("es_key",
        ln9(unitHash(col(keyCol))) / col(weightCol))
      .orderBy(desc("es_key"), col(keyCol))
      .limit(k)

  /** Temperature-based mixture resampling (the data-mixing step of
    * multilingual/multi-source LLM corpora — sampling stratum s with
    * probability ∝ n_s^α flattens the source distribution; α = 0.5
    * here, the common square-root temperature, because sqrt is
    * IEEE-exact in every engine while pow(x, α) is not): per-stratum
    * keep rate r_s = min(1, T·q_s/n_s) with q_s = √n_s / Σ√n_t, then
    * the deterministic per-row bucket filter (same device as
    * [[stratifiedSample]], so samples are nested under retuning).
    *
    * T is the target total row count IN EXPECTATION (exact per
    * stratum up to bucket granularity: floor(r_s·10000)/10000).
    *
    * Scale: one small aggregate over strata (broadcast back), then a
    * pure per-row filter — no shuffle of the data itself.
    *
    * Output: the surviving rows with `keep_threshold` attached. */
  def temperatureSample(df: DataFrame, keyCol: String,
      strataCol: String, targetTotal: Long): DataFrame = {
    val sq9 = floor(sqrt(col("n")) * lit(1e9)).cast("double") / lit(1e9)
    val counts = df.groupBy(col(strataCol).as("_ts_s"))
      .agg(count(lit(1)).as("n"))
      .withColumn("sq9", sq9)
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = counts
      // strata tables are small by construction (sources/languages) —
      // the global window is over that table, never the data
      .withColumn("stot",
        sum(col("sq9").cast(DecimalType(18, 9))).over(whole)
          .cast("double"))
      .withColumn("rate",
        least(lit(1.0),
          lit(targetTotal.toDouble) * col("sq9") / col("stot") /
            col("n").cast("double")))
      .select(col("_ts_s"),
        floor(col("rate") * lit(Buckets)).as("keep_threshold"))
    df.join(broadcast(rates), col(strataCol) === col("_ts_s"))
      .filter(
        conv(substring(md5(concat(lit("temp:"),
          col(keyCol).cast("string"))), 1, 8), 16, 10).cast("long") %
          Buckets < col("keep_threshold"))
      .drop("_ts_s")
  }

  /** Per-group document cap (the RefinedWeb/C4 "at most N documents
    * per domain" rule — without it a handful of template-heavy hosts
    * dominate a web corpus): keep the first `n` rows of each group in
    * deterministic `keyCol` order, attaching the rank. One shuffle on
    * the group key; Spark 4 plans the rank filter as WindowGroupLimit,
    * so each partition retains only n rows per group BEFORE the final
    * window — a hot domain never floods an executor. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(keyCol))
    df.withColumn("group_rank", row_number().over(w))
      .filter(col("group_rank") <= n)
  }

  /** Deterministic EPOCH SHUFFLE with contiguous global positions —
    * the training-order primitive ("globally shuffle the corpus,
    * differently each epoch, identically on every run/engine"): each
    * row's sort key is md5(epoch:id), so the permutation is a pure
    * function of (epoch, id); `position` is its contiguous 0-based
    * global rank.
    *
    * Scale shape: NO global sort. The md5 key's first two hex chars
    * shard the corpus into 256 groups whose ordering is consistent
    * with the full key's (prefix property), so global rank =
    * per-shard rank (a 256-way partitioned window) + the shard's
    * offset (a 256-row cumulative count that rides a broadcast).
    * The oracle replays it as one flat ROW_NUMBER over the same key
    * — the value-exact proof that the sharded form IS the global
    * permutation. */
  def epochShuffle(df: DataFrame, keyCol: String,
      epoch: Int): DataFrame = {
    // a null key would produce a null shard that the offsets count
    // but the join drops — rows silently vanish AND every position
    // shifts; fail fast instead (null keys also have no
    // deterministic order among themselves)
    val key = when(col(keyCol).isNull,
      raise_error(lit(s"epochShuffle: null $keyCol")))
      .otherwise(md5(concat(lit(epoch.toString), lit(":"),
        col(keyCol).cast("string"))))
    val keyed = df.withColumn("_es_key", key)
      .withColumn("_es_shard", substring(col("_es_key"), 1, 2))
    val offsets = keyed.groupBy(col("_es_shard"))
      .agg(count(lit(1)).as("_es_n"))
      .withColumn("_es_off",
        coalesce(sum(col("_es_n")).over(
          Window.orderBy(col("_es_shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_es_shard"), col("_es_off"))
    val rank = row_number().over(
      Window.partitionBy(col("_es_shard"))
        .orderBy(col("_es_key"), col(keyCol)))
    keyed
      .join(broadcast(offsets), Seq("_es_shard"))
      .withColumn("position", col("_es_off") + rank - 1)
      .drop("_es_key", "_es_shard", "_es_off")
  }

  /** Leakage-aware split: rows whose keys are connected by `pairs`
    * (id_a, id_b — e.g. near-dup candidates from
    * [[Dedup.simhashNearDups]] or [[SimilaritySearch.cosineNearDupsBanded]])
    * share the split of their component's minimum key, so a document
    * and its near-duplicates can never straddle train/val. Adds
    * `root` (the component representative — the row's own key for
    * singletons) and `split`. */
  def clusterAwareSplit(df: DataFrame, keyCol: String, pairs: DataFrame,
      weights: Seq[(String, Double)]): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .select(col("id").as("_ca_id"), col("comp").as("_ca_comp"))
    df.join(comps, col(keyCol) === col("_ca_id"), "left")
      .withColumn("root", coalesce(col("_ca_comp"), col(keyCol)))
      .drop("_ca_id", "_ca_comp")
      .withColumn("split", splitLabel(col("root"), weights))
  }

  /** Data-mixture PLAN — the sizing table a multi-source training run
    * publishes before sampling (the LLaMA/DoReMi-style α=0.5
    * rebalance): per stratum, its natural token share, its α=0.5
    * target share (∝ √tokens — hot sources damped, tail sources
    * lifted), the token need against a fixed `budgetTokens`, the
    * implied EPOCH count (need/available: >1 means upsampling —
    * repeat passes; <1 means downsampling), and the single-pass
    * sampling rate min(1, epochs). [[temperatureSample]] executes the
    * downsampling side of this plan row-by-row; the epochs column is
    * what a training loader repeats.
    *
    * Shape: one aggregate to the strata table (sources/languages —
    * small by construction), then per-row arithmetic on it.
    * Portability: √ truncated to 1e-9 (the q106 device), the share
    * normalizer decimal-summed over the strata table, every division
    * a final per-row IEEE op — value-exact cross-engine. */
  def mixturePlan(df: DataFrame, strataCol: String, tokenCol: String,
      budgetTokens: Long): DataFrame = {
    val whole = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens"))
      .withColumn("tot",
        sum(col("n_tokens")).over(whole).cast("double"))
      .withColumn("w9",
        floor(sqrt(col("n_tokens")) * lit(1e9)).cast("double") / 1e9)
      .withColumn("wtot",
        sum(col("w9").cast(DecimalType(18, 9))).over(whole)
          .cast("double"))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("tot"))
          .as("natural_frac"),
        (col("w9") / col("wtot")).as("target_frac"),
        (col("w9") / col("wtot") * lit(budgetTokens.toDouble))
          .as("need_tokens"),
        (col("w9") / col("wtot") * lit(budgetTokens.toDouble) /
          col("n_tokens").cast("double")).as("epochs"),
        least(lit(1.0), col("w9") / col("wtot") *
          lit(budgetTokens.toDouble) / col("n_tokens").cast("double"))
          .as("sample_rate"))
      .orderBy(col(strataCol))
  }

  /** Deterministic fixed-size sample: exactly min(k, |group|) rows
    * per group, chosen by md5-hash rank (salted independently of
    * [[splitBucket]] so nesting under [[hashSplit]] stays unbiased),
    * ties impossible (the full digest prefix + key breaks them).
    * The rate-based [[stratifiedSample]] cannot promise a COUNT;
    * this is the "give me exactly 10k examples per language" form
    * an eval-set builder needs. One window per group over (hash,
    * key) — the per-group sort is bounded by group size; for
    * pathological mega-groups pre-thin with [[stratifiedSample]]
    * first. `keyCol` must be row-unique (it is both the hash seed
    * and the tie-break); duplicate keys make the choice among their
    * rows partition-dependent. */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String],
      keyCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty && k >= 1,
      s"need group columns and k >= 1 ($groupCols, $k)")
    val h = md5(concat(lit("samplek:"), col(keyCol).cast("string")))
    df.withColumn("_sk_rank",
        row_number().over(Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(h, col(keyCol))))
      .filter(col("_sk_rank") <= k)
      .drop("_sk_rank")
  }

  /** Rendezvous (highest-random-weight / HRW, Thaler–Ravishankar
    * 1998) shard assignment: a key goes to the shard whose
    * hash(shard-vnode, key) is greatest. The property that matters
    * for re-sharding a 100-TB corpus incrementally: adding a shard
    * moves ONLY the keys the new shard now wins (≈ its weight share)
    * — no key ever moves BETWEEN surviving shards, so a grow/shrink
    * invalidates the minimum possible data. Integer weights are
    * expressed as virtual nodes (weight w = w independent hash
    * draws), keeping the argmax exact-integer — no float powers, so
    * the DuckDB oracle replays it bit-identically.
    *
    * Shape: a pure per-row expression — Σw md5 digests folded
    * through `array_max` over (hash, shard, vnode) structs (field-
    * order comparison = deterministic tie-break). No shuffle, no
    * UDF, codegen-friendly; keep Σw modest (tens), which real shard
    * maps are. */
  def rendezvousShard(key: Column, shards: Seq[(String, Int)]): Column = {
    require(shards.nonEmpty && shards.forall(_._2 >= 1),
      "need at least one shard, integer weights >= 1")
    require(shards.map(_._1).distinct.length == shards.length,
      "shard names must be unique")
    val structs = for ((name, w) <- shards; v <- 0 until w) yield {
      val h = conv(substring(md5(concat(lit(s"hrw:$name:$v:"),
        key.cast("string"))), 1, 8), 16, 10).cast("long")
      struct(h.as("h"), lit(name).as("shard"), lit(v).as("vn"))
    }
    array_max(array(structs: _*)).getField("shard")
  }

  /** Adds a `shard` column via [[rendezvousShard]] keyed on `keyCol`. */
  def rendezvousAssign(df: DataFrame, keyCol: String,
      shards: Seq[(String, Int)]): DataFrame =
    df.withColumn("shard", rendezvousShard(col(keyCol), shards))
}
