package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Product quantization (PQ) for ANN search — the vector-compression
  * extension of the retrieval surface (reference cosine top-k:
  * `services/database.py:202-236`; PQ itself is the standard
  * compressed-domain ANN scheme of Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * The vector is split into `m` subspaces; each subspace is quantized
  * to one of K codewords, so a d-dim float64 vector becomes m small
  * codes (here m=8, K=#labels=8 → 8 bytes vs 640: 80× compression).
  * Search runs in the compressed domain via ADC (asymmetric distance
  * computation): each query precomputes an m×K table of
  * subspace-dot-products against the codebooks, and scoring a corpus
  * vector is m table lookups + adds — no float vector is ever read.
  *
  * Scale design: codebooks and per-query tables are tiny and
  * broadcast; the corpus keeps only (id, codes) — 80× less shuffle
  * and scan width than the raw floats — and the scan reuses the
  * bounded-heap [[TopK]] shuffle (k rows per partition per query).
  * At 100 TB this is the difference between scanning 100 TB and
  * scanning 1.25 TB of codes.
  *
  * Determinism/oracle notes: codebooks are per-label subvector means
  * via the exact decimal-sum mean (q95 technique — per-element cast
  * to DECIMAL(18,9), exact sum, final cast to double: deterministic
  * under ANY aggregation order, so it partial-aggregates); code
  * assignment breaks distance ties on the lower code; the ADC sum
  * folds subspaces in ascending order. Every step is therefore
  * bit-reproducible in DuckDB SQL (q72's oracle).
  */
object ProductQuantization {

  /** Per-(sub, code, cw) codebooks: codeword `code` of subspace `sub`
    * is the exact decimal-sum mean of that label's subvectors. `code`
    * is the 0-based rank of the label (deterministic).
    *
    * Scale note: the mean is `sum(cast(x as DECIMAL(18,9)))/count` —
    * exact, order-independent, and partial-aggregating (map-side
    * combine; per-group state is one decimal + one long, NOT the
    * group's membership), so a cell with 10⁹ members costs the same
    * buffer as one with 10. The per-(label,sub) cw assembly below
    * collects only `dsub` mean values (bounded by dimension, not
    * corpus). Training may also sample: PQ codebooks converge on a
    * small fraction of the corpus. */
  def codebooks(df: DataFrame, labelCol: String, vecCol: String,
      m: Int): DataFrame = {
    val sv = subvectors(df.select(col(labelCol).as("label"),
      col("vec_id"), col(vecCol).cast("array<double>").as("v")), "v", m)
    val means = sv
      .select(col("label"), col("vec_id"), col("sub"),
        posexplode(col("sv")))
      .groupBy(col("label"), col("sub"), col("pos"))
      .agg((sum(col("col").cast(
          org.apache.spark.sql.types.DecimalType(18, 9)))
        .cast("double") / count(lit(1))).as("mval"))
      .groupBy(col("label"), col("sub"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mval")))),
        x => x.getField("mval")).as("cw"))
    val codes = df.select(col(labelCol).as("label")).distinct()
      .withColumn("code",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("label"))) - 1))
    means.join(broadcast(codes), "label")
      .select(col("sub"), col("code"), col("cw"))
  }

  /** (id, sub, sv): the m per-subspace slices of `vecCol`. */
  private def subvectors(df: DataFrame, vecCol: String,
      m: Int): DataFrame = {
    val dsub = (size(col(vecCol)) / m).cast("int")
    df.select(df.columns.map(col) :+
        explode(sequence(lit(0), lit(m - 1))).as("sub"): _*)
      .withColumn("sv", slice(col(vecCol), col("sub") * dsub + 1, dsub))
      .drop(vecCol)
  }

  /** Encode each corpus vector to its m nearest-codeword codes
    * (squared-L2 per subspace; ties take the lower code). Output
    * (id, codes ARRAY<INT> ordered by sub). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      cb: DataFrame, m: Int): DataFrame =
    subvectors(corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v")), "v", m)
      .join(broadcast(cb), "sub")
      .withColumn("dist2",
        dotF64(col("sv"), col("sv"))
          - lit(2.0) * dotF64(col("sv"), col("cw"))
          + dotF64(col("cw"), col("cw")))
      // min(struct) = argmin with lower-code tie-break, computed with
      // map-side partial aggregation (no per-(id,sub) window sort)
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(col("dist2"), col("code"))).getField("code")
        .as("code"))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** ADC top-k: rank corpus rows by the compressed-domain inner
    * product sum_j table[j][codes_j]. `kCodes` = K (codewords per
    * subspace). Output (qid, cid, score, rnk). */
  def adcTopK(queries: DataFrame, queryIdCol: String,
      encoded: DataFrame, cb: DataFrame, vecCol: String,
      m: Int, kCodes: Int, k: Int): DataFrame = {
    val tables = subvectors(queries.select(col(queryIdCol).as("qid"),
        col(vecCol).cast("array<double>").as("v")), "v", m)
      .join(broadcast(cb), "sub")
      .withColumn("t", dotF64(col("sv"), col("cw")))
      .groupBy(col("qid"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("t")))),
        x => x.getField("t")).as("tbl"))
    val scored = encoded.crossJoin(broadcast(tables))
      .withColumn("score",
        aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, j) => element_at(col("tbl"), j * kCodes + c + 1)),
          lit(0.0), (acc, x) => acc + x))
      .select(col("qid"), col("id"), col("score"))
    TopK.perQuery(scored, k)
  }

  /** Exact cosine re-rank of a (qid, cid) shortlist: ONLY shortlist
    * rows re-join their float vectors — the compressed-domain scan
    * reads the whole corpus, floats are read for
    * shortlist-size·|queries| rows. Public: the shortlist+rerank
    * composition is the registered production shape (q89 value-checks
    * it end-to-end over the int8 shortlist). */
  def exactRerank(shortlist: DataFrame,
      queries: DataFrame, queryIdCol: String, corpus: DataFrame,
      corpusIdCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(queryIdCol).as("qid"),
      col(vecCol).as("qvec"), l2Norm(col(vecCol)).as("qnorm"))
    val c = corpus.select(col(corpusIdCol).as("cid"),
      col(vecCol).as("cvec"), l2Norm(col(vecCol)).as("cnorm"))
    val scored = shortlist.select(col("qid"), col("cid"))
      .join(c, "cid")
      .join(broadcast(q), "qid")
      .withColumn("score",
        dotF64(col("qvec"), col("cvec")) / (col("qnorm") * col("cnorm")))
      .select(col("qid"), col("cid").as("id"), col("score"))
    corpus.schema(corpusIdCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        TopK.perQueryStr(scored, k)
      case _ => TopK.perQuery(scored, k)
    }
  }

  /** The production PQ shape: ADC builds a shortlist of
    * `rerank * k` candidates in the compressed domain, then the
    * shortlist re-ranks exactly ([[exactRerank]]) — at 100 TB that is
    * the difference between re-reading the corpus and re-reading a
    * few thousand rows (RecallBench @ sf0.01, k=10: recall 0.24
    * ADC-only → 0.54/0.70/0.90 at rerank 5/10/20). */
  def adcTopKRerank(queries: DataFrame, queryIdCol: String,
      corpus: DataFrame, corpusIdCol: String, vecCol: String,
      encoded: DataFrame, cb: DataFrame, m: Int, kCodes: Int,
      k: Int, rerank: Int = 10): DataFrame = {
    val shortlist = adcTopK(queries, queryIdCol, encoded, cb, vecCol,
      m, kCodes, k * rerank)
    exactRerank(shortlist, queries, queryIdCol, corpus, corpusIdCol,
      vecCol, k)
  }

  // ---------------------------------------------------------------
  // IVFADC (Jégou et al. 2011 §IV): coarse IVF cells + PQ codes on
  // the RESIDUAL vector (x − centroid). Residuals are much smaller
  // than raw vectors, so the same code budget quantizes far more
  // precisely; the scan prunes to nProbe cells AND reads only codes.
  // ---------------------------------------------------------------

  /** (id, v): L2-normalized copy of `vecCol` (zero vectors pass
    * through) — IP over normalized vectors == cosine, which keeps the
    * ADC score aligned with the exact scan it approximates. */
  private def normalized(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v0"))
      .withColumn("_n", l2Norm(col("v0")))
      .select(col("id"),
        when(col("_n") > 0, transform(col("v0"), x => x / col("_n")))
          .otherwise(col("v0")).as("v"))

  /** Residual PQ codebooks via per-subspace k-means
    * ([[SimilaritySearch.kmeansCentroids]] — deterministic seeding and
    * folds; no label column needed, unlike [[codebooks]]). Training
    * is m small k-means jobs over subvector slices; `maxTrain > 0`
    * trains on a deterministic md5-bucket sample
    * ([[SimilaritySearch.trainingSample]]) — PQ codebooks converge on
    * a corpus fraction, so at 100 TB training cost stays bounded
    * while encode still streams the full corpus.
    * Returns (sub, code, cw). */
  def codebooksKmeans(vecs: DataFrame, idCol: String, vecCol: String,
      m: Int, kCodes: Int, maxIter: Int = 5,
      maxTrain: Int = 0): DataFrame = {
    val train = if (maxTrain > 0)
      SimilaritySearch.trainingSample(vecs, idCol, maxTrain) else vecs
    val base = subvectors(
      train.select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("v")), "v", m).persist()
    val cbs = (0 until m).map { j =>
      SimilaritySearch.kmeansCentroids(
        base.filter(col("sub") === j).select(col("_id"), col("sv")),
        "_id", "sv", kCodes, maxIter)
        .select(lit(j).as("sub"), col("cell_id").as("code"),
          col("centroid").as("cw"))
    }.reduce(_ unionByName _).localCheckpoint()
    base.unpersist()
    cbs
  }

  /** Build the IVFADC index: assign each (normalized) corpus vector
    * to its nearest coarse cell, PQ-encode the residual. Output
    * (id, cell_id, codes) — the only thing the search scan reads. */
  def ivfadcIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cb: DataFrame, m: Int): DataFrame = {
    val v = normalized(corpus, idCol, vecCol)
    val cellW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(desc("_sc"), col("cell_id"))
    val assigned = v.crossJoin(broadcast(centroids))
      .withColumn("_sc", cosine(col("v"), col("centroid")))
      .withColumn("_r", row_number().over(cellW))
      .filter(col("_r") === 1)
      .select(col("id"), col("cell_id"),
        zip_with(col("v"), col("centroid"), (a, b) => a - b).as("res"))
    assigned.select(col("id"), col("cell_id"))
      .join(encode(assigned, "id", "res", cb, m), "id")
  }

  /** IVFADC search: each query probes its `nProbe` nearest cells; per
    * (query, cell) the ADC table is built against the query's OWN
    * residual in that cell, and score = dot(q, centroid) +
    * Σ_j table[j][codes_j] ≈ dot(q, centroid + residual̂) — cosine,
    * since both sides are normalized. The scan joins the index on
    * cell_id (hash join on a small key; probe side broadcast), reads
    * only codes, and feeds the bounded-heap top-k; `rerank > 0` adds
    * the exact float re-rank of the shortlist. */
  def ivfadcTopK(queries: DataFrame, queryIdCol: String,
      corpus: DataFrame, corpusIdCol: String, vecCol: String,
      centroids: DataFrame, cb: DataFrame, index: DataFrame,
      m: Int, kCodes: Int, k: Int, nProbe: Int = 4,
      rerank: Int = 0): DataFrame = {
    val cellW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("_sc"), col("cell_id"))
    val probes = normalized(queries, queryIdCol, vecCol)
      .withColumnRenamed("id", "qid")
      .crossJoin(broadcast(centroids))
      .withColumn("_sc", cosine(col("v"), col("centroid")))
      .withColumn("_r", row_number().over(cellW))
      .filter(col("_r") <= nProbe)
      .select(col("qid"), col("cell_id"),
        dotF64(col("v"), col("centroid")).as("cell_dot"),
        zip_with(col("v"), col("centroid"), (a, b) => a - b).as("v"))
    val tables = subvectors(probes, "v", m)
      .join(broadcast(cb), "sub")
      .withColumn("t", dotF64(col("sv"), col("cw")))
      .groupBy(col("qid"), col("cell_id"), col("cell_dot"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code"), col("t")))),
        x => x.getField("t")).as("tbl"))
    val scored = index.join(broadcast(tables), "cell_id")
      .withColumn("score",
        col("cell_dot") + aggregate(
          zip_with(col("codes"), sequence(lit(0), lit(m - 1)),
            (c, j) => element_at(col("tbl"), j * kCodes + c + 1)),
          lit(0.0), (acc, x) => acc + x))
      .select(col("qid"), col("id"), col("score"))
    val shortlist = TopK.perQuery(scored,
      if (rerank > 0) k * rerank else k)
    if (rerank > 0)
      exactRerank(shortlist, queries, queryIdCol, corpus, corpusIdCol,
        vecCol, k)
    else shortlist
  }
}
