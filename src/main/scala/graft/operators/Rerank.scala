package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-encoder RERANK boundary — the second stage of the standard
  * retrieve→rerank cascade (jina/cohere-style `/rerank` APIs; the
  * candidate stages feeding it are the already-gated q31 cosine and
  * q37/q115 BM25 retrievers). Same external-service shape as the
  * reference's other boundaries (V1 embeddings
  * `utils/llm_setup.py:74-101`, S3 OCR, S5 ASR): per-partition
  * micro-batches through a serializable service trait with
  * exponential-backoff retries — an HTTP implementation drops in
  * exactly like [[Embed]]'s embeddings client.
  *
  * Scale: scoring is map-side over the candidate rows (no shuffle);
  * the only exchange is the final per-query top-k window over ≤
  * (queries × candidateK) rows — the cascade's entire point is that
  * the expensive scorer sees candidateK rows per query, never the
  * corpus. */
object Rerank {

  /** Service-call micro-batch (the cross-encoder analog of
    * `Embed.MicroBatch`). */
  val MicroBatch = 8

  trait RerankService extends Serializable {
    /** Relevance scores for (query, passage) pairs, in input order. */
    def score(batch: Seq[(String, String)]): Seq[Double]
  }

  /** Deterministic stub: score = pmod(mmh3(q ++ 0x01 ++ p), 1e6)/1e6
    * over the same seed-0 murmur3 as the id family — SQL-recomputable
    * (the [[Embed.HashEmbeddingService]] device), so a full cascade's
    * output is value-checkable against the DuckDB oracle. */
  class HashRerankService extends RerankService {
    def score(batch: Seq[(String, String)]): Seq[Double] =
      batch.map { case (q, p) =>
        val h = graft.functions.Murmur3
          .hash32((q + "\u0001" + p).getBytes("UTF-8"), 0).toLong
        (((h % 1000000) + 1000000) % 1000000).toDouble / 1000000.0
      }
  }

  /** Score candidate (query, passage) rows through `service` and keep
    * the top `k` per query by (score DESC, passage id) — the
    * deterministic total order. Candidates stream through
    * `mapPartitions` in lazy micro-batches (constant memory per
    * partition) with retries around every call. */
  def rerankTopK(candidates: DataFrame, qIdCol: String,
      qTextCol: String, pIdCol: String, pTextCol: String,
      service: RerankService, k: Int, batchSize: Int = MicroBatch,
      attempts: Int = 5,
      sleep: Long => Unit = Thread.sleep): DataFrame = {
    val schema = StructType(candidates.schema.fields :+
      StructField("rerank_score", DoubleType, nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val qi = candidates.schema.fieldIndex(qTextCol)
    val pi = candidates.schema.fieldIndex(pTextCol)
    val scored = candidates.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val pairs = batch.map(r => (r.getString(qi), r.getString(pi)))
        val ss = Endpoints.withRetries(attempts, sleep = sleep)(
          service.score(pairs))
        // a service returning a short/long list would silently drop
        // or misalign candidates under zip — fail fast instead
        require(ss.length == pairs.length,
          s"rerank service returned ${ss.length} scores for " +
            s"${pairs.length} pairs")
        batch.iterator.zip(ss.iterator).map { case (r, sc) =>
          Row.fromSeq(r.toSeq :+ sc)
        }
      }
    }(enc)
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(qIdCol))
          .orderBy(desc("rerank_score"), col(pIdCol))))
      .filter(col("rnk") <= k)
  }

  /** Margin-MSE distillation pair mining (Hofstätter et al. 2020 —
    * the training data a bi-encoder student distills from): from
    * teacher-scored candidates ([[rerankTopK]] output), the
    * teacher's top passage becomes the POSITIVE and the next
    * `nNegatives` become the hard negatives, each pair carrying the
    * teacher margin `pos_score − neg_score` the student's score
    * difference regresses onto. Taking negatives from the teacher's
    * own top ranks (not random docs) is the method's point: these
    * are the retriever's confusable near-misses.
    *
    * Scale: one hash join on qid between two rank-filtered slices of
    * the same scored frame — both sides are ≤ nNegatives+1 rows per
    * query, never corpus-sized. The margin is one IEEE subtraction
    * of two already-deterministic doubles. */
  def distillationPairs(reranked: DataFrame, qIdCol: String,
      pIdCol: String, nNegatives: Int): DataFrame = {
    val pos = reranked.filter(col("rnk") === 1)
      .select(col(qIdCol), col(pIdCol).as("pos_id"),
        col("rerank_score").as("pos_score"))
    val negs = reranked
      .filter(col("rnk") > 1 && col("rnk") <= nNegatives + 1)
      .select(col(qIdCol), col(pIdCol).as("neg_id"),
        col("rerank_score").as("neg_score"),
        (col("rnk") - 1).as("neg_rank"))
    pos.join(negs, Seq(qIdCol))
      .withColumn("margin", col("pos_score") - col("neg_score"))
  }
}
