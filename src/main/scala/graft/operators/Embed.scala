package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** V1/V2: the dense-embedding external-service boundary (SURVEY
  * §2.11 — the reference's single most important external call,
  * `utils/llm_setup.py:74-101`: batched POST to an OpenAI-compatible
  * `/v1/embeddings`, micro-batch 5, asymmetric e5 prefixes
  * `"query: "` / `"passage: "`; upsert-side batching at
  * `services/database.py:139-160`).
  *
  * Shape: `mapPartitions` with a lazily-grouped micro-batch iterator —
  * constant memory per partition regardless of partition size — plus
  * the reference's 5-attempt exponential-backoff retry
  * ([[Endpoints.withRetries]]) around every service call. Endpoint
  * selection per partition via [[Endpoints.forPartition]] replaces the
  * reference's HA interleave dispatcher (C7).
  */
object Embed {

  /** Reference embed micro-batch (`shared/defaults.py:81`). */
  val MicroBatch = 5

  /** e5 asymmetric prefixes (`llm_setup.py:94-101`,
    * `producer_graph.py:92-99`). */
  val QueryPrefix = "query: "
  val PassagePrefix = "passage: "

  /** External embedding boundary: implementations run per-partition
    * with connection reuse; tests use the deterministic
    * [[HashEmbeddingService]]. */
  trait EmbeddingService extends Serializable {
    def embed(batch: Seq[String]): Seq[Array[Double]]
  }

  /** Deterministic stub with BIT-IDENTICAL output to
    * `VectorFunctions.mockEmbedding`: component i is
    * `pmod(mmh3("text#i"), 1e6)/1e6 − 0.5` over the same seed-0
    * murmur3 as the id family — so a pipeline can swap the column
    * expression for the service boundary without changing a single
    * output row, and the DuckDB oracle can recompute the vectors. */
  class HashEmbeddingService(dim: Int) extends EmbeddingService {
    def embed(batch: Seq[String]): Seq[Array[Double]] =
      batch.map { text =>
        val t = if (text == null) "" else text
        Array.tabulate(dim) { i =>
          val h = graft.functions.Murmur3
            .hash32(s"$t#$i".getBytes("UTF-8"), 0).toLong
          (((h % 1000000) + 1000000) % 1000000).toDouble / 1000000.0 - 0.5
        }
      }
  }

  /** Embed `textCol` (with `prefix` prepended service-side, matching
    * the reference's asymmetric-prefix convention) into `outCol` as
    * `ARRAY<DOUBLE>`. Micro-batches of `batchSize` flow through the
    * service lazily — `rows.grouped` never materializes the
    * partition — and each call retries with exponential backoff. */
  def embedText(df: DataFrame, textCol: String, outCol: String,
      service: EmbeddingService, prefix: String = "",
      batchSize: Int = MicroBatch, attempts: Int = 5,
      sleep: Long => Unit = Thread.sleep): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(DoubleType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => prefix + r.getString(idx))
        val vecs = Endpoints.withRetries(attempts, sleep = sleep)(
          service.embed(texts))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(enc)
  }
}
