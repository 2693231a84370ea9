package graft.operators

import graft.SparkTestBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** JVM-global recording state: Spark serializes task closures even in
  * local mode, so mutable state must live in a static object (shared
  * by the same-JVM executor threads), keyed per test. */
object EmbedSpecState {
  import java.util.concurrent._
  val batchSizes = new ConcurrentHashMap[String, CopyOnWriteArrayList[Int]]
  val prefixes = new ConcurrentHashMap[String, CopyOnWriteArrayList[String]]
  val counters = new ConcurrentHashMap[String, atomic.AtomicInteger]
  def sizes(key: String): CopyOnWriteArrayList[Int] =
    batchSizes.computeIfAbsent(key, _ => new CopyOnWriteArrayList[Int])
  def texts(key: String): CopyOnWriteArrayList[String] =
    prefixes.computeIfAbsent(key, _ => new CopyOnWriteArrayList[String])
  def counter(key: String, init: Int): atomic.AtomicInteger =
    counters.computeIfAbsent(key, _ => new atomic.AtomicInteger(init))
  def sizesSeq(key: String): Seq[Int] =
    scala.jdk.CollectionConverters.ListHasAsScala(sizes(key)).asScala.toSeq
  def textsSeq(key: String): Seq[String] =
    scala.jdk.CollectionConverters.ListHasAsScala(texts(key)).asScala.toSeq
}

/** Records batches into [[EmbedSpecState]]; delegates to the hash
  * stub. Top-level class — no outer-spec capture. */
class RecordingEmbedService(key: String, dim: Int)
    extends Embed.EmbeddingService {
  private val inner = new Embed.HashEmbeddingService(dim)
  def embed(batch: Seq[String]): Seq[Array[Double]] = {
    EmbedSpecState.sizes(key).add(batch.size)
    batch.foreach(EmbedSpecState.texts(key).add)
    inner.embed(batch)
  }
}

/** Fails the first `n` calls (global countdown), then succeeds. */
class FlakyEmbedService(key: String, dim: Int)
    extends Embed.EmbeddingService {
  private val inner = new Embed.HashEmbeddingService(dim)
  def embed(batch: Seq[String]): Seq[Array[Double]] = {
    if (EmbedSpecState.counter(key, 2).getAndDecrement() > 0)
      throw new RuntimeException("transient")
    inner.embed(batch)
  }
}

class RecordingGenerator(key: String) extends Rag.Generator {
  def generate(prompts: Seq[String]): Seq[String] = {
    EmbedSpecState.sizes(key).add(prompts.size)
    prompts.map(_ => "ans")
  }
}

class RecordingNormalizer(key: String) extends Ingest.NormalizerService {
  def normalize(batch: Seq[String]): Seq[String] = {
    EmbedSpecState.sizes(key).add(batch.size)
    batch
  }
}

/** EmbeddingService boundary (V1/V2): micro-batching, retry behavior,
  * prefix convention, and bit-parity with the mock-embedding column
  * expression. */
class EmbedSpec extends SparkTestBase {

  test("HashEmbeddingService is bit-identical to mockEmbedding (V1)") {
    import spark.implicits._
    val texts = Seq("passage: [DOC_00000001] some text", "query: other", "")
    val viaColumn = texts.toDF("t")
      .select(VectorFunctions.mockEmbedding(col("t"), 8))
      .collect().map(_.getSeq[Double](0))
    val viaService = new Embed.HashEmbeddingService(8).embed(texts)
    viaColumn.zip(viaService).foreach { case (c, s) =>
      assert(c === s.toSeq)
    }
  }

  test("embedText micro-batches at the reference size 5 and prepends " +
      "the query prefix (V2, llm_setup.py:74-101)") {
    import spark.implicits._
    val svc = new RecordingEmbedService("batching", 4)
    val df = (1 to 12).map(i => (i.toLong, s"text $i"))
      .toDF("qid", "qtext")
      .coalesce(1)
    val embedded = Embed.embedText(df, "qtext", "embedding", svc,
      prefix = Embed.QueryPrefix)
    assert(embedded.count() === 12)
    val sizes = EmbedSpecState.sizesSeq("batching")
    assert(sizes.forall(_ <= Embed.MicroBatch))
    assert(sizes.sum === 12)
    assert(EmbedSpecState.textsSeq("batching")
      .forall(_.startsWith("query: ")))
  }

  test("embedText retries transient failures with backoff " +
      "(consumer_utils.py:73-103 semantics)") {
    import spark.implicits._
    val svc = new FlakyEmbedService("flaky", 4)
    val out = Embed.embedText(
      Seq((1L, "a")).toDF("qid", "qtext").coalesce(1),
      "qtext", "embedding", svc, sleep = _ => ())
    assert(out.count() === 1)
    assert(EmbedSpecState.counter("flaky", 2).get() <= 0)
  }

  test("generate and normalize stream micro-batches, never the whole " +
      "partition") {
    import spark.implicits._
    val contexts = (1 to 45).map(i => (i.toLong, s"ctx $i"))
      .toDF("qid", "context").coalesce(1)
    assert(Rag.generate(contexts, new RecordingGenerator("gen"),
      batchSize = 10).count() === 45)
    val gsizes = EmbedSpecState.sizesSeq("gen")
    assert(gsizes.forall(_ <= 10) && gsizes.sum === 45)

    // "tiny" fails the quality gate (low token count) → all rows route
    // to the service, in batches of at most 5
    val docs = (1 to 23).map(i => (i.toLong, "tiny"))
      .toDF("id", "text").coalesce(1)
    assert(Ingest.normalize(docs, "text",
      new RecordingNormalizer("norm")).count() === 23)
    val nsizes = EmbedSpecState.sizesSeq("norm")
    assert(nsizes.forall(_ <= 5) && nsizes.sum === 23)
  }
}
