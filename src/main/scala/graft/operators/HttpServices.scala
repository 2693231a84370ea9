package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Production implementations of the external-service boundaries over
  * the OpenAI-compatible HTTP protocol the reference speaks
  * (`utils/llm_setup.py:74-101` POSTs `/v1/embeddings` micro-batches;
  * `llm_setup.py:212-266` RemoteLlama POSTs `/v1/chat/completions`).
  * JDK `java.net.http` client + the Jackson shipped with Spark — no
  * extra dependencies. One client per service instance; instances are
  * created per partition by the mapPartitions drivers, giving the
  * connection reuse the reference gets from its per-process
  * singletons (`llm_setup.py:29-42`).
  *
  * Retries/backoff stay OUTSIDE (the drivers wrap calls in
  * `Endpoints.withRetries`), matching the reference's layering.
  */
object HttpServices {

  private def mapper = new ObjectMapper()

  /** V1/V2 dense embedding over `POST {endpoint}/v1/embeddings`. */
  class HttpEmbeddingService(endpoint: String, model: String,
      apiKey: Option[String] = None, timeoutSec: Long = 60)
      extends Embed.EmbeddingService {

    @transient private lazy val client: HttpClient =
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec)).build()

    def embed(batch: Seq[String]): Seq[Array[Double]] = {
      val om = mapper
      val body = om.createObjectNode()
      body.put("model", model)
      val arr = body.putArray("input")
      batch.foreach(arr.add)
      val req = {
        val b = HttpRequest.newBuilder(
            URI.create(s"$endpoint/v1/embeddings"))
          .timeout(Duration.ofSeconds(timeoutSec))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            om.writeValueAsString(body)))
        apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
        b.build()
      }
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(
          s"embeddings HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      val root = om.readTree(resp.body())
      val data = root.get("data")
      require(data != null && data.size() == batch.length,
        s"embeddings response size ${if (data == null) -1 else data.size()}" +
          s" != batch ${batch.length}")
      (0 until data.size()).map { i =>
        val e = data.get(i).get("embedding")
        Array.tabulate(e.size())(j => e.get(j).asDouble())
      }
    }
  }

  /** R2 grounded generation over `POST {endpoint}/v1/chat/completions`
    * (temperature 0.0 like the reference's strict-citation chat,
    * `chroma_chat.py:47-72`). One completion per prompt. */
  class HttpGenerator(endpoint: String, model: String,
      systemPrompt: String = "", temperature: Double = 0.0,
      apiKey: Option[String] = None, timeoutSec: Long = 120)
      extends Rag.Generator {

    @transient private lazy val client: HttpClient =
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec)).build()

    def generate(prompts: Seq[String]): Seq[String] = prompts.map { p =>
      val om = mapper
      val body = om.createObjectNode()
      body.put("model", model)
      body.put("temperature", temperature)
      val msgs = body.putArray("messages")
      if (systemPrompt.nonEmpty) {
        val sys = msgs.addObject()
        sys.put("role", "system"); sys.put("content", systemPrompt)
      }
      val usr = msgs.addObject()
      usr.put("role", "user"); usr.put("content", p)
      val req = {
        val b = HttpRequest.newBuilder(
            URI.create(s"$endpoint/v1/chat/completions"))
          .timeout(Duration.ofSeconds(timeoutSec))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            om.writeValueAsString(body)))
        apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
        b.build()
      }
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(
          s"chat HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      val root = om.readTree(resp.body())
      root.get("choices").get(0).get("message").get("content").asText()
    }
  }
}
