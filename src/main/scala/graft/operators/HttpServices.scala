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

  /** Cross-encoder rerank over `POST {endpoint}/rerank` — the
    * cohere/jina-style public API shape ({model, query, documents[]}
    * in; {results: [{index, relevance_score}]} out). A rerank
    * micro-batch may span queries, but the API is query-scoped, so
    * the client issues one request per DISTINCT query in the batch
    * and maps scores back through the reply's `index` field (reply
    * order-independent, as the public APIs document). A
    * size-mismatched reply throws so [[Endpoints.withRetries]] and
    * [[Rerank.rerankTopK]]'s alignment guard engage. */
  class HttpRerankService(endpoint: String, model: String,
      apiKey: Option[String] = None, timeoutSec: Long = 60)
      extends Rerank.RerankService {

    @transient private lazy val client: HttpClient =
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec)).build()

    def score(batch: Seq[(String, String)]): Seq[Double] = {
      val om = mapper
      val out = new Array[Double](batch.length)
      batch.zipWithIndex.groupBy(_._1._1).foreach {
        case (q, items) =>
          val body = om.createObjectNode()
          body.put("model", model)
          body.put("query", q)
          val docs = body.putArray("documents")
          items.foreach { case ((_, p), _) => docs.add(p) }
          val req = {
            val b = HttpRequest.newBuilder(
                URI.create(s"$endpoint/rerank"))
              .timeout(Duration.ofSeconds(timeoutSec))
              .header("Content-Type", "application/json")
              .POST(HttpRequest.BodyPublishers.ofString(
                om.writeValueAsString(body)))
            apiKey.foreach(k =>
              b.header("Authorization", s"Bearer $k"))
            b.build()
          }
          val resp = client.send(req,
            HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() / 100 != 2)
            throw new RuntimeException(
              s"rerank HTTP ${resp.statusCode()}: " +
                resp.body().take(200))
          val results = om.readTree(resp.body()).get("results")
          require(results != null && results.size() == items.length,
            s"rerank response size " +
              s"${if (results == null) -1 else results.size()}" +
              s" != documents ${items.length}")
          (0 until results.size()).foreach { i =>
            val r = results.get(i)
            val idx = r.get("index").asInt()
            require(idx >= 0 && idx < items.length,
              s"rerank reply index $idx out of range")
            out(items(idx)._2) = r.get("relevance_score").asDouble()
          }
      }
      out.toIndexedSeq
    }
  }

  /** S3 OCR over `POST {endpoint}/ocr`: one request per page, JSON
    * fields mirroring the reference's OCR job exactly
    * (`utils/ocr_utils.py:60-77`: job_id, rel_path, page_num,
    * image_shape, image_dtype, image_base64) and the worker's reply
    * shape (`workers/ocr_graph.py:86-94`: text, rel_path, page_num,
    * engine, job_id, error, status) — only the Redis list transport
    * is replaced by the HTTP request/reply this engine standardizes
    * on. A non-"success" status or a job_id mismatch throws so
    * `Endpoints.withRetries` (the reference's 5-retry backoff) can
    * engage. */
  class HttpOcrService(endpoint: String, timeoutSec: Long = 300)
      extends Extract.OcrService {

    @transient private lazy val client: HttpClient =
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec)).build()

    def ocrPage(image: Array[Byte], height: Int, width: Int,
        relPath: String, page: Int): Extract.OcrText = {
      val om = mapper
      val jobId = java.util.UUID.randomUUID().toString
      val body = om.createObjectNode()
      body.put("job_id", jobId)
      body.put("rel_path", relPath)
      body.put("page_num", page)
      val shape = body.putArray("image_shape")
      shape.add(height); shape.add(width)
      body.put("image_dtype", "uint8")
      body.put("image_base64",
        java.util.Base64.getEncoder.encodeToString(
          if (image == null) Array.emptyByteArray else image))
      val req = HttpRequest.newBuilder(URI.create(s"$endpoint/ocr"))
        .timeout(Duration.ofSeconds(timeoutSec))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          om.writeValueAsString(body)))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(
          s"ocr HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      val root = om.readTree(resp.body())
      val status =
        if (root.hasNonNull("status")) root.get("status").asText() else ""
      if (status != "success") {
        val err = if (root.hasNonNull("error"))
          root.get("error").asText() else "unknown"
        throw new RuntimeException(s"ocr failed for $relPath p$page: $err")
      }
      require(root.get("job_id").asText() == jobId,
        s"ocr reply job_id mismatch for $relPath p$page")
      Extract.OcrText(root.get("text").asText(""),
        if (root.hasNonNull("engine")) root.get("engine").asText()
        else "unknown")
    }
  }

  /** Frame decode over `POST {endpoint}/decode_frame` — the
    * production client for the H.264/VP9 external-codec boundary
    * ([[Multimodal.FrameDecodeService]]): the job carries exactly
    * the row the container walks emit (media_id, frame_idx, codec)
    * plus the base64 payload (inline, the OCR convention — HTTP
    * peers share no volume), and the reply is a base64 row-major
    * 8-bit luma plane with its dimensions. `status` protocol:
    * "success" → the plane (length must be width·height, checked);
    * "unsupported" → None (the service explicitly declines the
    * codec, the row drops like an undecodable image); anything else
    * (or a job_id mismatch, or a malformed plane) throws so
    * `Endpoints.withRetries` can engage. */
  class HttpFrameDecodeService(endpoint: String,
      timeoutSec: Long = 300) extends Multimodal.FrameDecodeService {

    @transient private lazy val client: HttpClient =
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec)).build()

    def decodeFrame(job: Multimodal.FrameJob)
        : Option[Multimodal.GrayFrame] = {
      val om = mapper
      val jobId = java.util.UUID.randomUUID().toString
      val body = om.createObjectNode()
      body.put("job_id", jobId)
      body.put("media_id", job.mediaId)
      body.put("frame_idx", job.frameIdx)
      body.put("codec", job.codec)
      body.put("payload_base64",
        java.util.Base64.getEncoder.encodeToString(
          if (job.payload == null) Array.emptyByteArray
          else job.payload))
      val req = HttpRequest.newBuilder(
          URI.create(s"$endpoint/decode_frame"))
        .timeout(Duration.ofSeconds(timeoutSec))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          om.writeValueAsString(body)))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"decode_frame HTTP " +
          s"${resp.statusCode()}: ${resp.body().take(200)}")
      val root = om.readTree(resp.body())
      val status =
        if (root.hasNonNull("status")) root.get("status").asText()
        else ""
      if (status == "unsupported") return None
      if (status != "success") {
        val err = if (root.hasNonNull("error"))
          root.get("error").asText() else "unknown"
        throw new RuntimeException(s"decode_frame failed for " +
          s"${job.mediaId}#${job.frameIdx} (${job.codec}): $err")
      }
      require(root.get("job_id").asText() == jobId,
        s"decode_frame reply job_id mismatch for " +
          s"${job.mediaId}#${job.frameIdx}")
      val w = root.get("width").asInt()
      val h = root.get("height").asInt()
      val luma = java.util.Base64.getDecoder.decode(
        root.get("luma_base64").asText(""))
      require(w > 0 && h > 0 && luma.length == w * h,
        s"decode_frame malformed plane for " +
          s"${job.mediaId}#${job.frameIdx}: ${w}x$h vs " +
          s"${luma.length} bytes")
      Some(Multimodal.GrayFrame(w, h, luma))
    }
  }

  /** S5 ASR over `POST {endpoint}/transcribe`: the WhisperX worker's
    * job fields (`utils/whisper_utils.py:118-135`: job_id, language,
    * mime_type — audio travels base64-inline since HTTP peers share
    * no volume, where the reference sends a shared-filesystem path)
    * and its segment-stream reply protocol verbatim
    * (`workers/whisperx_worker.py:159-165`): newline-delimited JSON
    * messages `{"type":"segment","text":...}` terminated by
    * `{"type":"done"}`, with `{"type":"error","error":...}` aborting
    * the stream. Optional per-segment start/end timestamps are
    * honored; absent ones fall back to the 5-second grid the stub ASR
    * uses, keeping both implementations interchangeable in specs. */
  class HttpAsrService(endpoint: String, language: String = "en",
      mimeType: String = "audio/wav", timeoutSec: Long = 1800)
      extends Extract.AsrService {

    @transient private lazy val client: HttpClient =
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofSeconds(timeoutSec)).build()

    def transcribe(bytes: Array[Byte]): Seq[(Double, Double, String)] = {
      val om = mapper
      val body = om.createObjectNode()
      body.put("job_id", java.util.UUID.randomUUID().toString)
      body.put("language", language)
      body.put("mime_type", mimeType)
      body.put("audio_base64",
        java.util.Base64.getEncoder.encodeToString(
          if (bytes == null) Array.emptyByteArray else bytes))
      val req = HttpRequest.newBuilder(
          URI.create(s"$endpoint/transcribe"))
        .timeout(Duration.ofSeconds(timeoutSec))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          om.writeValueAsString(body)))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(
          s"transcribe HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
      val out = Seq.newBuilder[(Double, Double, String)]
      var done = false
      var i = 0
      for (line <- resp.body().split("\n") if line.trim.nonEmpty if !done) {
        val msg = om.readTree(line)
        msg.get("type").asText() match {
          case "segment" =>
            val s = if (msg.hasNonNull("start")) msg.get("start").asDouble()
              else i * 5.0
            val e = if (msg.hasNonNull("end")) msg.get("end").asDouble()
              else (i + 1) * 5.0
            out += ((s, e, msg.get("text").asText()))
            i += 1
          case "done" => done = true
          case "error" =>
            throw new RuntimeException("asr worker error: " +
              msg.get("error").asText("unknown"))
          case other =>
            throw new RuntimeException(s"asr unknown message type: $other")
        }
      }
      if (!done)
        throw new RuntimeException(
          "asr stream ended without a done message")
      out.result()
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
