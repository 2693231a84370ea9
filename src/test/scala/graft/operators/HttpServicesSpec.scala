package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** The OpenAI-compatible HTTP clients against a local JDK HttpServer
  * that speaks the same protocol — the whole request/response path is
  * real, only the model behind it is canned. */
class HttpServicesSpec extends AnyFunSuite {

  private def withServer(paths: Map[String, String => String])
      (f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    paths.foreach { case (path, handler) =>
      server.createContext(path, new HttpHandler {
        def handle(ex: HttpExchange): Unit = {
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val resp = handler(body).getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
          ex.close()
        }
      })
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("HttpEmbeddingService posts the batch and parses vectors (V1)") {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]
    withServer(Map("/v1/embeddings" -> { body =>
      seen.set(body)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = om.readTree(body).get("input").size()
      val data = (0 until n).map(i =>
        s"""{"embedding":[$i.0,${i + 1}.0]}""").mkString(",")
      s"""{"data":[$data]}"""
    })) { base =>
      val svc = new HttpServices.HttpEmbeddingService(base, "e5-test")
      val out = svc.embed(Seq("query: a", "passage: b"))
      assert(out.length === 2)
      assert(out(0).toSeq === Seq(0.0, 1.0))
      assert(out(1).toSeq === Seq(1.0, 2.0))
      assert(seen.get().contains("\"model\":\"e5-test\""))
      assert(seen.get().contains("query: a"))
    }
  }

  test("HttpEmbeddingService rejects size-mismatched responses so " +
      "retries can engage") {
    withServer(Map("/v1/embeddings" -> { _ =>
      """{"data":[{"embedding":[1.0]}]}"""
    })) { base =>
      val svc = new HttpServices.HttpEmbeddingService(base, "m")
      intercept[IllegalArgumentException] {
        svc.embed(Seq("a", "b"))
      }
    }
  }

  test("HttpRerankService groups a mixed batch per query, posts the " +
      "cohere/jina shape, and maps scores back through reply indexes " +
      "even when the reply is reordered") {
    withServer(Map("/rerank" -> { body =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(body)
      val q = root.get("query").asText()
      val n = root.get("documents").size()
      // reply in REVERSED order: the client must honor `index`
      (n - 1 to 0 by -1).map { i =>
        val d = root.get("documents").get(i).asText()
        s"""{"index":$i,"relevance_score":${q.length * 100 + d.length}.5}"""
      }.mkString("""{"results":[""", ",", "]}")
    })) { base =>
      val svc = new HttpServices.HttpRerankService(base, "ce-test")
      val out = svc.score(Seq(
        ("qa", "pppp"), ("qbbb", "pp"), ("qa", "p")))
      assert(out === Seq(204.5, 402.5, 201.5))
    }
  }

  test("HttpRerankService rejects a size-mismatched reply so retries " +
      "and the alignment guard engage") {
    withServer(Map("/rerank" -> { _ =>
      """{"results":[{"index":0,"relevance_score":1.0}]}"""
    })) { base =>
      val svc = new HttpServices.HttpRerankService(base, "ce-test")
      intercept[IllegalArgumentException] {
        svc.score(Seq(("q", "a"), ("q", "b")))
      }
    }
  }

  test("HttpOcrService posts the reference OCR job fields and parses " +
      "the worker reply (S3)") {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]
    withServer(Map("/ocr" -> { body =>
      seen.set(body)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val j = om.readTree(body)
      val img = new String(java.util.Base64.getDecoder.decode(
        j.get("image_base64").asText()), "UTF-8")
      s"""{"text":"ocr: $img","rel_path":"${j.get("rel_path").asText()}",
         |"page_num":${j.get("page_num").asInt()},"engine":"easyocr",
         |"job_id":"${j.get("job_id").asText()}","error":null,
         |"status":"success"}""".stripMargin.replace("\n", "")
    })) { base =>
      val svc = new HttpServices.HttpOcrService(base)
      val r = svc.ocrPage("hello page".getBytes("UTF-8"), 4, 5,
        "docs/scan.pdf", 3)
      assert(r.text === "ocr: hello page")
      assert(r.engine === "easyocr")
      val req = seen.get()
      assert(req.contains("\"image_shape\":[4,5]"))
      assert(req.contains("\"image_dtype\":\"uint8\""))
      assert(req.contains("\"rel_path\":\"docs/scan.pdf\""))
      assert(req.contains("\"page_num\":3"))
    }
  }

  test("HttpOcrService surfaces a failed worker status so retries " +
      "can engage") {
    withServer(Map("/ocr" -> { body =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val id = om.readTree(body).get("job_id").asText()
      s"""{"text":"","job_id":"$id","engine":"easyocr",
         |"error":"No text extracted","status":"failed"}"""
        .stripMargin.replace("\n", "")
    })) { base =>
      val svc = new HttpServices.HttpOcrService(base)
      val e = intercept[RuntimeException] {
        svc.ocrPage("x".getBytes, 1, 1, "a.pdf", 1)
      }
      assert(e.getMessage.contains("No text extracted"))
    }
  }

  test("HttpAsrService parses the segment-stream reply protocol (S5)") {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]
    withServer(Map("/transcribe" -> { body =>
      seen.set(body)
      Seq(
        """{"type":"segment","text":"first words","start":0.5,"end":2.25}""",
        """{"type":"segment","text":"second words"}""",
        """{"type":"done"}""").mkString("\n")
    })) { base =>
      val svc = new HttpServices.HttpAsrService(base, language = "en",
        mimeType = "audio/wav")
      val segs = svc.transcribe("RIFFfakewav".getBytes("UTF-8"))
      assert(segs === Seq((0.5, 2.25, "first words"),
        (5.0, 10.0, "second words")))
      assert(seen.get().contains("\"language\":\"en\""))
      assert(seen.get().contains("\"mime_type\":\"audio/wav\""))
    }
  }

  test("HttpAsrService raises on a worker error message and on a " +
      "stream missing its done terminal") {
    withServer(Map("/transcribe" -> { _ =>
      """{"type":"error","error":"File not found: x.wav"}"""
    })) { base =>
      val e = intercept[RuntimeException] {
        new HttpServices.HttpAsrService(base).transcribe("x".getBytes)
      }
      assert(e.getMessage.contains("File not found"))
    }
    withServer(Map("/transcribe" -> { _ =>
      """{"type":"segment","text":"truncated"}"""
    })) { base =>
      val e = intercept[RuntimeException] {
        new HttpServices.HttpAsrService(base).transcribe("x".getBytes)
      }
      assert(e.getMessage.contains("done"))
    }
  }

  test("HttpGenerator posts chat messages and parses the completion " +
      "(R2)") {
    withServer(Map("/v1/chat/completions" -> { body =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val msgs = om.readTree(body).get("messages")
      val user = msgs.get(msgs.size() - 1).get("content").asText()
      val answer = s"answered: ${user.take(20)} [source1]"
      s"""{"choices":[{"message":{"role":"assistant","content":"$answer"}}]}"""
    })) { base =>
      val gen = new HttpServices.HttpGenerator(base, "phi-test",
        systemPrompt = "cite strictly")
      val out = gen.generate(Seq("ctx one", "ctx two"))
      assert(out === Seq("answered: ctx one [source1]",
        "answered: ctx two [source1]"))
    }
  }

  test("HttpFrameDecodeService posts the container-walk row, parses " +
      "the luma plane, maps 'unsupported' to None, and throws on a " +
      "malformed plane so retries can engage") {
    val seen = new java.util.concurrent.atomic.AtomicReference[String]
    withServer(Map("/decode_frame" -> { body =>
      seen.set(body)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(body)
      val jid = root.get("job_id").asText()
      root.get("codec").asText() match {
        case "avc1" =>
          val luma = java.util.Base64.getEncoder
            .encodeToString(Array[Byte](10, 20, 30, 40))
          s"""{"status":"success","job_id":"$jid","width":2,""" +
            s""""height":2,"luma_base64":"$luma"}"""
        case "vp09" =>
          s"""{"status":"unsupported","job_id":"$jid"}"""
        case _ => // plane shorter than width*height
          s"""{"status":"success","job_id":"$jid","width":2,""" +
            s""""height":2,"luma_base64":"AAA="}"""
      }
    })) { base =>
      val svc = new HttpServices.HttpFrameDecodeService(base)
      val g = svc.decodeFrame(Multimodal.FrameJob("vid9", 3, "avc1",
        "payload-bytes".getBytes)).get
      assert(g.width === 2 && g.height === 2)
      assert(g.luma.toSeq === Seq[Byte](10, 20, 30, 40))
      // the request carried the container walk's row verbatim
      assert(seen.get().contains("\"media_id\":\"vid9\""))
      assert(seen.get().contains("\"frame_idx\":3"))
      assert(seen.get().contains("\"codec\":\"avc1\""))
      assert(seen.get().contains(java.util.Base64.getEncoder
        .encodeToString("payload-bytes".getBytes)))
      // an explicit decline is a skip, not an error
      assert(svc.decodeFrame(Multimodal.FrameJob("v", 0, "vp09",
        Array[Byte](1))) === None)
      // a malformed plane (3 bytes for 2x2) must throw
      intercept[IllegalArgumentException] {
        svc.decodeFrame(Multimodal.FrameJob("v", 0, "mangled",
          Array[Byte](1)))
      }
    }
  }
}
