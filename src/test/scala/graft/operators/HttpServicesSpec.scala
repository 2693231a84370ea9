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
}
