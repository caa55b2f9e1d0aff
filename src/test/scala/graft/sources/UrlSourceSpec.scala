package graft.sources

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.core.{Blake3, Hashers}

/** UrlSource behavior against a local HTTP server, mirroring the
  * reference's wiremock suite (tests/integration.rs:484-633): body
  * parsing, blank-line drops, non-2xx tolerance, name derivation,
  * content hashing.
  */
class UrlSourceSpec extends AnyFunSuite with SparkTestBase {

  private def withServer(routes: Map[String, (Int, String)])(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (status, body)) =>
      server.createContext(path, (ex: HttpExchange) => {
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("fetches, splits lines, drops blanks (integration.rs:556-579)") {
    withServer(Map("/words.txt" -> (200, "alpha\n\nbeta\ngamma\n"))) { base =>
      val src = UrlSource(s"$base/words.txt")
      assert(src.words(spark).collect().toSet == Set("alpha", "beta", "gamma"))
      assert(src.name == "words")
      assert(src.contentHash ==
        Some(Hashers.hex(Blake3.hash("alpha\n\nbeta\ngamma\n".getBytes("UTF-8")))))
    }
  }

  test("non-2xx bodies are accepted, matching the reference (integration.rs:521-539)") {
    withServer(Map("/err.txt" -> (500, "oops\nstill-a-word\n"))) { base =>
      val src = UrlSource(s"$base/err.txt")
      assert(src.words(spark).collect().toSet == Set("oops", "still-a-word"))
    }
  }

  test("empty body yields an empty dataset (integration.rs:582-600)") {
    withServer(Map("/empty.txt" -> (200, ""))) { base =>
      assert(UrlSource(s"$base/empty.txt").words(spark).count() == 0)
    }
  }

  test("body is fetched once and cached (reference OnceLock semantics)") {
    var hits = 0
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/once.txt", (ex: HttpExchange) => {
      hits += 1
      val b = "cached\n".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val src = UrlSource(s"http://127.0.0.1:${server.getAddress.getPort}/once.txt")
      src.words(spark).collect()
      src.contentHash
      src.words(spark).collect()
      assert(hits == 1, s"expected one fetch, saw $hits")
    } finally server.stop(0)
  }
}
