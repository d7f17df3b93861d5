package graft

import graft.cel.Cel
import graft.sources.HttpSourceProvider
import org.apache.spark.sql.functions.col

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

class OAuthGlobalsSpec extends SparkSpec {

  test("CEL globals inject configured constants (reference TestVars analog)") {
    val out = Cel.evalOnce(
      """{"url": base_url + "/items", "batch": page_size * 2}""",
      "null", 0L,
      globalsJson = """{"base_url":"https://api.example.com","page_size":50}""")
    assert(out == """{"batch":100,"url":"https://api.example.com/items"}""")
  }

  test("http source oauth2 client-credentials flow") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val tokenRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/token", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        tokenRequests.incrementAndGet()
        val body = new String(x.getRequestBody.readAllBytes())
        val ok = body.contains("grant_type=client_credentials") &&
          body.contains("client_id=cid") && body.contains("client_secret=sec")
        val resp = if (ok) """{"access_token":"tok-123","expires_in":3600}"""
          else """{"error":"bad request"}"""
        x.sendResponseHeaders(if (ok) 200 else 400, resp.length)
        x.getResponseBody.write(resp.getBytes); x.close()
      }
    })
    server.createContext("/data", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val auth = x.getRequestHeaders.getFirst("Authorization")
        val resp = if (auth == "Bearer tok-123") """{"ok":true}""" else """{"ok":false}"""
        x.sendResponseHeaders(200, resp.length)
        x.getResponseBody.write(resp.getBytes); x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = spark.readStream
        .format(classOf[HttpSourceProvider].getName)
        .option("url", s"http://127.0.0.1:$port/data?page={page}")
        .option("maxPages", "3")
        .option("pagesPerTrigger", "3")
        .option("authType", "oauth2")
        .option("tokenUrl", s"http://127.0.0.1:$port/token")
        .option("clientId", "cid")
        .option("clientSecret", "sec")
        .load()
      val q = df.select(col("Body").cast("string").as("b"))
        .writeStream.format("memory").queryName("oauth_out").outputMode("append").start()
      try {
        q.processAllAvailable()
        val rows = spark.sql("SELECT b FROM oauth_out").collect().map(_.getString(0))
        assert(rows.length == 3)
        assert(rows.forall(_ == """{"ok":true}"""))
        // token cache: one fetch for all pages in this JVM
        assert(tokenRequests.get() == 1, s"token requests: ${tokenRequests.get()}")
      } finally q.stop()
    } finally server.stop(0)
  }
}
