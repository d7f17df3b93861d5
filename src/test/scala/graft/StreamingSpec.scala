package graft

import graft.streaming.WantMore
import graft.sources.HttpSourceProvider
import org.apache.spark.sql.functions._

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

class StreamingSpec extends SparkSpec {

  test("want_more loop replays the reference golden sequence (testdata/want_more.txt)") {
    // program: int(state.n).as(n, {"n": n+1, "want_more": n+1 < 5})
    val result = WantMore.run(spark, """{"n": 0}""", state => {
      val n = get_json_object(state, "$.n").cast("long")
      to_json(struct((n + 1).as("n"), (n + 1 < 5).as("want_more")))
    })
    assert(result.iterations == 5)
    assert(result.outputs == Seq(
      """{"n":1,"want_more":true}""",
      """{"n":2,"want_more":true}""",
      """{"n":3,"want_more":true}""",
      """{"n":4,"want_more":true}""",
      """{"n":5,"want_more":false}"""))
  }

  test("http source paginates a stub server through micro-batches") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/api", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        seen.add(x.getRequestURI.toString)
        val page = x.getRequestURI.getQuery.stripPrefix("page=")
        val body = s"""{"page":$page,"items":["a$page","b$page"]}""".getBytes
        x.getResponseHeaders.add("X-Rate-Limit-Limit", "600")
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body); x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = spark.readStream
        .format(classOf[HttpSourceProvider].getName)
        .option("url", s"http://127.0.0.1:$port/api?page={page}")
        .option("maxPages", "5")
        .option("pagesPerTrigger", "2")
        .load()
      val q = df.select(col("Page"), col("StatusCode"),
        col("Body").cast("string").as("body"),
        exists(map_keys(col("Header")), k => lower(k) === "x-rate-limit-limit").as("has_lim"))
        .writeStream.format("memory").queryName("http_out").outputMode("append").start()
      try {
        q.processAllAvailable()
        val rows = spark.sql("SELECT * FROM http_out ORDER BY Page").collect()
        assert(rows.length == 5)
        assert(rows.map(_.getLong(0)).toSeq == (0L until 5L))
        assert(rows.forall(_.getLong(1) == 200L))
        assert(rows(3).getString(2) == """{"page":3,"items":["a3","b3"]}""")
        assert(rows.forall(_.getBoolean(3)), "rate-limit header should be present")
        // at-least-once page order, 2-page admission per batch
        assert(seen.size() >= 5)
      } finally q.stop()
    } finally server.stop(0)
  }

  test("http source body feeds the dynamic-document tier") {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/d", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val body = """{"b":2,"a":1}""".getBytes
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body); x.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = spark.readStream
        .format(classOf[HttpSourceProvider].getName)
        .option("url", s"http://127.0.0.1:$port/d")
        .option("maxPages", "1")
        .load()
      val q = df.select(graft.functions.json_normalize(col("Body").cast("string")).as("doc"))
        .writeStream.format("memory").queryName("http_doc").outputMode("append").start()
      try {
        q.processAllAvailable()
        val rows = spark.sql("SELECT doc FROM http_doc").collect()
        assert(rows.map(_.getString(0)).toSeq == Seq("""{"a":1,"b":2}"""))
      } finally q.stop()
    } finally server.stop(0)
  }
}
