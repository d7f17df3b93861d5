package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64
import scala.jdk.CollectionConverters._

/** Paginated HTTP streaming source — the Spark-native re-expression of
  * the reference's HTTP library + want_more loop (SURVEY.md §2.8, §3):
  * the driver's re-entry loop becomes micro-batch planning, the cursor
  * becomes the stream OFFSET (persisted in the checkpoint, giving mito's
  * at-least-once re-evaluation semantics on retry), and the rate limiter
  * becomes admission control (pages-per-trigger) + a per-request pace.
  *
  * Options:
  *   url               base URL; `{page}` is substituted with the page no.
  *   maxPages          total pages to fetch (bounded stream); default 1
  *   pagesPerTrigger   admission control per micro-batch; default 1
  *   user / password   optional basic auth (reference http.go:783-824)
  *   minIntervalMs     minimum ms between requests in a partition
  *   method            GET (default) | POST | HEAD (http.go:518-635)
  *   contentType       request Content-Type (POST polls)
  *   body              request body; `{page}` substituted per page
  *   ratePerSec        blocking token-bucket limit for the target host,
  *                     shared JVM-wide (reference rate.Limiter.Wait,
  *                     http.go:524-527); rateBurst sets the burst size
  *   insecure          skip TLS certificate validation (mito -insecure)
  *
  * Usage: spark.readStream.format(classOf[HttpSourceProvider].getName)
  *          .option("url", "http://host/api?page={page}").load()
  */
class HttpSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = HttpSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = new HttpTable
}

object HttpSource {
  /** Response shape following the reference's respToMap (http.go:748-781). */
  val schema: StructType = StructType(Seq(
    StructField("URL", StringType),
    StructField("Page", LongType),
    StructField("StatusCode", LongType),
    StructField("Header", MapType(StringType, ArrayType(StringType))),
    StructField("Body", BinaryType)))

  /** One page fetch, delegating to the shared [[HttpExec]] client.
    * `method`/`contentType`/`body` support POST-polling APIs (the
    * reference's post/do_request-driven pagination, http.go:585-635). */
  def fetch(url: String, user: String, password: String, bearer: String = "",
      method: String = "GET", contentType: String = "",
      body: Array[Byte] = null,
      insecure: Boolean = false): (Long, Map[String, Seq[String]], Array[Byte]) = {
    var headers = Map.empty[String, Seq[String]]
    if (bearer.nonEmpty) headers += "Authorization" -> Seq(s"Bearer $bearer")
    else if (user.nonEmpty) {
      val tok = Base64.getEncoder.encodeToString(s"$user:$password".getBytes(StandardCharsets.UTF_8))
      headers += "Authorization" -> Seq(s"Basic $tok")
    }
    if (contentType.nonEmpty) headers += "Content-Type" -> Seq(contentType)
    val r = HttpExec.send(method, url, headers, body, insecure)
    (r.statusCode, r.header, r.body)
  }

  /** OAuth2 token fetch (reference assembles these flows at
    * mito.go:421-506): client-credentials or resource-owner-password
    * against a token endpoint; access_token cached per JVM until expiry.
    * Executor-local cache => one token fetch per executor, not per row. */
  private val tokenCache = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  def oauth2Token(tokenUrl: String, clientId: String, clientSecret: String,
      scope: String, user: String, password: String): String = tokenCache.synchronized {
    // single-flight per JVM: concurrent partitions share one fetch
    val key = s"$tokenUrl|$clientId|$scope|$user"
    val cached = tokenCache.get(key)
    if (cached != null && cached._2 > System.currentTimeMillis()) return cached._1
    val form = new StringBuilder
    if (user.nonEmpty) {
      form.append("grant_type=password")
        .append("&username=").append(java.net.URLEncoder.encode(user, "UTF-8"))
        .append("&password=").append(java.net.URLEncoder.encode(password, "UTF-8"))
    } else form.append("grant_type=client_credentials")
    form.append("&client_id=").append(java.net.URLEncoder.encode(clientId, "UTF-8"))
      .append("&client_secret=").append(java.net.URLEncoder.encode(clientSecret, "UTF-8"))
    if (scope.nonEmpty) form.append("&scope=").append(java.net.URLEncoder.encode(scope, "UTF-8"))
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(tokenUrl))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form.toString))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    val node = graft.values.JsonAlgebra.parse(resp.body())
    val token = Option(node.get("access_token")).map(_.asText())
      .getOrElse(sys.error(s"no access_token in token response: ${resp.body().take(200)}"))
    val expiresIn = Option(node.get("expires_in")).map(_.asLong()).getOrElse(300L)
    tokenCache.put(key, (token, System.currentTimeMillis() + (expiresIn - 30) * 1000L))
    token
  }
}

class HttpTable extends Table with SupportsRead {
  override def name(): String = "graft-http"
  override def schema(): StructType = HttpSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = HttpSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new HttpMicroBatchStream(
          options.asCaseSensitiveMap().asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
    }
}

case class PageOffset(page: Long) extends Offset {
  override def json(): String = page.toString
}

class HttpMicroBatchStream(options: Map[String, String])
    extends MicroBatchStream with SupportsAdmissionControl {

  private val maxPages = options.getOrElse("maxpages", "1").toLong
  private val perTrigger = options.getOrElse("pagespertrigger", "1").toLong

  override def initialOffset(): Offset = PageOffset(0)
  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("use latestOffset(Offset, ReadLimit)")

  /** Admission control: advance at most pagesPerTrigger pages per batch
    * (the reference blocks on its rate.Limiter before every request —
    * http.go:524-527; here the cap is planned instead of blocking). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PageOffset].page
    PageOffset(math.min(s + perTrigger, maxPages))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].page
    val e = end.asInstanceOf[PageOffset].page
    (s until e).map(p => HttpPagePartition(
      options.getOrElse("url", sys.error("url option required")),
      p,
      options.getOrElse("user", ""),
      options.getOrElse("password", ""),
      options.getOrElse("minintervalms", "0").toLong,
      options.getOrElse("authtype", ""),
      options.getOrElse("tokenurl", ""),
      options.getOrElse("clientid", ""),
      options.getOrElse("clientsecret", ""),
      options.getOrElse("scope", ""),
      options.getOrElse("method", "GET"),
      options.getOrElse("contenttype", ""),
      options.getOrElse("body", ""),
      options.getOrElse("ratepersec", "0").toDouble,
      options.getOrElse("rateburst", "1").toInt,
      options.getOrElse("insecure", "false").toBoolean): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = HttpReaderFactory
}

case class HttpPagePartition(url: String, page: Long, user: String,
    password: String, minIntervalMs: Long, authType: String = "",
    tokenUrl: String = "", clientId: String = "", clientSecret: String = "",
    scope: String = "", method: String = "GET", contentType: String = "",
    body: String = "", ratePerSec: Double = 0, rateBurst: Int = 1,
    insecure: Boolean = false) extends InputPartition

object HttpReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HttpPagePartition]
    new PartitionReader[InternalRow] {
      private var done = false
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (done) return false
        if (p.minIntervalMs > 0) Thread.sleep(p.minIntervalMs)
        val url = p.url.replace("{page}", p.page.toString)
        // share one bucket per host across every partition in the JVM
        RateGate.ensure(HttpExec.host(url), p.ratePerSec, p.rateBurst)
        val bearer =
          if (p.authType == "oauth2")
            HttpSource.oauth2Token(p.tokenUrl, p.clientId, p.clientSecret,
              p.scope, p.user, p.password)
          else ""
        val reqBody =
          if (p.body.isEmpty) null
          else p.body.replace("{page}", p.page.toString).getBytes(StandardCharsets.UTF_8)
        val (status, headers, body) = HttpSource.fetch(url,
          if (p.authType == "oauth2") "" else p.user, p.password, bearer,
          p.method, p.contentType, reqBody, p.insecure)
        row = InternalRow(
          UTF8String.fromString(url),
          p.page,
          status,
          ArrayBasedMapData(
            headers.keys.map(k => UTF8String.fromString(k): Any).toArray,
            headers.values.map(vs =>
              new GenericArrayData(vs.map(v => UTF8String.fromString(v): Any).toArray): Any).toArray),
          body)
        done = true
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
