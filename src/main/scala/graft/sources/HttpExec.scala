package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

/** Executing HTTP calls: the shared client behind the CEL tier's
  * `get`/`head`/`post`/`do_request`, the Column tier's `http_*`
  * functions, and the paginated streaming source.
  *
  * Mirrors the reference's http library execution semantics
  * (/root/reference/lib/http.go — doHead :518-548, doGet :549-584,
  * doPost :585-635, doRequest :826-854, respToMap :748-781): the
  * response is surfaced as a Go-shaped map (Status/StatusCode/Proto/
  * Header/ContentLength/Body/Request echo), headers in Go canonical
  * MIME form.
  */
object HttpExec {

  /** respToMap-shaped response + the request echo respToMap embeds.
    * `uncompressed` mirrors Go http.Response.Uncompressed: the transport
    * transparently gunzipped the body (and deleted Content-Encoding/
    * Content-Length, setting ContentLength to -1). */
  final case class Resp(
      status: String, statusCode: Long, proto: String,
      protoMajor: Long, protoMinor: Long,
      header: Map[String, Seq[String]], contentLength: Long, body: Array[Byte],
      reqMethod: String, reqUrl: String, reqHost: String,
      reqHeader: Map[String, Seq[String]], reqContentLength: Long,
      uncompressed: Boolean = false)

  /** Transport failures in Go's error shape, so scripts ported from the
    * reference that match on error text keep working (url.Error renders
    * `<Op> "<url>": <cause>` with Op = title-cased method; TLS
    * verification failures render Go's crypto/tls+x509 text —
    * serve_tls.txt pins it). */
  private def goTransportError(method: String, url: String, e: Exception): String = {
    val op = method.take(1).toUpperCase(java.util.Locale.ROOT) +
      method.drop(1).toLowerCase(java.util.Locale.ROOT)
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    val causes = chain(e)
    val cause =
      if (causes.exists {
        case _: javax.net.ssl.SSLHandshakeException => true
        case c => c.isInstanceOf[java.security.cert.CertificateException] ||
          String.valueOf(c.getMessage).contains("PKIX path")
      }) "tls: failed to verify certificate: x509: certificate signed by unknown authority"
      else if (causes.exists(_.isInstanceOf[java.net.ConnectException])) {
        val hp = host(url)
        val hostPort = if (hp.contains(":")) hp
          else if (url.startsWith("https")) s"$hp:443" else s"$hp:80"
        s"dial tcp $hostPort: connect: connection refused"
      } else String.valueOf(e.getMessage)
    s"""$op "$url": $cause"""
  }

  /** Process-level TLS-verification toggle — the CLI's -insecure flag
    * (mito.go:68-72, setClientInsecure :242-259 wires one client for
    * the whole process; this is the same scope). Per-call `insecure`
    * still overrides for library users. */
  @volatile var trustAll: Boolean = false

  // One HTTP/1.1 client per JVM (reference holds one http.Client per
  // library instance). HTTP/1.1 preferred so Proto matches Go's default.
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .version(HttpClient.Version.HTTP_1_1)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** The mito -insecure client (InsecureSkipVerify, mito.go flag): no
    * certificate validation — for self-signed test/enterprise endpoints
    * ONLY, selected per call. */
  private lazy val insecureClient: HttpClient = {
    val trustAll = new javax.net.ssl.X509TrustManager {
      override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](trustAll), new java.security.SecureRandom())
    HttpClient.newBuilder()
      .version(HttpClient.Version.HTTP_1_1)
      .followRedirects(HttpClient.Redirect.NORMAL)
      .sslContext(ctx)
      .build()
  }

  /** Go net/http.StatusText for the codes that surface in practice. */
  def statusText(code: Int): String = code match {
    case 200 => "OK"; case 201 => "Created"; case 202 => "Accepted"
    case 204 => "No Content"; case 206 => "Partial Content"
    case 301 => "Moved Permanently"; case 302 => "Found"; case 304 => "Not Modified"
    case 307 => "Temporary Redirect"; case 308 => "Permanent Redirect"
    case 400 => "Bad Request"; case 401 => "Unauthorized"; case 403 => "Forbidden"
    case 404 => "Not Found"; case 405 => "Method Not Allowed"
    case 409 => "Conflict"; case 410 => "Gone"; case 412 => "Precondition Failed"
    case 415 => "Unsupported Media Type"; case 418 => "I'm a teapot"
    case 422 => "Unprocessable Entity"; case 429 => "Too Many Requests"
    case 500 => "Internal Server Error"; case 501 => "Not Implemented"
    case 502 => "Bad Gateway"; case 503 => "Service Unavailable"
    case 504 => "Gateway Timeout"
    case _ => ""
  }

  /** Go textproto.CanonicalMIMEHeaderKey: capitalize the first letter of
    * each '-'-separated segment, lowercase the rest. */
  def canonicalHeader(k: String): String =
    k.split("-", -1).map { seg =>
      if (seg.isEmpty) seg
      else seg.substring(0, 1).toUpperCase + seg.substring(1).toLowerCase
    }.mkString("-")

  // Headers the JDK client manages itself and refuses to let callers set.
  private val restricted =
    Set("host", "content-length", "connection", "upgrade", "expect")

  /** Authority (host[:port]) of a URL — Go's req.Host. */
  def host(url: String): String = {
    val i = url.indexOf("://")
    val rest = if (i >= 0) url.substring(i + 3) else url
    val cut = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val auth = if (cut >= 0) rest.substring(0, cut) else rest
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth.substring(at + 1) else auth
  }

  /** Execute one request. `body` may be null/empty for body-less methods;
    * `headers` are copied into the request (minus JDK-restricted keys,
    * which the client sets itself). Throws on transport errors — callers
    * surface the message as an in-band error value like the reference's
    * types.NewErr. */
  def send(method: String, url: String,
      headers: Map[String, Seq[String]] = Map.empty,
      body: Array[Byte] = null, insecure: Boolean = false): Resp = {
    // blocking limiter wait before every request (http.go:524-527)
    RateGate.acquire(host(url))
    val b = HttpRequest.newBuilder(URI.create(url))
    headers.foreach { case (k, vs) =>
      if (!restricted.contains(k.toLowerCase))
        vs.foreach(v => b.header(k, v))
    }
    // Go transport: request gzip transparently unless the caller set
    // their own Accept-Encoding (net/http DisableCompression=false).
    // Go also skips it for HEAD and for Range requests
    // (transport.go requestedGzip: method != "HEAD" && no Range header)
    val transparentGzip = !headers.keys.exists(_.equalsIgnoreCase("accept-encoding")) &&
      !method.equalsIgnoreCase("HEAD") &&
      !headers.keys.exists(_.equalsIgnoreCase("range"))
    if (transparentGzip) b.header("Accept-Encoding", "gzip")
    val bodyLen = if (body == null) 0L else body.length.toLong
    val publisher =
      if (body == null || body.isEmpty) HttpRequest.BodyPublishers.noBody()
      else HttpRequest.BodyPublishers.ofByteArray(body)
    b.method(method.toUpperCase(java.util.Locale.ROOT), publisher)
    val resp = try {
      (if (insecure || trustAll) insecureClient else client)
        .send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
    } catch {
      // never swallow cancellation: re-set the interrupt flag and let
      // the InterruptedException escape (Spark task kill / Ctrl-C)
      case e: InterruptedException => Thread.currentThread().interrupt(); throw e
      case e: Exception => throw new java.io.IOException(goTransportError(method, url, e), e)
    }
    // Go hides hop-by-hop transfer framing from Header (it moves
    // Transfer-Encoding to a struct field respToMap doesn't keep)
    var hdr = resp.headers().map().asScala.toSeq
      .filterNot(_._1.startsWith(":"))
      .map { case (k, vs) => canonicalHeader(k) -> vs.asScala.toSeq }
      .toMap - "Transfer-Encoding"
    val proto = resp.version() match {
      case HttpClient.Version.HTTP_2 => ("HTTP/2.0", 2L, 0L)
      case _ => ("HTTP/1.1", 1L, 1L)
    }
    // transparent decompression (Go transport): gunzip the body, drop
    // Content-Encoding/Content-Length, ContentLength -1, Uncompressed
    var respBody = resp.body()
    var uncompressed = false
    if (transparentGzip && respBody.nonEmpty &&
      hdr.get("Content-Encoding").exists(_.exists(_.equalsIgnoreCase("gzip")))) {
      respBody = graft.expressions.MimeKernel.gunzip(respBody)
      hdr = hdr - "Content-Encoding" - "Content-Length"
      uncompressed = true
    }
    // ContentLength: the declared length, or -1 when unknown (chunked /
    // decompressed) — Go semantics, not the buffered body size
    val clen =
      if (uncompressed) -1L
      else hdr.get("Content-Length").flatMap(_.headOption)
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(if (method.equalsIgnoreCase("HEAD")) 0L else -1L)
    Resp(
      status = s"${resp.statusCode()} ${statusText(resp.statusCode())}".trim,
      statusCode = resp.statusCode().toLong,
      proto = proto._1, protoMajor = proto._2, protoMinor = proto._3,
      header = hdr, contentLength = clen, body = respBody,
      reqMethod = method.toUpperCase(java.util.Locale.ROOT), reqUrl = url,
      reqHost = host(url),
      reqHeader = headers.map { case (k, vs) => canonicalHeader(k) -> vs },
      reqContentLength = bodyLen,
      uncompressed = uncompressed)
  }

  def get(url: String): Resp = send("GET", url)
  def head(url: String): Resp = send("HEAD", url)
  def post(url: String, contentType: String, body: Array[Byte]): Resp =
    send("POST", url, Map("Content-Type" -> Seq(contentType)), body)

  /** UTF-8 body convenience used by tests and the CEL tier. */
  def bodyBytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
}
