package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

/** URL/query kernel mirroring the reference's http library's pure
  * functions (/root/reference/lib/http.go:1002-1143): parse_url,
  * format_url, parse_query, format_query. The *executing* calls
  * (get/post/do_request) live in [[graft.sources.HttpSource]] — network
  * I/O belongs to the source layer in Spark, not row expressions.
  */
object HttpKernel {

  /** Spark-side shape of Go's url.URL (http.go:1002-1032). */
  val urlStructType: StructType = StructType(Seq(
    StructField("Scheme", StringType),
    StructField("Opaque", StringType),
    StructField("Username", StringType),
    StructField("Password", StringType),
    StructField("PasswordSet", BooleanType),
    StructField("Host", StringType),
    StructField("Path", StringType),
    StructField("RawQuery", StringType),
    StructField("Fragment", StringType)))

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  /** Lenient URL parse (Go url.Parse tolerance, not java.net.URI
    * strictness): scheme://[user[:pass]@]host[/path][?query][#frag]. */
  def parseUrl(addr: UTF8String): InternalRow = {
    var s = addr.toString
    var fragment = ""
    val fi = s.indexOf('#')
    if (fi >= 0) { fragment = s.substring(fi + 1); s = s.substring(0, fi) }
    var rawQuery = ""
    val qi = s.indexOf('?')
    if (qi >= 0) { rawQuery = s.substring(qi + 1); s = s.substring(0, qi) }
    var scheme = ""
    val si = s.indexOf("://")
    var rest = s
    var opaque = ""
    if (si >= 0) { scheme = s.substring(0, si); rest = s.substring(si + 3) }
    else {
      val ci = s.indexOf(':')
      if (ci > 0 && s.substring(0, ci).forall(c => c.isLetterOrDigit || "+-.".contains(c))
        && !s.substring(ci + 1).startsWith("/")) {
        scheme = s.substring(0, ci); opaque = s.substring(ci + 1); rest = ""
      }
    }
    var username = ""; var password = ""; var passwordSet = false
    var host = ""; var path = ""
    if (scheme.nonEmpty && opaque.isEmpty && si >= 0) {
      val slash = rest.indexOf('/')
      var authority = if (slash >= 0) rest.substring(0, slash) else rest
      path = if (slash >= 0) rest.substring(slash) else ""
      val at = authority.lastIndexOf('@')
      if (at >= 0) {
        val userinfo = authority.substring(0, at)
        authority = authority.substring(at + 1)
        val colon = userinfo.indexOf(':')
        if (colon >= 0) {
          username = userinfo.substring(0, colon)
          password = userinfo.substring(colon + 1)
          passwordSet = true
        } else username = userinfo
      }
      host = authority
    } else if (scheme.isEmpty) path = rest
    InternalRow(u(scheme), u(opaque), u(username), u(password), passwordSet,
      u(host), u(path), u(rawQuery), u(fragment))
  }

  /** Inverse of parseUrl, following Go URL.String() assembly. */
  def formatUrl(r: InternalRow): UTF8String = {
    val scheme = r.getUTF8String(0).toString
    val opaque = r.getUTF8String(1).toString
    val username = r.getUTF8String(2).toString
    val password = r.getUTF8String(3).toString
    val passwordSet = r.getBoolean(4)
    val host = r.getUTF8String(5).toString
    val path = r.getUTF8String(6).toString
    val rawQuery = r.getUTF8String(7).toString
    val fragment = r.getUTF8String(8).toString
    val sb = new StringBuilder
    if (scheme.nonEmpty) sb.append(scheme).append(':')
    if (opaque.nonEmpty) sb.append(opaque)
    else {
      if (scheme.nonEmpty || host.nonEmpty) sb.append("//")
      if (username.nonEmpty || passwordSet) {
        sb.append(username)
        if (passwordSet) sb.append(':').append(password)
        sb.append('@')
      }
      sb.append(host)
      if (path.nonEmpty && !path.startsWith("/") && host.nonEmpty) sb.append('/')
      sb.append(path)
    }
    if (rawQuery.nonEmpty) sb.append('?').append(rawQuery)
    if (fragment.nonEmpty) sb.append('#').append(fragment)
    u(sb.toString)
  }

  /** query string -> map<string, list<string>> (url.ParseQuery). */
  def parseQuery(q: UTF8String): MapData = {
    val pairs = q.toString.split('&').filter(_.nonEmpty)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    pairs.foreach { p =>
      val i = p.indexOf('=')
      val (k, v) = if (i < 0) (p, "") else (p.substring(0, i), p.substring(i + 1))
      val kd = URLDecoder.decode(k, StandardCharsets.UTF_8)
      val vd = URLDecoder.decode(v, StandardCharsets.UTF_8)
      m.update(kd, m.getOrElse(kd, Vector.empty) :+ vd)
    }
    ArrayBasedMapData(
      m.keys.map(k => u(k): Any).toArray,
      m.values.map(vs => new GenericArrayData(vs.map(u(_): Any).toArray): Any).toArray)
  }

  /** map<string, list<string>> -> sorted, escaped query string
    * (url.Values.Encode semantics: keys sorted, '+' for space). */
  def formatQuery(m: MapData): UTF8String = {
    val n = m.numElements()
    val keys = m.keyArray()
    val vals = m.valueArray()
    val entries = (0 until n).map { i =>
      val k = keys.getUTF8String(i).toString
      val arr = vals.getArray(i)
      k -> (0 until arr.numElements()).map(j => arr.getUTF8String(j).toString)
    }.sortBy(_._1)
    val sb = new StringBuilder
    entries.foreach { case (k, vs) =>
      vs.foreach { v =>
        if (sb.nonEmpty) sb.append('&')
        sb.append(URLEncoder.encode(k, StandardCharsets.UTF_8))
          .append('=')
          .append(URLEncoder.encode(v, StandardCharsets.UTF_8))
      }
    }
    u(sb.toString)
  }

  /** Case-insensitive single-value header lookup (Go http.Header.Get
    * canonicalization semantics) over map<string, array<string>>. */
  def headerGet(headers: MapData, name: String): String = {
    val n = headers.numElements()
    val keys = headers.keyArray()
    val vals = headers.valueArray()
    var i = 0
    while (i < n) {
      if (keys.getUTF8String(i).toString.equalsIgnoreCase(name)) {
        val arr = vals.getArray(i)
        return if (arr.numElements() == 0) "" else arr.getUTF8String(0).toString
      }
      i += 1
    }
    ""
  }
}
