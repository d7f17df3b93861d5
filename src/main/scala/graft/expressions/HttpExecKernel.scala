package graft.expressions

import graft.sources.HttpExec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Column-tier executing HTTP calls (reference lib/http.go doHead
  * :518-548, doPost :585-635, doRequest :826-854): one request per row,
  * invoked from codegen via StaticInvoke like every other kernel.
  * Intended for enrichment over SMALL keyed frames (the reference's
  * single-document model); bulk ingestion belongs to the paginated
  * streaming source.
  */
object HttpExecKernel {

  /** respToMap's stable scalar core (http.go:748-781), plus an in-band
    * `Error` field: the reference surfaces transport failures as error
    * VALUES (types.NewErr), not thrown exceptions — a thrown exception
    * here would fail the whole Spark task (and after retries the job) on
    * one bad URL row. Error == null means the request completed. */
  val respStructType: StructType = StructType(Seq(
    StructField("Status", StringType),
    StructField("StatusCode", LongType),
    StructField("Proto", StringType),
    StructField("Header", MapType(StringType, ArrayType(StringType))),
    StructField("ContentLength", LongType),
    StructField("Body", BinaryType),
    StructField("Error", StringType)))

  /** Shape of the request structs built by functions.request /
    * post_request / get_request. */
  val requestStructType: StructType = StructType(Seq(
    StructField("Method", StringType),
    StructField("URL", StringType),
    StructField("Header", MapType(StringType, ArrayType(StringType))),
    StructField("Body", BinaryType)))

  private def mapData(h: Map[String, Seq[String]]): MapData =
    ArrayBasedMapData(
      h.keys.map(k => UTF8String.fromString(k): Any).toArray,
      h.values.map(vs =>
        new GenericArrayData(vs.map(v => UTF8String.fromString(v): Any).toArray): Any).toArray)

  private def respRow(r: HttpExec.Resp): InternalRow = InternalRow(
    UTF8String.fromString(r.status), r.statusCode, UTF8String.fromString(r.proto),
    mapData(r.header), r.contentLength, r.body, null)

  private def errRow(msg: String): InternalRow = InternalRow(
    null, null, null, null, null, null, UTF8String.fromString(msg))

  /** Mirror of the CEL tier's NonFatal->VErr wrapping: connection
    * refused / DNS failure / IOException become an error-shaped row. */
  private def guarded(f: => HttpExec.Resp): InternalRow =
    try respRow(f)
    catch { case scala.util.control.NonFatal(e) =>
      errRow(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)) }

  def get(url: UTF8String): InternalRow =
    if (url == null) errRow("get: null url")
    else guarded(HttpExec.get(url.toString))

  def head(url: UTF8String): InternalRow =
    if (url == null) errRow("head: null url")
    else guarded(HttpExec.head(url.toString))

  def post(url: UTF8String, contentType: UTF8String, body: Array[Byte]): InternalRow =
    if (url == null) errRow("post: null url")
    else guarded(HttpExec.post(url.toString,
      if (contentType == null) "" else contentType.toString, body))

  /** Execute a request struct (mapToReq + client.Do, http.go:826-854). */
  def doRequest(req: InternalRow): InternalRow = {
    if (req == null) return errRow("do_request: null request")
    if (req.isNullAt(1)) return errRow("do_request: null URL")
    val method = if (req.isNullAt(0)) "GET" else req.getUTF8String(0).toString
    val url = req.getUTF8String(1).toString
    val headers: Map[String, Seq[String]] =
      if (req.isNullAt(2)) Map.empty
      else {
        val md = req.getMap(2)
        (0 until md.numElements()).map { i =>
          val k = md.keyArray().getUTF8String(i).toString
          val va = md.valueArray().getArray(i)
          k -> (0 until va.numElements()).map(j => va.getUTF8String(j).toString)
        }.toMap
      }
    val body = if (req.isNullAt(3)) null else req.getBinary(3)
    guarded(HttpExec.send(method, url, headers, body))
  }
}
