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

  def fetch(url: String, user: String, password: String): (Long, Map[String, Seq[String]], Array[Byte]) = {
    val client = HttpClient.newHttpClient()
    val b = HttpRequest.newBuilder(URI.create(url))
    if (user.nonEmpty) {
      val tok = Base64.getEncoder.encodeToString(s"$user:$password".getBytes(StandardCharsets.UTF_8))
      b.header("Authorization", s"Basic $tok")
    }
    val resp = client.send(b.GET().build(), HttpResponse.BodyHandlers.ofByteArray())
    val headers = resp.headers().map().asScala.map { case (k, vs) => k -> vs.asScala.toSeq }.toMap
    (resp.statusCode().toLong, headers, resp.body())
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
      options.getOrElse("minintervalms", "0").toLong): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = HttpReaderFactory
}

case class HttpPagePartition(url: String, page: Long, user: String,
    password: String, minIntervalMs: Long) extends InputPartition

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
        val (status, headers, body) = HttpSource.fetch(url, p.user, p.password)
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
