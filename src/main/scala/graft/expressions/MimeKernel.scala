package graft.expressions

import graft.values.JsonAlgebra
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, ArrayBasedMapData}
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, ZipInputStream}
import scala.collection.mutable.ArrayBuffer

/** Format/MIME decode kernel for the reference's mime/file transforms
  * (/root/reference/lib/mime.go, registered at mito.go:276-284):
  * gzip, zip, CSV (header/no-header), NDJSON, rot13.
  *
  * These are *functions on a bytes column* (the reference applies them to
  * whole in-memory payloads, mime.go:90-132). At scale the same formats
  * arriving as FILES go through DataFrameReader (csv/json/binaryFile),
  * which streams and splits; these kernels cover the in-row case
  * (e.g. zip member or HTTP response body inside an event).
  */
object MimeKernel {

  /** application/gzip — mime.go transform table. */
  def gunzip(data: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(data))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** application/zip -> list of member structs
    * (Name, IsDir, Size, Modified micros, Data) — mime.go:368-429.
    * Full in-memory expansion, same caveat as the reference
    * (mime.go:367). */
  def zipExpand(data: Array[Byte]): ArrayData = {
    val zin = new ZipInputStream(new ByteArrayInputStream(data))
    val rows = ArrayBuffer.empty[InternalRow]
    var e = zin.getNextEntry
    while (e != null) {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = zin.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
      rows += InternalRow(
        UTF8String.fromString(e.getName),
        e.isDirectory,
        out.size().toLong,
        e.getTime * 1000L, // micros
        out.toByteArray)
      e = zin.getNextEntry
    }
    new GenericArrayData(rows.toArray[Any])
  }

  /** Minimal RFC-4180 CSV split (quoted fields, embedded quotes). */
  private[graft] def csvRows(text: String): Seq[Array[String]] = {
    val rows = ArrayBuffer.empty[Array[String]]
    val row = ArrayBuffer.empty[String]
    val f = new StringBuilder
    var inQ = false
    var i = 0
    def endField(): Unit = { row += f.toString; f.clear() }
    def endRow(): Unit = {
      if (row.nonEmpty || f.nonEmpty) { endField(); rows += row.toArray; row.clear() }
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { f.append('"'); i += 1 }
          else inQ = false
        } else f.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => endField()
        case '\n' => endRow()
        case '\r' =>
        case other => f.append(other)
      }
      i += 1
    }
    endRow()
    rows.toSeq
  }

  /** text/csv; header=present -> list of maps (all values strings) —
    * mime.go:172-195. */
  def csvHeader(data: Array[Byte]): ArrayData = {
    val rows = csvRows(new String(data, StandardCharsets.UTF_8))
    if (rows.isEmpty) return new GenericArrayData(Array.empty[Any])
    val h = rows.head.map(UTF8String.fromString)
    val out = rows.tail.map { rec =>
      ArrayBasedMapData(h.asInstanceOf[Array[Any]],
        rec.map(UTF8String.fromString(_): Any).padTo(h.length, null))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** text/csv; header=absent -> list of lists — mime.go:224-230. */
  def csvNoHeader(data: Array[Byte]): ArrayData =
    new GenericArrayData(csvRows(new String(data, StandardCharsets.UTF_8))
      .map(rec => new GenericArrayData(rec.map(UTF8String.fromString(_): Any)): Any).toArray)

  /** application/x-ndjson -> array of JSON documents; malformed lines
    * become in-band error values — mime.go:292-314. */
  def ndjson(data: Array[Byte]): ArrayData = {
    val out = ArrayBuffer.empty[Any]
    new String(data, StandardCharsets.UTF_8).split("\n", -1).foreach { line =>
      if (line.trim.nonEmpty) {
        val parsed =
          try JsonAlgebra.render(
            new com.fasterxml.jackson.databind.ObjectMapper()
              .readerFor(classOf[com.fasterxml.jackson.databind.JsonNode])
              .`with`(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
              .readValue(line): com.fasterxml.jackson.databind.JsonNode)
          catch {
            case e: Exception =>
              JsonAlgebra.render(JsonAlgebra.error(s"${e.getMessage}: $line"))
          }
        out += UTF8String.fromString(parsed)
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** text/rot13 (reference test transform, mito.go:358-365). */
  def rot13(data: Array[Byte]): Array[Byte] = data.map { b =>
    val c = b.toChar
    if (c >= 'a' && c <= 'z') ('a' + (c - 'a' + 13) % 26).toByte
    else if (c >= 'A' && c <= 'Z') ('A' + (c - 'A' + 13) % 26).toByte
    else b
  }
}
