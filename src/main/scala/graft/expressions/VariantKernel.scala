package graft.expressions

import org.apache.spark.types.variant.{Variant, VariantBuilder, VariantUtil}
import org.apache.spark.types.variant.VariantBuilder.FieldEntry
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

import java.time.ZoneOffset
import scala.jdk.CollectionConverters._

/** Variant-native dynamic-document tier: the collections algebra of the
  * reference (lib/collections.go) over Spark 4's `VariantType` binary
  * encoding instead of rendered JSON strings.
  *
  * Why: the string tier ([[graft.values.JsonAlgebra]] via JsonKernel)
  * re-parses the document at EVERY operator in a chain. Variant parses
  * once (`parse_json`, vectorized and shreddable at the parquet scan),
  * each operator walks the binary tree directly — object fields are
  * key-sorted in the encoding, so lookup is a binary search and ordered
  * iteration is free — and only the final render pays serialization.
  * At 100 TB that turns an O(ops x bytes) Jackson tax into O(bytes).
  *
  * Semantics are byte-parity with JsonAlgebra on the JSON universe
  * (sorted-key Go render, `{"__error__":msg}` in-band error values);
  * VariantSpec asserts it operator-by-operator.
  */
object VariantKernel {
  private val ErrorKey = graft.values.JsonAlgebra.ErrorKey

  private def v(x: VariantVal): Variant = new Variant(x.getValue, x.getMetadata)

  private def out(b: VariantBuilder): VariantVal = {
    val r = b.result()
    new VariantVal(r.getValue, r.getMetadata)
  }

  private def errVal(msg: String): VariantVal = {
    val b = new VariantBuilder(false)
    val start = b.getWritePos
    val fields = new java.util.ArrayList[FieldEntry]()
    val id = b.addKey(ErrorKey)
    fields.add(new FieldEntry(ErrorKey, id, b.getWritePos - start))
    b.appendString(msg)
    b.finishWritingObject(start, fields)
    out(b)
  }

  private def isError(x: Variant): Boolean =
    x.getType == VariantUtil.Type.OBJECT && x.objectSize() == 1 &&
      x.getFieldByKey(ErrorKey) != null

  private def copyOf(x: Variant): VariantVal = {
    val b = new VariantBuilder(false)
    b.appendVariant(x)
    out(b)
  }

  // ---------------------------------------------------------------------
  // Render: Go json.Marshal parity (sorted keys — free, the encoding is
  // key-sorted; Jackson/Go number and string forms).
  // ---------------------------------------------------------------------
  def render(x: VariantVal): UTF8String = {
    val sb = new java.lang.StringBuilder
    renderInto(v(x), sb)
    UTF8String.fromString(sb.toString)
  }

  /** Go json.Marshal float form: whole doubles collapse (`-5.0` → `-5`),
    * matching the string and V tiers (JsonAlgebra.wholeDouble). */
  private def appendGoDouble(d: Double, sb: java.lang.StringBuilder): Unit =
    if (graft.values.JsonAlgebra.wholeDouble(d)) sb.append(d.toLong)
    else sb.append(graft.values.JsonAlgebra.goFloat(d))

  private def renderInto(x: Variant, sb: java.lang.StringBuilder): Unit = {
    import VariantUtil.Type._
    x.getType match {
      case NULL => sb.append("null")
      case BOOLEAN => sb.append(x.getBoolean)
      case LONG => sb.append(x.getLong)
      case DOUBLE => appendGoDouble(x.getDouble, sb)
      case FLOAT =>
        // shortest float32 form, NOT the double widening: Go marshals
        // float32(0.1) as "0.1" (strconv shortest for 32-bit) while
        // 0.1f.toDouble renders "0.10000000149011612"
        val f = x.getFloat
        if (graft.values.JsonAlgebra.wholeDouble(f.toDouble)) sb.append(f.toLong)
        else sb.append(graft.values.JsonAlgebra.goFloat32(f))
      case DECIMAL =>
        // parse_json holds exact decimals; Go parses JSON numbers into
        // float64 — render the double form when it is lossless so
        // 1.50 -> "1.5" like the reference, exact digits otherwise.
        val bd = x.getDecimal
        val d = bd.doubleValue()
        if (!d.isInfinite && new java.math.BigDecimal(java.lang.Double.toString(d)).compareTo(bd.stripTrailingZeros()) == 0)
          appendGoDouble(d, sb)
        else sb.append(bd.toPlainString)
      case STRING => appendQuoted(x.getString, sb)
      case ARRAY =>
        sb.append('[')
        var i = 0
        while (i < x.arraySize()) {
          if (i > 0) sb.append(',')
          renderInto(x.getElementAtIndex(i), sb)
          i += 1
        }
        sb.append(']')
      case OBJECT =>
        sb.append('{')
        var i = 0
        while (i < x.objectSize()) {
          if (i > 0) sb.append(',')
          val f = x.getFieldAtIndex(i)
          appendQuoted(f.key, sb)
          sb.append(':')
          renderInto(f.value, sb)
          i += 1
        }
        sb.append('}')
      case _ =>
        // outside the JSON universe (timestamp/binary/uuid/date): defer
        // to the engine's own JSON form
        sb.append(x.toJson(ZoneOffset.UTC))
    }
  }

  private def appendQuoted(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case ctl if ctl < ' ' => sb.append(f"\\u${ctl.toInt}%04x")
        case ok => sb.append(ok)
      }
      i += 1
    }
    sb.append('"')
  }

  // ---------------------------------------------------------------------
  // Dotted-path access (collections.go pathSepIndex semantics, incl.
  // backslash escapes — reuses JsonAlgebra's path splitter).
  // ---------------------------------------------------------------------
  private def splitPath(path: String): List[String] = {
    val alg = graft.values.JsonAlgebra
    def go(rest: String, acc: List[String]): List[String] = {
      val (idx, escaped) = alg.pathSepIndex(rest)
      if (idx < 0) (alg.unescape(rest) :: acc).reverse
      else {
        val head = rest.substring(0, idx)
        go(rest.substring(idx + 1),
          (if (escaped) alg.unescape(head) else head) :: acc)
      }
    }
    go(path, Nil)
  }

  /** Field access chain: missing key / non-object = in-band error value
    * (CEL field-access semantics). */
  def getPath(x: VariantVal, path: UTF8String): VariantVal = {
    var cur = v(x)
    val segs = splitPath(path.toString)
    var i = 0
    while (i < segs.length) {
      val k = segs(i)
      if (isError(cur)) return copyOf(cur)
      if (cur.getType != VariantUtil.Type.OBJECT)
        return errVal("no such key: " + k)
      val next = cur.getFieldByKey(k)
      if (next == null) return errVal("no such key: " + k)
      cur = next
      i += 1
    }
    copyOf(cur)
  }

  def hasPath(x: VariantVal, path: UTF8String): Boolean = {
    var cur = v(x)
    val segs = splitPath(path.toString)
    var i = 0
    while (i < segs.length) {
      if (cur.getType != VariantUtil.Type.OBJECT) return false
      val next = cur.getFieldByKey(segs(i))
      if (next == null) return false
      cur = next
      i += 1
    }
    true
  }

  /** collate: leaf gather with list auto-splice (collections.go
    * collatePath) — rendered JSON list output, parity with
    * JsonAlgebra.collate. */
  def collate(x: VariantVal, path: UTF8String): UTF8String = {
    val segs = splitPath(path.toString)
    if (segs.exists(_.isEmpty))
      return UTF8String.fromString(
        "{\"" + ErrorKey + "\":\"invalid parameter path for drop: " +
          path.toString + "\"}")
    val sb = new java.lang.StringBuilder
    sb.append('[')
    val n0 = sb.length
    gather(v(x), segs, sb, n0)
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  private def gather(cur: Variant, segs: List[String],
      sb: java.lang.StringBuilder, start: Int): Unit = {
    import VariantUtil.Type._
    cur.getType match {
      case ARRAY =>
        var i = 0
        while (i < cur.arraySize()) {
          gather(cur.getElementAtIndex(i), segs, sb, start); i += 1 }
      case OBJECT =>
        segs match {
          case k :: rest =>
            val next = cur.getFieldByKey(k)
            if (next != null) {
              if (rest.isEmpty) {
                // leaf: a list splices its elements, a value appends
                if (next.getType == ARRAY) {
                  var i = 0
                  while (i < next.arraySize()) {
                    if (sb.length > start) sb.append(',')
                    renderInto(next.getElementAtIndex(i), sb); i += 1
                  }
                } else {
                  if (sb.length > start) sb.append(',')
                  renderInto(next, sb)
                }
              } else gather(next, rest, sb, start)
            }
          case Nil =>
        }
      case _ =>
        if (segs.isEmpty) {
          if (sb.length > start) sb.append(',')
          renderInto(cur, sb)
        }
    }
  }

  // ---------------------------------------------------------------------
  // with / with_update / with_replace: single-pass sorted-merge of two
  // key-sorted objects — no re-parse, no Jackson tree.
  // ---------------------------------------------------------------------
  def withAll(dst: VariantVal, src: VariantVal): VariantVal =
    merge(dst, src, keepSrc = (_, _) => true)
  def withUpdate(dst: VariantVal, src: VariantVal): VariantVal =
    merge(dst, src, keepSrc = (inDst, _) => !inDst)
  def withReplace(dst: VariantVal, src: VariantVal): VariantVal =
    merge(dst, src, keepSrc = (inDst, _) => inDst)

  private def merge(dstV: VariantVal, srcV: VariantVal,
      keepSrc: (Boolean, String) => Boolean): VariantVal = {
    val d = v(dstV); val s = v(srcV)
    if (d.getType != VariantUtil.Type.OBJECT) return errVal("no such overload")
    if (s.getType != VariantUtil.Type.OBJECT) return errVal("unsupported src type")
    val b = new VariantBuilder(false)
    val start = b.getWritePos
    val fields = new java.util.ArrayList[FieldEntry]()
    def put(k: String, value: Variant): Unit = {
      val id = b.addKey(k)
      fields.add(new FieldEntry(k, id, b.getWritePos - start))
      b.appendVariant(value)
    }
    val dstKeys = (0 until d.objectSize()).map(d.getFieldAtIndex(_).key).toSet
    var i = 0
    while (i < d.objectSize()) {
      val f = d.getFieldAtIndex(i)
      val replacement = s.getFieldByKey(f.key)
      if (replacement != null && keepSrc(true, f.key)) put(f.key, replacement)
      else put(f.key, f.value)
      i += 1
    }
    var j = 0
    while (j < s.objectSize()) {
      val f = s.getFieldAtIndex(j)
      if (!dstKeys.contains(f.key) && keepSrc(false, f.key)) put(f.key, f.value)
      j += 1
    }
    b.finishWritingObject(start, fields)
    out(b)
  }

  // ---------------------------------------------------------------------
  // keys / values / size (collections.go keys:sorted, values:key-sorted)
  // ---------------------------------------------------------------------
  def keysOf(x: VariantVal): UTF8String = {
    val o = v(x)
    if (o.getType != VariantUtil.Type.OBJECT)
      return UTF8String.fromString("{\"" + ErrorKey + "\":\"no such overload\"}")
    val sb = new java.lang.StringBuilder
    sb.append('[')
    var i = 0
    while (i < o.objectSize()) {
      if (i > 0) sb.append(',')
      appendQuoted(o.getFieldAtIndex(i).key, sb)
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  def valuesOf(x: VariantVal): UTF8String = {
    val o = v(x)
    if (o.getType != VariantUtil.Type.OBJECT)
      return UTF8String.fromString("{\"" + ErrorKey + "\":\"no such overload\"}")
    val sb = new java.lang.StringBuilder
    sb.append('[')
    var i = 0
    while (i < o.objectSize()) {
      if (i > 0) sb.append(',')
      renderInto(o.getFieldAtIndex(i).value, sb)
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }

  /** CEL size: object/list/string member counts, error otherwise. */
  def sizeOf(x: VariantVal): Long = {
    import VariantUtil.Type._
    val t = v(x)
    t.getType match {
      case OBJECT => t.objectSize().toLong
      case ARRAY => t.arraySize().toLong
      case STRING => t.getString.codePointCount(0, t.getString.length).toLong
      case _ => -1L
    }
  }

  /** drop: remove dotted paths (collections.go drop). Mirrors
    * JsonAlgebra.dropFields exactly: paths fold left-to-right, lists map
    * the drop over their elements, scalars pass through, an empty path
    * segment is an in-band error value. */
  def dropPaths(x: VariantVal, paths: org.apache.spark.sql.catalyst.util.ArrayData): VariantVal = {
    var cur = v(x)
    var i = 0
    while (i < paths.numElements()) {
      val p = paths.getUTF8String(i).toString
      val segs = splitPath(p)
      if (isError(cur)) return copyOf(cur)
      if (segs.exists(_.isEmpty))
        return errVal(s"invalid parameter path for drop: $p")
      val b = new VariantBuilder(false)
      dropInto(cur, segs, b)
      cur = b.result()
      i += 1
    }
    copyOf(cur)
  }

  private def dropInto(cur: Variant, segs: List[String],
      b: VariantBuilder): Unit = {
    import VariantUtil.Type._
    cur.getType match {
      case ARRAY =>
        val start = b.getWritePos
        val offs = new java.util.ArrayList[Integer]()
        var i = 0
        while (i < cur.arraySize()) {
          offs.add(b.getWritePos - start)
          dropInto(cur.getElementAtIndex(i), segs, b)
          i += 1
        }
        b.finishWritingArray(start, offs)
      case OBJECT =>
        val start = b.getWritePos
        val fields = new java.util.ArrayList[FieldEntry]()
        val (k, rest) = (segs.head, segs.tail)
        var i = 0
        while (i < cur.objectSize()) {
          val f = cur.getFieldAtIndex(i)
          if (f.key != k || rest.nonEmpty) {
            val id = b.addKey(f.key)
            fields.add(new FieldEntry(f.key, id, b.getWritePos - start))
            if (f.key == k) dropInto(f.value, rest, b)
            else b.appendVariant(f.value)
          }
          i += 1
        }
        b.finishWritingObject(start, fields)
      case _ => b.appendVariant(cur)
    }
  }
}
