package graft.values

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode, TextNode}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Dynamic-document value algebra: the semantics kernel for the CEL
  * collections library of the reference engine, re-expressed over JSON
  * trees (the reference's value universe is exactly the JSON universe,
  * see /root/reference/mito.go:171-184 and lib/types.go:51-63).
  *
  * Pure Scala, no Spark dependency — wrapped by Catalyst expressions in
  * [[graft.expressions]]. Every function documents the reference
  * implementation it matches (file:line in /root/reference).
  *
  * Error values (CEL errors-as-data, lib/errors.go) are encoded as
  * `{"__error__": "<msg>"}` objects so they flow through data exactly
  * like CEL error values flow through expressions.
  */
object JsonAlgebra {
  val ErrorKey = "__error__"

  private val mapper = new ObjectMapper()
  private val nf     = JsonNodeFactory.instance

  def parse(s: String): JsonNode =
    try mapper.readTree(s)
    catch { case NonFatal(e) => error(s"failed to parse JSON: ${e.getMessage}") }

  /** Go `json.Marshal` prints a whole float64 without a fractional part
    * (`-5.0` → `-5`). Every render path — tree, streaming V, variant —
    * must share this predicate so the three tiers stay byte-identical. */
  @inline def wholeDouble(d: Double): Boolean =
    d == d.floor && !d.isInfinite && math.abs(d) < 1e15

  /** Go string order = byte order of the UTF-8 encoding = code-point
    * order. Java's String.compareTo compares UTF-16 units, which ranks
    * U+E000..U+FFFF ABOVE supplementary characters (their surrogates
    * start at 0xD800) — the opposite of Go. Every key sort (render,
    * keys(), values(), format_query) shares this ordering; the variant
    * tier is already byte-ordered by its encoding. */
  val goOrder: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0; var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca); j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** Go `encoding/json` float form for NON-whole doubles (whole ones
    * collapse via [[wholeDouble]] first): shortest digits; plain
    * decimal for 1e-6 <= |d| < 1e21, else e-notation with lowercase
    * `e`, explicit `+`, and no zero-padded exponent (Go's floatEncoder
    * turns strconv's `e-08` into `e-8`). Java's Double.toString has the
    * same shortest-digits guarantee but different notation boundaries,
    * so this converts rather than reformats — digits are never touched. */
  def goFloat(d: Double): String =
    if (d.isNaN || d.isInfinite) "\"" + d + "\"" // Jackson's quoted non-numeric form
    else goForm(java.lang.Double.toString(d), {
      val abs = math.abs(d); abs >= 1e-6 && abs < 1e21
    })

  /** float32 form (Go marshals float32 with 32-bit shortest digits and
    * compares the notation boundary IN float32 — 1e-6f widened to
    * double is < 1e-6, so the branch must not be taken in doubles). */
  def goFloat32(f: Float): String =
    if (f.isNaN || f.isInfinite) "\"" + f + "\""
    else goForm(java.lang.Float.toString(f), {
      val abs = math.abs(f); abs >= 1e-6f && abs < 1e21f
    })

  private def goForm(s: String, plain: Boolean): String = {
    val e = s.indexOf('E')
    if (plain) {
      if (e < 0) s
      // same digits, plain form; stripTrailingZeros because "1.0E-4"
      // would otherwise print "0.00010" where Go prints "0.0001"
      else new java.math.BigDecimal(s).stripTrailingZeros().toPlainString
    } else {
      // e-notation: Java "1.0E21"/"6.48E-8" -> Go "1e+21"/"6.48e-8"
      val (mant0, exp) = if (e < 0) (s, 0) else (s.substring(0, e), s.substring(e + 1).toInt)
      val mant = if (mant0.endsWith(".0")) mant0.dropRight(2) else mant0
      if (e < 0) mant // shortest repr without E can't be outside the range; guard
      else if (exp < 0) s"${mant}e-${-exp}"
      else s"${mant}e+$exp"
    }
  }

  /** Go `json.Encoder` SetIndent("", "\t") form (mito's stdout,
    * mito.go:351-356): tab indentation, `"key": value`, empty
    * composites compact, keys sorted, scalars via the same Go-faithful
    * serializer as [[render]]. Byte-identical to the reference's CLI
    * output (asserted against its goldens in ReferenceGoldenSpec). */
  def renderPretty(n: JsonNode, depth: Int = 0): String = {
    val tab = "\t" * depth
    if (n.isObject && n.size() > 0) {
      val keys = new Array[String](n.size)
      var i = 0
      n.fieldNames().forEachRemaining { k => keys(i) = k; i += 1 }
      java.util.Arrays.sort(keys, goOrder)
      keys.map { k =>
        val key = render(com.fasterxml.jackson.databind.node.TextNode.valueOf(k))
        s"$tab\t$key: ${renderPretty(n.get(k), depth + 1)}"
      }.mkString("{\n", ",\n", s"\n$tab}")
    } else if (n.isArray && n.size() > 0)
      (0 until n.size()).map(j => s"$tab\t${renderPretty(n.get(j), depth + 1)}")
        .mkString("[\n", ",\n", s"\n$tab]")
    else render(n)
  }

  /** Serialize with object keys sorted — matches Go `json.Marshal` map
    * key ordering (mito's encode_json, lib/json.go:207-247). Streams the
    * tree once with keys sorted at write time instead of deep-copying it
    * through sortKeys first; scalars delegate to the mapper's own
    * serializers (writeTree), so output is byte-identical to
    * writeValueAsString. */
  def render(n: JsonNode): String = {
    val w = new java.io.StringWriter(64)
    val g = mapper.createGenerator(w)
    def write(x: JsonNode): Unit =
      if (x.isObject) {
        g.writeStartObject()
        val o = x.asInstanceOf[ObjectNode]
        if (o.size > 1) {
          val keys = new Array[String](o.size)
          var i = 0
          o.fieldNames().forEachRemaining { k => keys(i) = k; i += 1 }
          java.util.Arrays.sort(keys, goOrder)
          keys.foreach { k => g.writeFieldName(k); write(o.get(k)) }
        } else o.properties().forEach { e =>
          g.writeFieldName(e.getKey); write(e.getValue)
        }
        g.writeEndObject()
      } else if (x.isArray) {
        g.writeStartArray()
        x.elements().forEachRemaining(write(_))
        g.writeEndArray()
      } else if (x.isFloatingPointNumber) {
        // DoubleNode would print "-5.0" / "6.48E-8"; Go collapses whole
        // floats and formats the rest per encoding/json (goFloat)
        val d = x.doubleValue()
        if (wholeDouble(d)) g.writeNumber(d.toLong) else g.writeNumber(goFloat(d))
      } else g.writeTree(x)
    write(n)
    g.close()
    w.toString
  }

  def sortKeys(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = nf.objectNode()
      o.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
        .sortBy(_._1)(goOrder).foreach { case (k, v) => out.set[JsonNode](k, sortKeys(v)) }
      out
    case a: ArrayNode =>
      val out = nf.arrayNode()
      a.elements().asScala.foreach(e => out.add(sortKeys(e)))
      out
    case other => other
  }

  def error(msg: String): ObjectNode = {
    val o = nf.objectNode()
    o.set[JsonNode](ErrorKey, new TextNode(msg))
    o
  }

  def isError(n: JsonNode): Boolean =
    n != null && n.isObject && n.size() == 1 && n.has(ErrorKey)

  private def arr(elems: Iterable[JsonNode]): ArrayNode = {
    val a = nf.arrayNode()
    elems.foreach(a.add)
    a
  }

  // ---------------------------------------------------------------------
  // flatten — deep flatten. Reference: lib/collections.go:560-583.
  // A list whose elements are ALL lists recurses into each; a list with
  // any non-list element contributes its elements as-is (one level).
  // ---------------------------------------------------------------------
  def flattenDeep(v: JsonNode): JsonNode = v match {
    case l: ArrayNode =>
      val dst = nf.arrayNode()
      def parts(value: ArrayNode): Unit = {
        val elems = value.elements().asScala.toSeq
        if (elems.exists(!_.isArray)) elems.foreach(dst.add)
        else elems.foreach(e => parts(e.asInstanceOf[ArrayNode]))
      }
      parts(l)
      dst
    case _ => error("no such overload")
  }

  // ---------------------------------------------------------------------
  // with / with_update / with_replace — map merges.
  // Reference: lib/collections.go:585-649.
  // ---------------------------------------------------------------------
  private def merge(dst: JsonNode, src: JsonNode)(keep: (ObjectNode, String) => Boolean): JsonNode =
    (dst, src) match {
      case (d: ObjectNode, s: ObjectNode) =>
        val out = d.deepCopy[ObjectNode]()
        s.properties().asScala.foreach { e =>
          if (keep(out, e.getKey)) out.set[JsonNode](e.getKey, e.getValue)
        }
        out
      case (_: ObjectNode, _) => error("unsupported src type")
      case _                  => error("no such overload")
    }

  /** right side wins (upsert). collections.go:585-594 */
  def withAll(dst: JsonNode, src: JsonNode): JsonNode = merge(dst, src)((_, _) => true)
  /** only add missing keys. collections.go:596-608 */
  def withUpdate(dst: JsonNode, src: JsonNode): JsonNode = merge(dst, src)((o, k) => !o.has(k))
  /** only overwrite existing keys. collections.go:610-622 */
  def withReplace(dst: JsonNode, src: JsonNode): JsonNode = merge(dst, src)((o, k) => o.has(k))

  // ---------------------------------------------------------------------
  // drop_empty — recursively remove zero-size lists/maps (empty strings
  // are kept). Reference: lib/collections.go:652-744.
  // ---------------------------------------------------------------------
  def dropEmpty(v: JsonNode): JsonNode = v match {
    case l: ArrayNode =>
      arr(l.elements().asScala.flatMap(keepNonEmpty).toSeq)
    case o: ObjectNode =>
      val out = nf.objectNode()
      o.properties().asScala.foreach { e =>
        keepNonEmpty(e.getValue).foreach(out.set[JsonNode](e.getKey, _))
      }
      out
    case other => other
  }

  private def keepNonEmpty(v: JsonNode): Option[JsonNode] =
    if (v.isArray || v.isObject) {
      if (v.size() == 0) None
      else {
        val res = dropEmpty(v)
        if (res.size() == 0) None else Some(res)
      }
    } else Some(v)

  // ---------------------------------------------------------------------
  // dotted-path handling with backslash escapes.
  // Reference: lib/collections.go:1118-1131 (pathSepIndex).
  // ---------------------------------------------------------------------
  /** Returns (offset of first unescaped '.', sawEscape). */
  def pathSepIndex(s: String): (Int, Boolean) = {
    var off = 0
    var escaped = false
    while (true) {
      val idx = s.indexOf('.', off)
      if (idx == -1) return (-1, escaped)
      off = idx
      if (idx == 0 || s.charAt(off - 1) != '\\') return (off, escaped)
      off += 1
      escaped = true
    }
    (-1, escaped) // unreachable
  }

  def unescape(s: String): String = s.replace("\\.", ".")

  // ---------------------------------------------------------------------
  // drop — remove field(s) at dotted path(s), recursing through lists.
  // Reference: lib/collections.go:753-831 (+hasFieldPath :833-883).
  // ---------------------------------------------------------------------
  def dropFields(obj: JsonNode, paths: Seq[String]): JsonNode =
    paths.foldLeft(obj)((o, p) => if (isError(o)) o else dropFieldPath(o, p))

  def dropFieldPath(argIn: JsonNode, path: String): JsonNode =
    try {
      if (!hasFieldPath(argIn, path)) argIn
      else argIn match {
        case l: ArrayNode =>
          arr(l.elements().asScala.map(dropFieldPath(_, path)).toSeq)
        case o: ObjectNode =>
          val (dotIdx, escaped) = pathSepIndex(path)
          if (dotIdx == 0 || dotIdx == path.length - 1)
            error(s"invalid parameter path for drop: $path")
          else if (dotIdx < 0) {
            val key = unescape(path)
            val out = nf.objectNode()
            o.properties().asScala.foreach { e =>
              if (e.getKey != key) out.set[JsonNode](e.getKey, e.getValue)
            }
            out
          } else {
            val head = if (escaped) unescape(path.substring(0, dotIdx)) else path.substring(0, dotIdx)
            val tail = path.substring(dotIdx + 1)
            val out  = nf.objectNode()
            o.properties().asScala.foreach { e =>
              if (e.getKey == head) out.set[JsonNode](head, dropFieldPath(e.getValue, tail))
              else out.set[JsonNode](e.getKey, e.getValue)
            }
            out
          }
        case other => other
      }
    } catch { case PathError(e) => e }

  private case class PathException(err: ObjectNode) extends RuntimeException
  private object PathError {
    def unapply(t: Throwable): Option[ObjectNode] = t match {
      case PathException(e) => Some(e)
      case _                => None
    }
  }

  def hasFieldPath(arg: JsonNode, path: String): Boolean = arg match {
    case l: ArrayNode => l.elements().asScala.exists(hasFieldPath(_, path))
    case o: ObjectNode =>
      val (dotIdx, escaped) = pathSepIndex(path)
      if (dotIdx == 0 || dotIdx == path.length - 1)
        throw PathException(error(s"invalid parameter path for drop: $path"))
      else if (dotIdx < 0) o.has(unescape(path))
      else {
        val head = if (escaped) unescape(path.substring(0, dotIdx)) else path.substring(0, dotIdx)
        val tail = path.substring(dotIdx + 1)
        o.has(head) && hasFieldPath(o.get(head), tail)
      }
    case _ => false
  }

  // ---------------------------------------------------------------------
  // collate — extract values at dotted path(s), descending through
  // lists, flattening one level when the leaf is a list.
  // Reference: lib/collections.go:885-971.
  // ---------------------------------------------------------------------
  def collate(arg: JsonNode, paths: Seq[String]): JsonNode =
    try arr(paths.flatMap(collatePath(arg, _)))
    catch { case PathError(e) => e }

  private def collatePath(arg: JsonNode, path: String): Seq[JsonNode] = arg match {
    case l: ArrayNode =>
      l.elements().asScala.toSeq.flatMap(collatePath(_, path))
    case o: ObjectNode =>
      val (dotIdx, escaped) = pathSepIndex(path)
      if (dotIdx == 0 || dotIdx == path.length - 1)
        throw PathException(error(s"invalid parameter path for drop: $path"))
      else if (dotIdx < 0) {
        val key = unescape(path)
        o.get(key) match {
          case null          => Nil
          case a: ArrayNode  => a.elements().asScala.toSeq
          case v             => Seq(v)
        }
      } else {
        val head = if (escaped) unescape(path.substring(0, dotIdx)) else path.substring(0, dotIdx)
        val tail = path.substring(dotIdx + 1)
        o.get(head) match {
          case null => Nil
          case v    => collatePath(v, tail)
        }
      }
    case other =>
      if (path.isEmpty) Seq(other) else Nil
  }

  // ---------------------------------------------------------------------
  // min / max over comparable lists. Reference: collections.go:973-1003.
  // CEL compare: numbers compare cross-type; strings/bools compare within
  // type; mixed kinds -> error ("no such overload").
  // ---------------------------------------------------------------------
  def minList(v: JsonNode): JsonNode = extremum(v, -1)
  def maxList(v: JsonNode): JsonNode = extremum(v, 1)

  private def extremum(v: JsonNode, want: Int): JsonNode = v match {
    case l: ArrayNode =>
      val elems = l.elements().asScala.toSeq
      var best: JsonNode = null
      for (e <- elems) {
        compareNodes(e, best) match {
          case None if best != null => return error("no such overload")
          case c =>
            if (best == null || c.contains(want)) best = e
            else if (c.isEmpty) return error("no such overload")
        }
      }
      if (best == null) error("no such overload") else best
    case _ => error("no such overload")
  }

  /** CEL three-way compare; None when incomparable. -1, 0, 1. */
  def compareNodes(a: JsonNode, b: JsonNode): Option[Int] = {
    if (b == null) return Some(0)
    (a, b) match {
      case _ if a.isNumber && b.isNumber =>
        Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      case _ if a.isTextual && b.isTextual => Some(a.textValue().compareTo(b.textValue()).sign)
      case _ if a.isBoolean && b.isBoolean =>
        Some(java.lang.Boolean.compare(a.booleanValue(), b.booleanValue()))
      case _ => None
    }
  }

  // ---------------------------------------------------------------------
  // zip — map from equal-length key/value lists. collections.go:1005-1023.
  // ---------------------------------------------------------------------
  def zipLists(keys: JsonNode, vals: JsonNode): JsonNode = (keys, vals) match {
    case (k: ArrayNode, v: ArrayNode) =>
      if (k.size() != v.size())
        error(s"zip: size(keys) != size(vals): ${k.size()} != ${v.size()}")
      else {
        val out = nf.objectNode()
        var i = 0
        while (i < k.size()) {
          val key = k.get(i)
          val ks  = if (key.isTextual) key.textValue() else render(key)
          out.set[JsonNode](ks, v.get(i))
          i += 1
        }
        out
      }
    case _ => error("no such overload")
  }

  // ---------------------------------------------------------------------
  // keys / values — sorted by key when comparable. collections.go:1025-1096.
  // JSON object keys are always strings -> always sortable.
  // ---------------------------------------------------------------------
  def keysSorted(v: JsonNode): JsonNode = v match {
    case o: ObjectNode =>
      arr(o.properties().asScala.toSeq.map(_.getKey).sorted(goOrder).map(k => new TextNode(k): JsonNode))
    case _ => error("no such overload")
  }

  def valuesSorted(v: JsonNode): JsonNode = v match {
    case o: ObjectNode =>
      arr(o.properties().asScala.toSeq.sortBy(_.getKey)(goOrder).map(_.getValue))
    case _ => error("no such overload")
  }

  // ---------------------------------------------------------------------
  // decode_json_stream — concatenated JSON values -> list.
  // Reference: lib/json.go:268-289.
  // ---------------------------------------------------------------------
  def decodeJsonStream(s: String): JsonNode =
    try {
      val p   = mapper.createParser(s)
      val it  = mapper.readValues(p, classOf[JsonNode])
      arr(it.asScala.toSeq)
    } catch { case NonFatal(e) => error(s"failed to decode JSON stream: ${e.getMessage}") }
}
