package graft.expressions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}
import graft.values.JsonAlgebra
import org.apache.spark.unsafe.types.UTF8String

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import java.io.StringReader
import scala.util.control.NonFatal

/** XML decode kernel mirroring the reference's schemaless XML walk
  * (/root/reference/lib/xml/xml.go:176-236): all leaves are strings,
  * repeated sibling elements auto-promote to lists (:209-224),
  * attributes become fields (:229-232), mixed content keeps cdata under
  * "#text", typed coercion per hint tree (`entype` :240-271 — bool only
  * for "TRUE"/"FALSE", int/float parse with string fallback).
  *
  * The hint tree is the compiled form of the reference's XSD support
  * (xml/xml.go:33-41 `Detail`): a JSON object
  *   {"elem": {"type": "int"|"float"|"bool", "plural": true,
  *             "children": {...}}}
  * supplied directly (XSD -> tree compilation is a config-time concern,
  * not a per-row one).
  *
  * Output is a dynamic-tier JSON document: {"doc": ..., "#text": ...},
  * matching decodeXMLWithXSD (lib/xml.go:177-208).
  */
object XmlKernel {
  private val nf = JsonNodeFactory.instance

  // Hint trees are plan-time literals (compiled XSDs), so the parsed
  // cache stays bounded by the number of distinct hint configs.
  private val hintCache =
    new java.util.concurrent.ConcurrentHashMap[String, JsonNode]()

  // XMLInputFactory.newInstance() walks the service loader — far too
  // expensive per row (it dominated decode at ~160us/row). The factory
  // is not guaranteed thread-safe, so cache one per executor thread.
  private val factory = new ThreadLocal[XMLInputFactory] {
    override def initialValue(): XMLInputFactory = {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f
    }
  }

  def decodeXml(data: UTF8String): UTF8String = decodeXmlHinted(data, null)

  def decodeXmlHinted(data: UTF8String, hintsJson: UTF8String): UTF8String = {
    // Go's encoding/xml consumes tag-less input as chardata until EOF and
    // reports io.ErrUnexpectedEOF; surface the same error text.
    if (data != null && !data.toString.contains('<'))
      return UTF8String.fromString(JsonAlgebra.render(
        JsonAlgebra.error("failed to unmarshal XML document: unexpected EOF")))
    val out =
      try {
        val hints: JsonNode =
          if (hintsJson == null || hintsJson.numChars() == 0) nf.objectNode()
          else hintCache.computeIfAbsent(hintsJson.toString, JsonAlgebra.parse(_))
        val r = factory.get().createXMLStreamReader(new StringReader(data.toString))
        val (cdata, doc) = walk(r, Nil, hints)
        val m = nf.objectNode()
        if (cdata.nonEmpty) m.set[JsonNode]("#text", nf.textNode(cdata))
        if (doc.size() > 0) m.set[JsonNode]("doc", doc)
        m
      } catch {
        case NonFatal(e) =>
          JsonAlgebra.error(s"failed to unmarshal XML document: ${e.getMessage}")
      }
    UTF8String.fromString(JsonAlgebra.render(out))
  }

  private def hintFor(details: JsonNode, key: String): JsonNode =
    if (details != null && details.isObject && details.has(key)) details.get(key)
    else nf.objectNode()

  /** Recursive element walk; returns (cdata, elems). Mirrors walkXML. */
  private def walk(r: XMLStreamReader, attrs: Seq[(String, String)],
      details: JsonNode): (String, ObjectNode) = {
    val elems = nf.objectNode()
    var cdata = ""
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val key = r.getLocalName
          val det = hintFor(details, key)
          // Attributes plus namespace declarations: Go's encoding/xml
          // reports xmlns:foo="uri" as a regular attribute named "foo"
          // (xml.go's walk keeps it); StAX splits them out.
          val childAttrs = (0 until r.getAttributeCount)
            .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i)) ++
            (0 until r.getNamespaceCount).map { i =>
              val p = r.getNamespacePrefix(i)
              (if (p == null || p.isEmpty) "xmlns" else p) -> r.getNamespaceURI(i)
            }
          val (childCdata, part) = walk(r, childAttrs,
            if (det.has("children")) det.get("children") else nf.objectNode())
          var add: JsonNode =
            if (part.size() == 0) nf.textNode(childCdata)
            else {
              if (childCdata.nonEmpty) part.set[JsonNode]("#text", nf.textNode(childCdata))
              part
            }
          add = entype(add, if (det.has("type")) det.get("type").asText() else "string")
          val plural = det.has("plural") && det.get("plural").asBoolean()
          elems.get(key) match {
            case null =>
              if (plural) { val a = nf.arrayNode(); a.add(add); elems.set[JsonNode](key, a) }
              else elems.set[JsonNode](key, add)
            case prev if prev.isArray =>
              prev.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode].add(add)
            case prev =>
              val a = nf.arrayNode(); a.add(prev); a.add(add)
              elems.set[JsonNode](key, a)
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          val t = r.getText.trim
          if (t.nonEmpty || cdata.isEmpty) cdata = t
        case XMLStreamConstants.END_ELEMENT =>
          attrs.foreach { case (k, v) => elems.set[JsonNode](k, nf.textNode(v)) }
          return (cdata, elems)
        case XMLStreamConstants.END_DOCUMENT =>
          return (cdata, elems)
        case _ =>
      }
    }
    (cdata, elems)
  }

  /** entype — xml/xml.go:240-271. */
  private def entype(v: JsonNode, t: String): JsonNode =
    if (!v.isTextual) v
    else t match {
      case "bool" =>
        v.textValue() match {
          case "TRUE"  => nf.booleanNode(true)
          case "FALSE" => nf.booleanNode(false)
          case _       => v
        }
      case "int" =>
        try nf.numberNode(v.textValue().toLong) catch { case _: NumberFormatException => v }
      case "float" =>
        try nf.numberNode(v.textValue().toDouble) catch { case _: NumberFormatException => v }
      case _ => v
    }
}
