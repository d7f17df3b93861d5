package graft.expressions

import graft.values.JsonAlgebra
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for the dynamic-document (JSON) operator tier.
  *
  * Standalone Scala object => the compiler emits a `JsonKernel` class with
  * static forwarders, which Catalyst's `StaticInvoke` can call from
  * whole-stage-generated code (no UDF serialization, no codegen fallback).
  *
  * All methods are total: CEL error values (reference lib/errors.go) are
  * returned in-band as `{"__error__": msg}` documents, never thrown, so
  * the CEL error-absorption semantics survive distribution.
  */
object JsonKernel {
  import JsonAlgebra._

  private def str(u: UTF8String): String = u.toString
  private def out(n: com.fasterxml.jackson.databind.JsonNode): UTF8String =
    UTF8String.fromString(render(n))

  private def paths(a: ArrayData): Seq[String] = {
    val n = a.numElements()
    (0 until n).map(i => a.getUTF8String(i).toString)
  }

  def collate(json: UTF8String, path: UTF8String): UTF8String =
    out(JsonAlgebra.collate(parse(str(json)), Seq(str(path))))

  def collateMulti(json: UTF8String, ps: ArrayData): UTF8String =
    out(JsonAlgebra.collate(parse(str(json)), paths(ps)))

  def dropPath(json: UTF8String, path: UTF8String): UTF8String =
    out(JsonAlgebra.dropFields(parse(str(json)), Seq(str(path))))

  def dropPaths(json: UTF8String, ps: ArrayData): UTF8String =
    out(JsonAlgebra.dropFields(parse(str(json)), paths(ps)))

  def dropEmpty(json: UTF8String): UTF8String =
    out(JsonAlgebra.dropEmpty(parse(str(json))))

  def flattenDeep(json: UTF8String): UTF8String =
    out(JsonAlgebra.flattenDeep(parse(str(json))))

  def withAll(dst: UTF8String, src: UTF8String): UTF8String =
    out(JsonAlgebra.withAll(parse(str(dst)), parse(str(src))))

  def withUpdate(dst: UTF8String, src: UTF8String): UTF8String =
    out(JsonAlgebra.withUpdate(parse(str(dst)), parse(str(src))))

  def withReplace(dst: UTF8String, src: UTF8String): UTF8String =
    out(JsonAlgebra.withReplace(parse(str(dst)), parse(str(src))))

  def keysSorted(json: UTF8String): UTF8String =
    out(JsonAlgebra.keysSorted(parse(str(json))))

  def valuesSorted(json: UTF8String): UTF8String =
    out(JsonAlgebra.valuesSorted(parse(str(json))))

  def zip(keys: UTF8String, vals: UTF8String): UTF8String =
    out(JsonAlgebra.zipLists(parse(str(keys)), parse(str(vals))))

  def minList(json: UTF8String): UTF8String =
    out(JsonAlgebra.minList(parse(str(json))))

  def maxList(json: UTF8String): UTF8String =
    out(JsonAlgebra.maxList(parse(str(json))))

  /** Canonical form: parse + sorted-key render (mito encode_json parity
    * for already-dynamic documents; typed columns use to_json). */
  def normalize(json: UTF8String): UTF8String = out(parse(str(json)))

  def decodeStream(s: UTF8String): UTF8String =
    out(JsonAlgebra.decodeJsonStream(str(s)))

  def isError(json: UTF8String): Boolean =
    JsonAlgebra.isError(parse(str(json)))

  /** CEL try(e): weaken an error value to its message string (JSON-encoded);
    * pass non-errors through. Reference lib/try.go:116-134. */
  def tryWeaken(json: UTF8String): UTF8String = {
    val n = parse(str(json))
    if (JsonAlgebra.isError(n)) out(n.get(JsonAlgebra.ErrorKey)) else UTF8String.fromString(render(n))
  }

  /** CEL try(e, label): weaken an error value to {label: msg}. */
  def tryWeakenLabeled(json: UTF8String, label: UTF8String): UTF8String = {
    val n = parse(str(json))
    if (JsonAlgebra.isError(n)) {
      val o = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
      o.set[com.fasterxml.jackson.databind.JsonNode](str(label), n.get(JsonAlgebra.ErrorKey))
      out(o)
    } else UTF8String.fromString(render(n))
  }

  /** debug(tag, expr) pass-through logger — reference lib/debug.go:70-91
    * (handler prints "DEBUG: <tag>: <value>", mito.go:292-298). */
  def debugLog(tag: UTF8String, value: UTF8String): UTF8String = {
    System.err.println(s"DEBUG: $tag: $value")
    value
  }

  // ---------------------------------------------------------------------
  // CEL-lowering kernels (graft.cel.Lowering): operate on Go-rendered
  // JSON documents, reproducing Eval's Select/Index/encode_json/
  // constructor semantics including error texts for scalar operands.
  // ---------------------------------------------------------------------

  /** V-style repr of a scalar JSON node for Eval-parity error texts
    * ("no such field: f on VInt(5)"). */
  private def vRepr(n: com.fasterxml.jackson.databind.JsonNode): String =
    if (n == null || n.isNull) "VNull"
    else if (n.isTextual) s"VString(${n.textValue()})"
    else if (n.isIntegralNumber) s"VInt(${n.longValue()})"
    else if (n.isNumber) s"VDouble(${n.doubleValue()})"
    else if (n.isBoolean) s"VBool(${n.booleanValue()})"
    else render(n)

  /** CEL Select (Eval.scala Ast.Select): field of an object document. */
  def selectField(json: UTF8String, field: UTF8String): UTF8String = {
    val n = parse(str(json))
    val f = str(field)
    if (JsonAlgebra.isError(n)) return out(n)
    if (n.isObject) {
      if (n.has(f)) out(n.get(f)) else out(JsonAlgebra.error(s"no such key: $f"))
    } else if (n.isNull) out(JsonAlgebra.error(s"no such key: $f"))
    else out(JsonAlgebra.error(s"no such field: $f on ${vRepr(n)}"))
  }

  /** CEL Index with an int literal (Eval.scala Ast.Index). */
  def indexAt(json: UTF8String, idx: Long): UTF8String = {
    val n = parse(str(json))
    if (JsonAlgebra.isError(n)) return out(n)
    if (n.isArray) {
      if (idx >= 0 && idx < n.size()) out(n.get(idx.toInt))
      else out(JsonAlgebra.error(s"index out of range: $idx"))
    } else if (n.isObject) {
      val k = idx.toString
      if (n.has(k)) out(n.get(k)) else out(JsonAlgebra.error(s"no such key: $idx"))
    } else out(JsonAlgebra.error(s"no such overload: (${vRepr(n)})[VInt($idx)]"))
  }

  /** encode_json: the rendered document becomes a JSON STRING value. */
  def quoteJson(json: UTF8String): UTF8String = {
    val n = parse(str(json))
    if (JsonAlgebra.isError(n)) return out(n)
    out(com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
      .textNode(render(n)))
  }

  /** Build an object from literal keys + rendered-JSON values (CEL map
    * constructor; first error value in entry order propagates). */
  def objectFromPairs(keys: ArrayData, vals: ArrayData): UTF8String = {
    val o = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.objectNode()
    val n = keys.numElements()
    var i = 0
    while (i < n) {
      val v = parse(str(vals.getUTF8String(i)))
      if (JsonAlgebra.isError(v)) return out(v)
      o.set[com.fasterxml.jackson.databind.JsonNode](str(keys.getUTF8String(i)), v)
      i += 1
    }
    out(o)
  }

  /** Build a list from rendered-JSON elements (CEL list constructor). */
  def listFromParts(vals: ArrayData): UTF8String = {
    val a = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.arrayNode()
    val n = vals.numElements()
    var i = 0
    while (i < n) {
      val v = parse(str(vals.getUTF8String(i)))
      if (JsonAlgebra.isError(v)) return out(v)
      a.add(v)
      i += 1
    }
    out(a)
  }

  /** Split a JSON array document into one JSON string per element
    * (feeds explode() — row-granularity fan-out of a batch document). */
  def elements(json: UTF8String): ArrayData = {
    val n = parse(str(json))
    if (n.isArray) {
      val it = n.elements()
      val buf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      while (it.hasNext) buf += UTF8String.fromString(render(it.next()))
      new GenericArrayData(buf.toArray[Any])
    } else new GenericArrayData(Array[Any](out(JsonAlgebra.error("no such overload"))))
  }
}
