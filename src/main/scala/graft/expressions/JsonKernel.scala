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
