package graft.cel

import graft.values.JsonAlgebra
import org.apache.spark.unsafe.types.UTF8String

/** Lowering kernels for CEL operators over Go-rendered JSON operands:
  * each call round-trips rendered JSON -> V, applies THE interpreter's
  * own op implementation (Eval.binary / Eval.logical / casts), and
  * renders the result — exact semantic parity by construction, invoked
  * from whole-stage codegen via StaticInvoke.
  *
  * Soundness: within the lowerable subset every value stays in the JSON
  * universe (state documents + string/int/double/bool/null literals and
  * their op closures), so the rendered-JSON intermediate loses no type
  * information. Bytes/timestamp/duration-producing constructs are NOT
  * lowered ([[Lowering]] declines them).
  */
object OpKernel {
  import Eval._

  private def toV(u: UTF8String): V = {
    val n = JsonAlgebra.parse(u.toString)
    if (JsonAlgebra.isError(n)) VErr(n.get(JsonAlgebra.ErrorKey).asText())
    else fromJson(n)
  }

  private def out(v: V): UTF8String =
    UTF8String.fromString(JsonAlgebra.render(toJson(v)))

  /** Strict binary ops: arithmetic, comparisons, `in`. */
  def binaryOp(op: UTF8String, l: UTF8String, r: UTF8String): UTF8String =
    (toV(l), toV(r)) match {
      case (e: VErr, _) => out(e)
      case (_, e: VErr) => out(e)
      case (lv, rv) => out(binaryBridge(op.toString, lv, rv))
    }

  /** &&/|| with CEL error absorption (both sides pre-evaluated; CEL's
    * commutative absorption makes eager evaluation result-identical). */
  def logicalOp(l: UTF8String, r: UTF8String, and: Boolean): UTF8String =
    out(logicalBridge(toV(l), toV(r), and))

  def notOp(x: UTF8String): UTF8String = toV(x) match {
    case e: VErr => out(e)
    case VBool(b) => out(VBool(!b))
    case other => out(VErr(s"no such overload: !$other"))
  }

  def negOp(x: UTF8String): UTF8String = toV(x) match {
    case e: VErr => out(e)
    case VInt(i) => out(VInt(-i))
    case VDouble(d) => out(VDouble(-d))
    case other => out(VErr(s"no such overload: -$other"))
  }

  /** Ternary selector: 1 = then-branch, 0 = else-branch, else the
    * rendered error to surface (condition not a bool). */
  def ternarySel(cond: UTF8String): Int = toV(cond) match {
    case VBool(true) => 1
    case VBool(false) => 0
    case _ => -1
  }

  def ternaryErr(cond: UTF8String): UTF8String = toV(cond) match {
    case e: VErr => out(e)
    case other => out(VErr(s"no such overload: $other ? _ : _"))
  }

  /** Comprehension items of a rendered container: list elements, or the
    * (sorted) keys of an object as rendered JSON strings. Non-container
    * or error input returns an empty array — comprehendFinish re-derives
    * the error from the target itself. */
  def itemsOf(json: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = JsonAlgebra.parse(json.toString)
    val parts: Seq[String] =
      if (JsonAlgebra.isError(n)) Nil
      else if (n.isArray) {
        val b = Seq.newBuilder[String]
        n.elements().forEachRemaining(e => b += JsonAlgebra.render(e))
        b.result()
      } else if (n.isObject) {
        val b = Seq.newBuilder[String]
        n.properties().forEach(e => b += e.getKey)
        b.result().sorted.map(k => JsonAlgebra.render(
          com.fasterxml.jackson.databind.node.JsonNodeFactory.instance.textNode(k)))
      } else Nil
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map(s => UTF8String.fromString(s): Any).toArray)
  }

  /** Replay Eval.comprehension's fold over pre-evaluated per-item
    * pred/body results. Eager per-item evaluation is sound because the
    * fold never consults entries past its early exit. */
  def comprehendFinish(kind: UTF8String, target: UTF8String,
      items: org.apache.spark.sql.catalyst.util.ArrayData,
      preds: org.apache.spark.sql.catalyst.util.ArrayData,
      bodies: org.apache.spark.sql.catalyst.util.ArrayData,
      hasPred: Boolean): UTF8String = {
    val k = kind.toString
    toV(target) match {
      case e: VErr => return out(e)
      case _: VList | _: VMap =>
      case other => return out(VErr(s"no such overload: $k over $other"))
    }
    val n = items.numElements()
    val nf = com.fasterxml.jackson.databind.node.JsonNodeFactory.instance
    k match {
      case "map" =>
        val outArr = nf.arrayNode()
        var i = 0
        while (i < n) {
          val keep =
            if (!hasPred) true
            else toV(preds.getUTF8String(i)) match {
              case VBool(b) => b
              case e: VErr => return out(e)
              case other => return out(VErr(s"no such overload: predicate $other"))
            }
          if (keep) toV(bodies.getUTF8String(i)) match {
            case e: VErr => return out(e)
            case _ => outArr.add(JsonAlgebra.parse(bodies.getUTF8String(i).toString))
          }
          i += 1
        }
        UTF8String.fromString(JsonAlgebra.render(outArr))
      case "filter" =>
        val outArr = nf.arrayNode()
        var i = 0
        while (i < n) {
          toV(bodies.getUTF8String(i)) match {
            case VBool(true) => outArr.add(JsonAlgebra.parse(items.getUTF8String(i).toString))
            case VBool(false) =>
            case e: VErr => return out(e)
            case other => return out(VErr(s"no such overload: predicate $other"))
          }
          i += 1
        }
        UTF8String.fromString(JsonAlgebra.render(outArr))
      case "all" | "exists" | "exists_one" =>
        var ones = 0
        var i = 0
        while (i < n) {
          toV(bodies.getUTF8String(i)) match {
            case VBool(true) =>
              if (k == "exists") return out(VBool(true))
              ones += 1
            case VBool(false) =>
              if (k == "all") return out(VBool(false))
            case e: VErr => return out(e)
            case other => return out(VErr(s"no such overload: predicate $other"))
          }
          i += 1
        }
        out(k match {
          case "all" => VBool(true)
          case "exists" => VBool(false)
          case _ => VBool(ones == 1)
        })
      case other => out(VErr(s"unknown macro $other"))
    }
  }

  /** Env-free methods whose CEL types survive the rendered-JSON
    * round-trip: string inputs stay strings, outputs are strings/ints/
    * bools/lists — never bytes/timestamps (those constructs decline in
    * Lowering; e.g. md5 OUTPUTS bytes, so the crypto family is out). */
  val loweredMethods: Set[String] = Set(
    "to_lower", "to_upper", "to_title", "trim_space", "trim", "trim_left",
    "trim_right", "trim_prefix", "trim_suffix", "has_prefix", "has_suffix",
    "contains_substr", "contains_any", "compare", "count", "equal_fold",
    "fields", "index", "index_any", "last_index", "last_index_any", "join",
    "repeat", "replace", "replace_all", "split", "split_n", "split_after",
    "split_after_n", "substring", "decode_json", "decode_json_stream")

  /** Generic strict method dispatch through the interpreter's own
    * method table (Functions.method2). */
  def strictMethod(fn: UTF8String, target: UTF8String,
      args: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    toV(target) match {
      case e: VErr => out(e)
      case t =>
        val n = args.numElements()
        val vs = Vector.newBuilder[V]
        var i = 0
        while (i < n) {
          toV(args.getUTF8String(i)) match {
            case e: VErr => return out(e)
            case v => vs += v
          }
          i += 1
        }
        out(Functions.strictMethodBridge(fn.toString, t, vs.result()))
    }
  }

  /** Fused `.parse_time(layouts).format(outLayout)`: the timestamp
    * intermediate is a typed value (not JSON-faithful), so the pair is
    * lowered as ONE kernel going string -> string, calling the
    * interpreter's own method dispatch for both halves — error texts
    * and first-success layout-list semantics are identical by
    * construction. */
  def timeParseFormat(target: UTF8String, layouts: UTF8String,
      outLayout: UTF8String): UTF8String =
    (toV(target), toV(layouts), toV(outLayout)) match {
      case (e: VErr, _, _) => out(e)
      case (_, e: VErr, _) => out(e)
      case (_, _, e: VErr) => out(e)
      case (t, l, ol) =>
        Functions.strictMethodBridge("parse_time", t, Vector(l)) match {
          case e: VErr => out(e)
          case ts => out(Functions.strictMethodBridge("format", ts, Vector(ol)))
        }
    }

  /** Fused `now.format(layout)` / `now().format(layout)`: `now` is a
    * batch constant, so the timestamp arrives as a literal micros long. */
  def formatNowOp(nowMicros: Long, layout: UTF8String): UTF8String =
    toV(layout) match {
      case e: VErr => out(e)
      case l => out(Functions.strictMethodBridge("format",
        VTimestamp(nowMicros), Vector(l)))
    }

  /** Fused `.md5()/.sha1()/.sha256()` + `.hex()/.base64()/.base64_raw()`:
    * the digest's VBytes intermediate is not JSON-faithful, so the
    * digest+encode pair lowers as one string -> string kernel through
    * the interpreter's own dispatch. */
  def digestEncode(digest: UTF8String, enc: UTF8String,
      target: UTF8String): UTF8String =
    toV(target) match {
      case e: VErr => out(e)
      case t => Functions.strictMethodBridge(digest.toString, t, Vector.empty) match {
        case e: VErr => out(e)
        case b => out(Functions.strictMethodBridge(enc.toString, b, Vector.empty))
      }
    }

  /** Fused optional chains: `base.?a.b.?c.orValue(d)` (and .value() /
    * .hasValue()). VOpt is a typed value that cannot cross the rendered-
    * JSON boundary, so the whole select-spine + terminator lowers as ONE
    * kernel; the optional exists only inside this call. Step encoding:
    * "?f" = optional select, ".f" = strict select. baseKind: "of" wraps
    * the target in optional.of, "none" ignores the target
    * (optional.none()), "val" = plain value. */
  def optChain(baseKind: UTF8String, target: UTF8String,
      steps: org.apache.spark.sql.catalyst.util.ArrayData,
      term: UTF8String, dflt: UTF8String): UTF8String = {
    var cur: V = baseKind.toString match {
      case "of" => toV(target) match { case e: VErr => e; case v => VOpt(Some(v)) }
      case "none" => VOpt(None)
      case _ => toV(target)
    }
    var i = 0
    val n = steps.numElements()
    while (i < n && !cur.isInstanceOf[VErr]) {
      val s = steps.getUTF8String(i).toString
      val f = s.substring(1)
      // mirrors Eval's Ast.Select / Ast.SelectOpt cases exactly
      cur =
        if (s.charAt(0) == '?') cur match {
          case VMap(m) => VOpt(m.get(f))
          case VOpt(Some(VMap(m))) => VOpt(m.get(f))
          case VOpt(None) => VOpt(None)
          case VNull => VOpt(None)
          case other => VErr(s"no such field: $f on $other")
        } else cur match {
          case VMap(m) => m.getOrElse(f, VErr(s"no such key: $f"))
          case VOpt(Some(VMap(m))) => VOpt(m.get(f))
          case VOpt(None) => VOpt(None)
          case VNull => VErr(s"no such key: $f")
          case other => VErr(s"no such field: $f on $other")
        }
      i += 1
    }
    val res: V = cur match {
      case e: VErr => e
      case v => term.toString match {
        case "orValue" => toV(dflt) match {
          // strict args: a default that errors propagates regardless
          case e: VErr => e
          case d => v match {
            case VOpt(Some(x)) => x
            case VOpt(None) => d
            case other => other // orValue on a non-optional passes through
          }
        }
        case "hasValue" => v match {
          case VOpt(o) => VBool(o.isDefined)
          case _ => VBool(true)
        }
        case _ => v match { // "value"
          case VOpt(Some(x)) => x
          case VOpt(None) => VErr("optional.none() dereference")
          case other => other
        }
      }
    }
    out(res)
  }

  /** has(e.f) — NonStrict on the field, strict on the target. */
  def hasField(json: UTF8String, field: UTF8String): UTF8String = toV(json) match {
    case e: VErr => out(e)
    case VMap(m) => out(VBool(m.contains(field.toString)))
    case _ => out(VBool(false))
  }

  /** try(x): error becomes its message string (lib/try.go:96-111). */
  def tryOp(x: UTF8String): UTF8String = toV(x) match {
    case VErr(m) => out(VString(m))
    case v => out(v)
  }

  /** try(x, label): error becomes {label: message}. */
  def tryLabeled(x: UTF8String, label: UTF8String): UTF8String = toV(x) match {
    case VErr(m) => out(VMap(scala.collection.immutable.VectorMap(
      label.toString -> (VString(m): V))))
    case v => out(v)
  }

  def isErrorOp(x: UTF8String): UTF8String = out(VBool(toV(x).isInstanceOf[VErr]))

  /** `as` macro sequencing: the interpreter evaluates the bind target
    * strictly before the body, so a target error propagates even when the
    * body never references the binding. Lowering binds the target column
    * into the env (zero runtime cost when referenced) and wraps the body
    * result with this to restore target-first error propagation. */
  def asSeq(target: UTF8String, result: UTF8String): UTF8String =
    toV(target) match {
      case e: VErr => out(e)
      case _ => result
    }

  /** re_* with the pattern resolved at plan time (the named registry is
    * a driver-side config; execution is env-free). */
  def regexpMethod(fn: UTF8String, pattern: UTF8String, target: UTF8String,
      args: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    toV(target) match {
      case e: VErr => out(e)
      case t =>
        val n = args.numElements()
        val vs = Vector.newBuilder[V]
        var i = 0
        while (i < n) {
          toV(args.getUTF8String(i)) match {
            case e: VErr => return out(e)
            case v => vs += v
          }
          i += 1
        }
        out(Functions.regexpBridge(fn.toString, pattern.toString, t, vs.result()))
    }
  }

  /** Casts over the JSON universe — mirrors Functions.call's dispatch
    * for the V cases reachable in the lowered subset (no bytes/
    * timestamp/duration operands can occur there). */
  def castOp(fn: UTF8String, x: UTF8String): UTF8String = {
    val v = toV(x)
    v match {
      case e: VErr => return out(e)
      case _ =>
    }
    fn.toString match {
      case "dyn" => out(v)
      case "int" => v match {
        case VInt(i) => out(VInt(i))
        case VDouble(d) => out(VInt(d.toLong))
        case VString(s) =>
          try out(VInt(s.toLong))
          catch { case _: NumberFormatException => out(VErr(s"cannot convert to int: $s")) }
        case other => out(VErr(s"no such overload: int($other)"))
      }
      case "double" => v match {
        case VInt(i) => out(VDouble(i.toDouble))
        case VDouble(d) => out(VDouble(d))
        case VString(s) =>
          try out(VDouble(s.toDouble))
          catch { case _: NumberFormatException => out(VErr(s"cannot convert to double: $s")) }
        case other => out(VErr(s"no such overload: double($other)"))
      }
      case "string" => v match {
        case VString(s) => out(VString(s))
        case VInt(i) => out(VString(i.toString))
        case VDouble(d) => out(VString(
          if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString else d.toString))
        case VBool(b) => out(VString(b.toString))
        case other => out(VErr(s"no such overload: string($other)"))
      }
      case "bool" => v match {
        case VBool(b) => out(VBool(b))
        case VString("true") => out(VBool(true))
        case VString("false") => out(VBool(false))
        case other => out(VErr(s"no such overload: bool($other)"))
      }
      case other => out(VErr(s"unknown cast: $other"))
    }
  }

  def sizeOp(x: UTF8String): UTF8String = toV(x) match {
    case e: VErr => out(e)
    case VString(s) => out(VInt(s.codePointCount(0, s.length).toLong))
    case VList(xs) => out(VInt(xs.length.toLong))
    case VMap(m) => out(VInt(m.size.toLong))
    case v => out(VErr(s"no such overload: size($v)"))
  }
}
