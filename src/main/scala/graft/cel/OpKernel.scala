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

  def sizeOp(x: UTF8String): UTF8String = toV(x) match {
    case e: VErr => out(e)
    case VString(s) => out(VInt(s.codePointCount(0, s.length).toLong))
    case VList(xs) => out(VInt(xs.length.toLong))
    case VMap(m) => out(VInt(m.size.toLong))
    case v => out(VErr(s"no such overload: size($v)"))
  }
}
