package graft.cel

import graft.values.JsonAlgebra
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.immutable.VectorMap

/** Lowering kernels over the interpreter's OWN value type: a lowered
  * program parses `state` ONCE at the leaf ([[fromJsonText]]), threads
  * [[Eval.V]] objects through the Column tree as `ObjectType`
  * intermediates, and renders ONCE at the root ([[render]]) — the same
  * parse/render budget as the interpreter, with Catalyst doing the
  * program wiring instead of a per-row AST walk.
  *
  * This replaces the earlier rendered-JSON kernel (OpKernel), whose
  * per-op Jackson round-trips made multi-op programs pay ~2 parse/render
  * cycles PER OPERATOR. Because values never cross a JSON boundary
  * mid-program, every CEL type flows — bytes, timestamp, duration,
  * optionals — so constructs the JSON intermediate had to decline or
  * fuse (bare md5, bare parse_time, optional chains) lower directly.
  *
  * Every op delegates to the interpreter's own implementation
  * (Eval.binaryBridge / Functions.call2 / Functions.strictMethodBridge),
  * so parity with the interpreted tier holds by construction.
  */
object VOps {
  import Eval._

  @inline private def v(o: Object): V = o.asInstanceOf[V]

  /** Interning for plan-constant names (op/fn/field/pattern literals):
    * codegen hands the same UTF8String literal back every row, so the
    * per-row `toString` allocation becomes one content-hash lookup, and
    * the cached java.lang.String's memoized hashCode keeps the
    * downstream string-match dispatch cheap. Keys are plan literals —
    * the map is bounded by the program vocabulary, not the data. */
  private val names = new java.util.concurrent.ConcurrentHashMap[UTF8String, String]()
  @inline private def name(u: UTF8String): String = {
    val s = names.get(u)
    if (s != null) s
    else {
      // bound the table for CEL-as-a-service JVMs compiling unbounded
      // distinct programs: dropping the cache only costs re-interning
      if (names.size >= 4096) names.clear()
      val t = u.toString; names.putIfAbsent(u, t); t
    }
  }

  /** JSON text -> V (the state leaf; also literal fallback). Shared
    * with the interpreter's state binding ([[Eval.stateLeafV]]), so both
    * tiers agree on parse failures AND on the top-level error-object
    * promotion that keeps rendered error values in-band.
    *
    * One-entry per-thread memo: every `state` reference in a lowered
    * program is its own fromJsonText leaf (Catalyst expression trees
    * cannot share subtrees, codegen CSE skips ObjectType StaticInvoke,
    * and `With` let-bindings are analyzer-internal), so a 5-reference
    * program would pay 5 Jackson parses per row. The memo turns refs
    * 2..n into a byte-compare (~ns) against the last input. The key is
    * a defensive clone: codegen hands UTF8Strings backed by reused row
    * buffers, and caching the live reference would compare a mutated
    * buffer against itself. V values are immutable, so sharing the
    * parsed result across references is exactly the interpreter's own
    * single-binding semantics. */
  private val lastParse = new ThreadLocal[Array[Object]] {
    override def initialValue(): Array[Object] = new Array[Object](2)
  }
  def fromJsonText(u: UTF8String): Object = {
    val slot = lastParse.get()
    val k = slot(0).asInstanceOf[UTF8String]
    if (k != null && k.equals(u)) slot(1)
    else {
      val parsed = Eval.stateLeafV(u.toString)
      slot(0) = u.clone(); slot(1) = parsed
      parsed
    }
  }

  /** Program root: V -> Go-rendered JSON (direct streaming serializer —
    * no JsonNode tree build/sort/copy per row). */
  def render(o: Object): UTF8String =
    UTF8String.fromString(Eval.renderV(v(o)))

  // ---------------- operators (Eval's own implementations) ----------------
  def binary(op: UTF8String, l: Object, r: Object): Object =
    Eval.binaryBridge(name(op), v(l), v(r))

  /** &&/||: both sides pre-evaluated; CEL's commutative error absorption
    * makes eager evaluation result-identical. */
  def logical(l: Object, r: Object, and: Boolean): Object =
    Eval.logicalBridge(v(l), v(r), and)

  def not(x: Object): Object = v(x) match {
    case e: VErr => e
    case VBool(b) => VBool(!b)
    case other => VErr(s"no such overload: !$other")
  }

  def neg(x: Object): Object = v(x) match {
    case e: VErr => e
    case VInt(i) => VInt(-i)
    case VDouble(d) => VDouble(-d)
    case other => VErr(s"no such overload: -$other")
  }

  /** Eager ternary: both branches pre-evaluated — sound because errors
    * are in-band values and the lowered subset is side-effect-free. */
  def ternary(c: Object, t: Object, f: Object): Object = v(c) match {
    case e: VErr => e
    case VBool(true) => t
    case VBool(false) => f
    case other => VErr(s"no such overload: $other ? _ : _")
  }

  // ---------------- access (mirrors Eval's Select/SelectOpt/Has/Index) ----
  // V-level cores are shared with the closure compiler (Compile), which
  // resolves field names at compile time — no per-row interning there.
  def select(t: Object, f: UTF8String): Object = selectV(v(t), name(f))

  private[cel] def selectV(t: V, fd: String): V = t match {
    case err: VErr => err
    case VMap(m) => m.getOrElse(fd, VErr(s"no such key: $fd"))
    case VOpt(Some(VMap(m))) => VOpt(m.get(fd))
    case VOpt(None) => VOpt(None)
    case VNull => VErr(s"no such key: $fd")
    case other => VErr(s"no such field: $fd on $other")
  }

  def selectOpt(t: Object, f: UTF8String): Object = selectOptV(v(t), name(f))

  private[cel] def selectOptV(t: V, fd: String): V = t match {
    case err: VErr => err
    case VMap(m) => VOpt(m.get(fd))
    case VOpt(Some(VMap(m))) => VOpt(m.get(fd))
    case VOpt(None) => VOpt(None)
    case VNull => VOpt(None)
    case other => VErr(s"no such field: $fd on $other")
  }

  def hasField(t: Object, f: UTF8String): Object = hasFieldV(v(t), name(f))

  private[cel] def hasFieldV(t: V, fd: String): V = t match {
    case err: VErr => err
    case VMap(m) => VBool(m.contains(fd))
    case _ => VBool(false)
  }

  def index(t: Object, i: Object): Object = (v(t), v(i)) match {
    case (err: VErr, _) => err
    case (_, err: VErr) => err
    case (VList(xs), VInt(idx)) =>
      if (idx >= 0 && idx < xs.length) xs(idx.toInt)
      else VErr(s"index out of range: $idx")
    case (VMap(m), VString(k)) => m.getOrElse(k, VErr(s"no such key: $k"))
    case (VMap(m), VInt(k)) => m.getOrElse(k.toString, VErr(s"no such key: $k"))
    case (a, b) => VErr(s"no such overload: ($a)[$b]")
  }

  /** Optional index `c[?k]` — core shared with Eval/Compile. */
  def indexOpt(t: Object, i: Object): Object = Eval.indexOptV(v(t), v(i))

  // ---------------- constructors ----------------
  def listOf(vals: ArrayData): Object = {
    val n = vals.numElements()
    val b = Vector.newBuilder[V]
    var i = 0
    while (i < n) {
      objAt(vals, i) match {
        // a NULL input column nulls the whole result (CreateArray does
        // not propagate element nulls; the interpreter returns NULL for
        // the row) — without this, a null element would crash renderV
        case null => return null
        case err: VErr => return err
        case x => b += x
      }
      i += 1
    }
    VList(b.result())
  }

  /** Map literal: collect evaluated (key, value) pairs — a null element
    * nulls the row (see listOf) — then build through the ONE shared
    * key-typing/duplicate core ([[Eval.mapFromPairs]]), so the Column
    * tier, the closure compiler, and the interpreter agree on key
    * semantics by construction. */
  def mapOf(keys: ArrayData, vals: ArrayData): Object = {
    val n = keys.numElements()
    val pairs = Vector.newBuilder[(V, V)]
    var i = 0
    while (i < n) {
      (objAt(keys, i), objAt(vals, i)) match {
        case (null, _) | (_, null) => return null
        case (k, v) => pairs += ((k, v))
      }
      i += 1
    }
    Eval.mapFromPairs(pairs.result())
  }

  // ---------------- NonStrict handlers ----------------
  def tryOp(x: Object): Object = v(x) match {
    case VErr(m) => VString(m)
    case ok => ok
  }

  def tryLabeled(x: Object, label: UTF8String): Object = v(x) match {
    case VErr(m) => VMap(VectorMap(name(label) -> (VString(m): V)))
    case ok => ok
  }

  def isError(x: Object): Object = VBool(v(x).isInstanceOf[VErr])

  /** `as` macro sequencing: the interpreter evaluates the bind target
    * strictly before the body, so a target error propagates even when
    * the body never references the binding. */
  def asSeq(target: Object, result: Object): Object = v(target) match {
    case e: VErr => e
    case _ => result
  }

  // ---------------- optionals ----------------
  def optOf(x: Object): Object = v(x) match {
    case e: VErr => e
    case ok => VOpt(Some(ok))
  }

  def optNone(): Object = VOpt(None)

  def optOfNonZero(x: Object): Object = v(x) match {
    case e: VErr => e
    case ok => VOpt(if (Eval.isZeroV(ok)) None else Some(ok))
  }

  def orOpt(t: Object, d: Object): Object = Eval.orOptV(v(t), v(d))

  def orValue(t: Object, d: Object): Object = (v(t), v(d)) match {
    case (e: VErr, _) => e
    case (_, e: VErr) => e // strict arg, matching the interpreter
    case (VOpt(Some(x)), _) => x
    case (VOpt(None), dv) => dv
    case (other, _) => other // orValue on a non-optional passes through
  }

  def optValue(t: Object): Object = v(t) match {
    case e: VErr => e
    case VOpt(Some(x)) => x
    case VOpt(None) => VErr("optional.none() dereference")
    case other => other
  }

  def hasValue(t: Object): Object = v(t) match {
    case e: VErr => e
    case VOpt(o) => VBool(o.isDefined)
    case _ => VBool(true)
  }

  // ---------------- global calls / methods ----------------
  def call1(fn: UTF8String, a: Object): Object = v(a) match {
    case e: VErr => e
    case x => Eval.guard(Functions.call2(name(fn), Vector(x)))
  }

  def call2(fn: UTF8String, a: Object, b: Object): Object = (v(a), v(b)) match {
    case (e: VErr, _) => e
    case (_, e: VErr) => e
    case (x, y) => Eval.guard(Functions.call2(name(fn), Vector(x, y)))
  }

  def call3(fn: UTF8String, a: Object, b: Object, c: Object): Object =
    (v(a), v(b), v(c)) match {
      case (e: VErr, _, _) => e
      case (_, e: VErr, _) => e
      case (_, _, e: VErr) => e
      case (x, y, z) => Eval.guard(Functions.call2(name(fn), Vector(x, y, z)))
    }

  def method0(fn: UTF8String, t: Object): Object = v(t) match {
    case e: VErr => e
    case x => Functions.strictMethodBridge(name(fn), x, Vector.empty)
  }

  def method1(fn: UTF8String, t: Object, a: Object): Object =
    (v(t), v(a)) match {
      case (e: VErr, _) => e
      case (_, e: VErr) => e
      case (x, y) => Functions.strictMethodBridge(name(fn), x, Vector(y))
    }

  def method2(fn: UTF8String, t: Object, a: Object, b: Object): Object =
    (v(t), v(a), v(b)) match {
      case (e: VErr, _, _) => e
      case (_, e: VErr, _) => e
      case (_, _, e: VErr) => e
      case (x, y, z) => Functions.strictMethodBridge(name(fn), x, Vector(y, z))
    }

  def method3(fn: UTF8String, t: Object, a: Object, b: Object, c: Object): Object =
    (v(t), v(a), v(b), v(c)) match {
      case (e: VErr, _, _, _) => e
      case (_, e: VErr, _, _) => e
      case (_, _, e: VErr, _) => e
      case (_, _, _, e: VErr) => e
      case (x, y, z, w) => Functions.strictMethodBridge(name(fn), x, Vector(y, z, w))
    }

  /** re_* with the pattern resolved at plan time (named registry is a
    * driver-side config; execution is env-free). */
  def regexp0(fn: UTF8String, pattern: UTF8String, t: Object): Object = v(t) match {
    case e: VErr => e
    case x => Functions.regexpBridge(name(fn), name(pattern), x, Vector.empty)
  }

  def regexp1(fn: UTF8String, pattern: UTF8String, t: Object, a: Object): Object =
    (v(t), v(a)) match {
      case (e: VErr, _) => e
      case (_, e: VErr) => e
      case (x, y) => Functions.regexpBridge(name(fn), name(pattern), x, Vector(y))
    }

  /** Hintless decode_xml (the named-XSD overload needs env.xsds). */
  def decodeXml(t: Object): Object = v(t) match {
    case e: VErr => e
    case x => Eval.guard {
      val bytes = x match {
        case VBytes(b) => b
        case VString(s) => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        case other => return VErr(s"no such overload: bytes from $other")
      }
      fromJsonText(graft.expressions.XmlKernel.decodeXmlHinted(
        UTF8String.fromBytes(bytes), UTF8String.fromString(""))).asInstanceOf[V]
    }
  }

  // ---------------- comprehensions ----------------
  /** One lowered comprehension = one compiled fold: `spec` is a
    * plan-constant [[Compile.Compiled]] (the closure graph wired at plan
    * time); `vals` are the free variables' lowered Columns in the
    * compiler's slot order (sorted free names). Per row: fill the frame,
    * run. A null captured value (NULL input column) nulls the row, like
    * every constructor kernel (see listOf). */
  def comprehend(spec: Object, vals: ArrayData): Object = {
    val c = spec.asInstanceOf[Compile.Compiled]
    val frame = new Array[V](c.frameSize)
    var i = 0
    val n = vals.numElements()
    while (i < n) {
      objAt(vals, i) match {
        case null => return null
        case x => frame(i) = x
      }
      i += 1
    }
    c.run(frame)
  }

  @inline private def objAt(a: ArrayData, i: Int): V = (a match {
    case g: GenericArrayData => g.array(i)
    case other => other.get(i, null)
  }).asInstanceOf[V]
}
