package graft.cel

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, ObjectType, StringType}
import org.apache.spark.sql.{functions => F}

import scala.collection.immutable.VectorMap

/** CEL → Catalyst compiler: programs in the lowerable subset compile to
  * a Column tree that parses `state` ONCE at the leaf, threads the
  * interpreter's own value type ([[Eval.V]]) through `ObjectType`
  * intermediates ([[VOps]]), and renders ONCE at the root. Anything
  * outside the subset returns None and the caller falls back to the
  * interpreter ([[CelEvalExpression]]), so lowering is a pure
  * optimization: both paths dispatch to the SAME op implementations
  * (Eval / Functions), and parity holds by construction.
  *
  * This is the engine's answer to the reference's interpreter execution
  * model (cel-go tree-walk, mito.go:329-358): the program is compiled
  * ONCE on the driver; executors run the wired kernel graph with no
  * per-row AST dispatch and no per-op serialization.
  *
  * vs the earlier rendered-JSON lowering: intermediates used to be
  * Go-rendered JSON strings, costing a Jackson parse+render PER
  * OPERATOR and confining the subset to JSON-faithful types. V-object
  * threading removes both limits — bytes/timestamp/duration/optional
  * intermediates flow, so bare `md5()`, bare `parse_time()`, optional
  * select chains, `timestamp()`/`duration()`/`uint()` casts and the
  * request-builder family all lower directly (no fused special cases).
  *
  * CEL literals become plan-time `ObjectType` Literals (zero per-row
  * cost); `now`/`now()` bind as a batch-constant VTimestamp literal,
  * matching the engine's fixed-now evaluation contract.
  */
object Lowering {

  private val K = Class.forName("graft.cel.VOps")
  private val OT: DataType = ObjectType(classOf[Object])
  private val Str = StringType

  import Eval._

  private def shim(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.Shim.column(e)
  private def expr(c: Column) = org.apache.spark.sql.graft.Shim.expression(c)

  /** StaticInvoke into VOps returning a V object. */
  private def op(name: String, inTypes: Seq[DataType], args: Column*): Column =
    shim(StaticInvoke(K, OT, name, args.map(expr).toIndexedSeq, inTypes))

  /** StaticInvoke into VOps returning a SQL-typed value (the root render). */
  private def opTyped(ret: DataType, name: String, inTypes: Seq[DataType],
      args: Column*): Column =
    shim(StaticInvoke(K, ret, name, args.map(expr).toIndexedSeq, inTypes))

  /** A CEL value as a plan-time constant (no per-row materialization). */
  private def litV(x: V): Column = shim(Literal.fromObject(x, OT))

  /** Methods the V tier lowers via the interpreter's own method2
    * dispatch. Deliberately excluded: send_to/close (channel side
    * effects), get/head/post/do_request (executing HTTP), rate_limit /
    * named-XSD decode_xml (need the evaluation env). */
  private[cel] val loweredMethods: Set[String] = Set(
    "size", "collate", "drop", "drop_empty", "flatten", "with",
    "with_update", "with_replace", "zip", "keys", "values", "min", "max",
    "mime", "request", "get_request", "post_request",
    "basic_authentication", "parse_url", "format_url", "parse_query",
    "format_query", "encode_json", "decode_json", "decode_json_stream",
    "to_lower", "to_upper", "to_title", "trim_space", "trim", "trim_left",
    "trim_right", "trim_prefix", "trim_suffix", "has_prefix", "has_suffix",
    "contains_substr", "contains_any", "compare", "count", "equal_fold",
    "fields", "index", "index_any", "last_index", "last_index_any", "join",
    "repeat", "replace", "replace_all", "split", "split_n", "split_after",
    "split_after_n", "substring", "valid_utf8", "to_valid_utf8", "format",
    "parse_time", "md5", "sha1", "sha256", "hex", "base64", "base64_raw",
    "base64_decode", "base64_raw_decode", "hmac",
    // cel-go STANDARD env: string predicates, matches, time accessors
    "contains", "startsWith", "endsWith", "matches",
    "getFullYear", "getMonth", "getDayOfYear", "getDayOfMonth",
    "getDate", "getDayOfWeek", "getHours", "getMinutes",
    "getSeconds", "getMilliseconds")

  /** Free variables of `e`: identifiers not bound by a comprehension or
    * `as` variable in scope (used to capture a lowered comprehension's
    * environment into its fold kernel). */
  private[cel] def freeVars(e: Ast, bound: Set[String]): Set[String] = e match {
    case Ast.Ident(n) => if (bound(n)) Set.empty else Set(n)
    case Ast.Select(t, _) => freeVars(t, bound)
    case Ast.SelectOpt(t, _) => freeVars(t, bound)
    case Ast.Has(t, _) => freeVars(t, bound)
    case Ast.Index(t, i) => freeVars(t, bound) ++ freeVars(i, bound)
    case Ast.IndexOpt(t, i) => freeVars(t, bound) ++ freeVars(i, bound)
    case Ast.Call(_, as) => as.iterator.flatMap(freeVars(_, bound)).toSet
    case Ast.Method(t, _, as) =>
      freeVars(t, bound) ++ as.iterator.flatMap(freeVars(_, bound))
    case Ast.Unary(_, x) => freeVars(x, bound)
    case Ast.Binary(_, l, r) => freeVars(l, bound) ++ freeVars(r, bound)
    case Ast.Ternary(c, t, f) =>
      freeVars(c, bound) ++ freeVars(t, bound) ++ freeVars(f, bound)
    case Ast.ListLit(es) => es.iterator.flatMap(freeVars(_, bound)).toSet
    case Ast.MapLit(en) =>
      en.iterator.flatMap { case (k, v) => freeVars(k, bound) ++ freeVars(v, bound) }.toSet
    case Ast.Comprehension(_, t, v, p, b) =>
      freeVars(t, bound) ++ p.map(freeVars(_, bound + v)).getOrElse(Set.empty) ++
        freeVars(b, bound + v)
    case _ => Set.empty
  }

  /** Compile `program` to a Column producing the program result as
    * Go-rendered JSON, given the state document column (itself JSON).
    * None when the program uses constructs outside the lowerable subset. */
  /** Test hook (LoweringSpec's tier-coverage gate): when set, tryLower
    * declines EVERY program — simulating a broken lowering rule whose
    * only symptom is a silent fallback to the interpreter. The gate
    * must trip under it; production code never touches this. */
  @volatile private[graft] var breakForTest: Boolean = false

  def tryLower(program: String, state: Column,
      regexps: Map[String, String] = Map.empty,
      nowMicros: Option[Long] = None): Option[Column] = {
    if (breakForTest) return None
    val ast = try Parser.parse(program) catch { case _: Exception => return None }
    val env0 = Eval.typeIdentsV.map { case (k, v) => k -> litV(v) } ++ Map(
      "state" -> op("fromJsonText", Seq(Str), state),
      "time_layout" -> litV(Eval.timeLayoutV)) ++ // the interpreter's own constant
      nowMicros.map(us => "now" -> litV(VTimestamp(us)))
    // Deliberately an op-tree of StaticInvokes, NOT one whole-program
    // compiled closure: routing the entire program through
    // Compile-style wired closures was measured SLOWER (bench.sh
    // median-of-5 at sf0.1: q58 0.65 -> 0.72 s, the 20+-op wide-chain
    // shape 2.41 -> 2.85 s) — whole-stage codegen emits direct static
    // calls per op that JIT inlines, while a closure graph is
    // megamorphic CV.apply dispatch. Closures win only where the
    // alternative is per-element AST dispatch (comprehension bodies —
    // the Compile fold path).
    lower(ast, env0)(regexps, nowMicros)
      .map(c => opTyped(Str, "render", Seq(OT), c))
  }

  /** Identifiers that are plan-time constants (safe inside a foldable
    * subtree): the CEL type identifiers and `time_layout`. `now` joins
    * them only when nowMicros is fixed (batch-constant lowering). */
  private val constIdents: Set[String] = Eval.typeIdentsV.keySet + "time_layout"

  /** Plan-time partial evaluation (the CEL-level analogue of Catalyst
    * ConstantFolding): a subtree that lowered successfully is pure by
    * construction (the subset excludes side effects, executing HTTP and
    * nondeterminism), so if it also references no per-row data — no
    * `state`, only const identifiers — evaluate it ONCE here with the
    * interpreter and ship the result V as a plan literal. Errors stay
    * in-band (a closed `1/0` folds to its VErr value). Folding runs
    * AFTER lowerCore so a non-lowerable closed call (uuid(), debug(),
    * get()) can never be evaluated at plan time by mistake. */
  private def lower(e: Ast, env: Map[String, Column])
      (implicit regexps: Map[String, String],
        nowMicros: Option[Long]): Option[Column] = {
    val r = lowerCore(e, env)
    if (r.isEmpty || !worthFolding(e)) return r
    val free = freeVars(e, Set.empty)
    if (!free.forall(n => constIdents(n) || (n == "now" && nowMicros.isDefined)))
      return r
    try Some(litV(Eval.eval(e, Eval.Env(
      Eval.typeIdentsV ++ Map("time_layout" -> Eval.timeLayoutV) ++
        nowMicros.map(us => "now" -> (VTimestamp(us): V)),
      nowMicros.getOrElse(0L), regexps))))
    catch { case _: Exception => r }
  }

  /** Composite nodes only: literals and idents are already plan
    * constants, and folding them would just rebuild the same Literal. */
  private[cel] def worthFolding(e: Ast): Boolean = e match {
    case _: Ast.StringLit | _: Ast.IntLit | _: Ast.UintLit | _: Ast.DoubleLit |
         _: Ast.BoolLit | _: Ast.BytesLit | Ast.NullLit | _: Ast.Ident => false
    case _ => true
  }

  private def lowerCore(e: Ast, env: Map[String, Column])
      (implicit regexps: Map[String, String],
        nowMicros: Option[Long]): Option[Column] = e match {
    case Ast.StringLit(s) => Some(litV(VString(s)))
    case Ast.IntLit(v) => Some(litV(VInt(v)))
    case Ast.UintLit(v) => Some(litV(VUint(v)))
    case Ast.DoubleLit(v) => Some(litV(VDouble(v)))
    case Ast.BoolLit(v) => Some(litV(VBool(v)))
    case Ast.BytesLit(v) => Some(litV(VBytes(v)))
    case Ast.NullLit => Some(litV(VNull))

    case Ast.Ident(name) => env.get(name)

    case Ast.Select(t, f) =>
      lower(t, env).map(c => op("select", Seq(OT, Str), c, F.lit(f)))
    case Ast.SelectOpt(t, f) =>
      lower(t, env).map(c => op("selectOpt", Seq(OT, Str), c, F.lit(f)))
    case Ast.Has(t, f) =>
      lower(t, env).map(c => op("hasField", Seq(OT, Str), c, F.lit(f)))
    case Ast.Index(t, i) =>
      for (tc <- lower(t, env); ic <- lower(i, env))
        yield op("index", Seq(OT, OT), tc, ic)
    case Ast.IndexOpt(t, i) =>
      for (tc <- lower(t, env); ic <- lower(i, env))
        yield op("indexOpt", Seq(OT, OT), tc, ic)

    case Ast.MapLit(entries) =>
      val keys = entries.map { case (k, _) => lower(k, env).getOrElse(return None) }
      val vals = entries.map { case (_, v) => lower(v, env).getOrElse(return None) }
      Some(op("mapOf", Seq(ArrayType(OT), ArrayType(OT)),
        F.array(keys: _*), F.array(vals: _*)))

    case Ast.ListLit(elems) =>
      val vals = elems.map(v => lower(v, env).getOrElse(return None))
      Some(op("listOf", Seq(ArrayType(OT)), F.array(vals: _*)))

    // operators dispatch to the interpreter's own implementations
    // (Eval.binaryBridge / logicalBridge) over V operands
    case Ast.Binary(bop, l, r) if bop == "&&" || bop == "||" =>
      for (lc <- lower(l, env); rc <- lower(r, env)) yield
        op("logical", Seq(OT, OT, BooleanType), lc, rc, F.lit(bop == "&&"))
    case Ast.Binary(bop, l, r) =>
      for (lc <- lower(l, env); rc <- lower(r, env)) yield
        op("binary", Seq(Str, OT, OT), F.lit(bop), lc, rc)
    case Ast.Unary("!", x) =>
      lower(x, env).map(c => op("not", Seq(OT), c))
    case Ast.Unary("-", x) =>
      lower(x, env).map(c => op("neg", Seq(OT), c))
    // Eager ternary: both branches are in-band-error values, and the
    // lowered subset is side-effect-free, so strictness is unobservable.
    case Ast.Ternary(c, t, f) =>
      for (cc <- lower(c, env); tc <- lower(t, env); fc <- lower(f, env))
        yield op("ternary", Seq(OT, OT, OT), cc, tc, fc)

    // NonStrict error handlers (lib/try.go): operate on the in-band value
    case Ast.Call("try", Vector(x)) =>
      lower(x, env).map(c => op("tryOp", Seq(OT), c))
    case Ast.Call("try", Vector(x, Ast.StringLit(label))) =>
      lower(x, env).map(c => op("tryLabeled", Seq(OT, Str), c, F.lit(label)))
    case Ast.Call("is_error", Vector(x)) =>
      lower(x, env).map(c => op("isError", Seq(OT), c))

    // now() is the engine's batch-constant timestamp (fixed nowMicros)
    case Ast.Call("now", Vector()) => nowMicros.map(us => litV(VTimestamp(us)))

    // env-free global functions through the interpreter's own dispatch
    case Ast.Call(fn, args) if Functions.pureGlobals(fn) =>
      val lowered = args.map(a => lower(a, env).getOrElse(return None))
      lowered.size match {
        case 1 => Some(op("call1", Seq(Str, OT), F.lit(fn), lowered(0)))
        case 2 => Some(op("call2", Seq(Str, OT, OT), F.lit(fn), lowered(0), lowered(1)))
        case 3 => Some(op("call3", Seq(Str, OT, OT, OT), F.lit(fn),
          lowered(0), lowered(1), lowered(2)))
        case _ => None
      }

    // `as` macro: plan-time binding. asSeq restores the interpreter's
    // strict target-first evaluation: a target error propagates even when
    // the body never references the binding (e.g. `state.nope.as(s, 1)`).
    case Ast.Comprehension("as", target, v, None, body) =>
      for (tc <- lower(target, env); bc <- lower(body, env + (v -> tc)))
        yield op("asSeq", Seq(OT, OT), tc, bc)

    // map/filter/all/exists/exists_one: ONE kernel call running the
    // closure-compiled fold ([[Compile]]) over the captured free-variable
    // values. Compilation doubles as the lowerability probe — the
    // compilable subset IS the lowerable subset, so compile failure
    // falls back to the interpreter tier exactly as before. The compiled
    // graph ships as one plan-constant literal; per element the fold is
    // a slot store + wired closure calls, no AST dispatch, no Env copies
    // (the previous spec shipped the AST and ran Eval.comprehension per
    // row: 1.49 s on the 6-comprehension q77 shape at sf0.1).
    case comp @ Ast.Comprehension(_, _, _, _, _) =>
      val free = freeVars(comp, Set.empty).filter(env.contains).toVector.sorted
      Compile.comprehension(comp, free, regexps, nowMicros).map { compiled =>
        op("comprehend", Seq(OT, ArrayType(OT)),
          shim(Literal.fromObject(compiled, OT)),
          F.array(free.map(env(_)): _*))
      }

    case Ast.Method(t, fn, args) => lowerMethod(t, fn, args, env)
    case Ast.Call(fn, args) if args.nonEmpty =>
      // global form of the method overloads (collate(x, p), etc.)
      lowerMethod(args.head, fn, args.tail, env)

    case _ => None
  }

  private def lowerMethod(t: Ast, fn: String, args: Vector[Ast],
      env: Map[String, Column])
      (implicit regexps: Map[String, String],
        nowMicros: Option[Long]): Option[Column] = {
    lazy val target = lower(t, env)
    (fn, args) match {
      // optional.of(x) / optional.none()
      case ("of", Vector(x)) if t == Ast.Ident("optional") =>
        lower(x, env).map(c => op("optOf", Seq(OT), c))
      case ("none", Vector()) if t == Ast.Ident("optional") =>
        Some(op("optNone", Seq()))
      case ("ofNonZeroValue", Vector(x)) if t == Ast.Ident("optional") =>
        lower(x, env).map(c => op("optOfNonZero", Seq(OT), c))
      // optional-value accessors (VOpt flows as a plain V object)
      case ("orValue", Vector(d)) =>
        for (c <- target; dc <- lower(d, env))
          yield op("orValue", Seq(OT, OT), c, dc)
      case ("or", Vector(d)) =>
        for (c <- target; dc <- lower(d, env))
          yield op("orOpt", Seq(OT, OT), c, dc)
      case ("value", Vector()) => target.map(c => op("optValue", Seq(OT), c))
      case ("hasValue", Vector()) => target.map(c => op("hasValue", Seq(OT), c))

      // named-pattern regexps: registry resolved at plan time
      case (f, Ast.StringLit(name) +: rest) if f.startsWith("re_") =>
        regexps.get(name) match {
          case None => None
          case Some(pat) => rest match {
            case Vector() => target.map(c =>
              op("regexp0", Seq(Str, Str, OT), F.lit(f), F.lit(pat), c))
            case Vector(a) =>
              for (c <- target; ac <- lower(a, env)) yield
                op("regexp1", Seq(Str, Str, OT, OT), F.lit(f), F.lit(pat), c, ac)
            case _ => None
          }
        }

      // hintless XML decode is env-free (the named-XSD overload isn't)
      case ("decode_xml", Vector()) => target.map(c => op("decodeXml", Seq(OT), c))

      // everything else in the whitelist goes through the interpreter's
      // own method dispatch (VOps.methodN -> Functions.method2)
      case (f, as) if loweredMethods.contains(f) =>
        val lowered = as.map(a => lower(a, env).getOrElse(return None))
        (target, lowered.size) match {
          case (Some(c), 0) => Some(op("method0", Seq(Str, OT), F.lit(f), c))
          case (Some(c), 1) =>
            Some(op("method1", Seq(Str, OT, OT), F.lit(f), c, lowered(0)))
          case (Some(c), 2) =>
            Some(op("method2", Seq(Str, OT, OT, OT), F.lit(f), c,
              lowered(0), lowered(1)))
          case (Some(c), 3) =>
            Some(op("method3", Seq(Str, OT, OT, OT, OT), F.lit(f), c,
              lowered(0), lowered(1), lowered(2)))
          case _ => None
        }
      case _ => None
    }
  }
}
