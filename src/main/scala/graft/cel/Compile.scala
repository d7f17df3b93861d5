package graft.cel

import org.apache.spark.unsafe.types.UTF8String

/** Closure compiler for lowered comprehensions: compiles a
  * Comprehension node ONCE at plan time into a graph of wired
  * [[Compile.CV]] closures over a flat slot frame, so the fold kernel
  * ([[VOps.comprehend]]) runs pred/body per element with NO per-row AST
  * dispatch, no `Env` copies, and no per-element immutable-map variable
  * binding — the loop variable is one array-slot store.
  *
  * The compilable subset is exactly [[Lowering]]'s lowerable subset
  * (side-effect-free, env-independent): every case here mirrors a
  * `Lowering.lower` / `Lowering.lowerMethod` case and dispatches to the
  * SAME implementations the interpreter uses (Eval.binaryBridge,
  * Functions.call2, Functions.strictMethodBridge, VOps' V-level cores),
  * so parity with both tiers holds by construction. Compile failure
  * (None) makes the comprehension — and with it the program — fall back
  * to the interpreter tier, exactly as the old lowerability probe did.
  *
  * Error values stay in-band ([[Eval.VErr]]); source positions are not
  * stamped here because the lowered tier renders errors by message only
  * (positions are a CLI DecoratedError concern — the interpreter tier).
  */
private[cel] object Compile {
  import Eval._

  /** Compiled expression: evaluate over a mutable slot frame. A SAM
    * trait extending Serializable so closure graphs ride inside plan
    * Literals into task binaries. */
  trait CV extends Serializable { def apply(frame: Array[V]): V }

  /** A compiled comprehension: the kernel allocates `frameSize` slots
    * per row, fills slots 0..nFree-1 with the captured free-variable
    * values (in [[Lowering]]'s sorted free-name order), and runs. */
  final case class Compiled(frameSize: Int, run: CV) extends Serializable

  /** Slot allocator + plan-time env, threaded through compilation. */
  private final class Ctx(val regexps: Map[String, String],
      val nowMicros: Option[Long], var nextSlot: Int) {
    def alloc(): Int = { val s = nextSlot; nextSlot += 1; s }
  }

  /** Compile a comprehension whose free variables (sorted) arrive as
    * frame slots 0..free.length-1. None when any subexpression falls
    * outside the lowerable subset. */
  def comprehension(comp: Ast.Comprehension, free: Vector[String],
      regexps: Map[String, String],
      nowMicros: Option[Long]): Option[Compiled] = {
    val ctx = new Ctx(regexps, nowMicros, free.length)
    compile(comp, free.zipWithIndex.toMap)(ctx)
      .map(cv => Compiled(ctx.nextSlot, cv))
  }

  /** Same plan-time partial evaluation as Lowering.lower: a subtree
    * that compiled (⟹ pure) and references no identifiers at all — no
    * loop variable, no captured free var (const idents like `int` are
    * captured slots here, so "closed" is simply zero free vars) —
    * evaluates once now; the closure returns the cached V. */
  private def compile(e: Ast, slots: Map[String, Int])
      (implicit ctx: Ctx): Option[CV] = {
    val r = compileCore(e, slots)
    if (r.isEmpty || !Lowering.worthFolding(e) ||
        Lowering.freeVars(e, Set.empty).nonEmpty) return r
    try {
      val v = Eval.eval(e, Env(Map.empty, ctx.nowMicros.getOrElse(0L), ctx.regexps))
      const(v)
    } catch { case _: Exception => r }
  }

  private def compileCore(e: Ast, slots: Map[String, Int])
      (implicit ctx: Ctx): Option[CV] = e match {
    case Ast.IntLit(v) => const(VInt(v))
    case Ast.UintLit(v) => const(VUint(v))
    case Ast.DoubleLit(v) => const(VDouble(v))
    case Ast.StringLit(v) => const(VString(v))
    case Ast.BytesLit(v) => const(VBytes(v))
    case Ast.BoolLit(v) => const(VBool(v))
    case Ast.NullLit => const(VNull)

    case Ast.Ident(name) => slots.get(name).map { i => f => f(i) }

    case Ast.Select(t, fd) =>
      compile(t, slots).map(tc => f => VOps.selectV(tc(f), fd))
    case Ast.SelectOpt(t, fd) =>
      compile(t, slots).map(tc => f => VOps.selectOptV(tc(f), fd))
    case Ast.Has(t, fd) =>
      compile(t, slots).map(tc => f => VOps.hasFieldV(tc(f), fd))
    case Ast.Index(t, i) =>
      for (tc <- compile(t, slots); ic <- compile(i, slots))
        yield (f => VOps.index(tc(f), ic(f)).asInstanceOf[V]): CV
    case Ast.IndexOpt(t, i) =>
      for (tc <- compile(t, slots); ic <- compile(i, slots))
        yield (f => Eval.indexOptV(tc(f), ic(f))): CV

    case Ast.ListLit(elems) =>
      compileAll(elems, slots).map(listClosure)

    case Ast.MapLit(entries) =>
      for {
        ks <- compileAll(entries.map(_._1), slots)
        vs <- compileAll(entries.map(_._2), slots)
      } yield mapClosure(ks, vs)

    // operators: same bridges as the Column-tree kernels (VOps)
    case Ast.Binary(bop, l, r) if bop == "&&" || bop == "||" =>
      val and = bop == "&&"
      for (lc <- compile(l, slots); rc <- compile(r, slots))
        yield (f => Eval.logicalLazyBridge(lc(f), () => rc(f), and)): CV
    case Ast.Binary(bop, l, r) =>
      for (lc <- compile(l, slots); rc <- compile(r, slots))
        yield binOp(bop, lc, rc)
    case Ast.Unary("!", x) =>
      compile(x, slots).map(xc => f => xc(f) match {
        case err: VErr => err
        case VBool(b) => VBool(!b)
        case other => VErr(s"no such overload: !$other")
      })
    case Ast.Unary("-", x) =>
      compile(x, slots).map(xc => f => xc(f) match {
        case err: VErr => err
        case VInt(i) => VInt(-i)
        case VDouble(d) => VDouble(-d)
        case other => VErr(s"no such overload: -$other")
      })
    case Ast.Ternary(c, t, fl) =>
      for (cc <- compile(c, slots); tc <- compile(t, slots);
           fc <- compile(fl, slots))
        yield (f => cc(f) match {
          case err: VErr => err
          case VBool(true) => tc(f)
          case VBool(false) => fc(f)
          case other => VErr(s"no such overload: $other ? _ : _")
        }): CV

    // NonStrict error handlers (lib/try.go)
    case Ast.Call("try", Vector(x)) =>
      compile(x, slots).map(xc => f => xc(f) match {
        case VErr(m) => VString(m)
        case ok => ok
      })
    case Ast.Call("try", Vector(x, Ast.StringLit(label))) =>
      compile(x, slots).map(xc => f => xc(f) match {
        case VErr(m) =>
          VMap(scala.collection.immutable.VectorMap(label -> (VString(m): V)))
        case ok => ok
      })
    case Ast.Call("is_error", Vector(x)) =>
      compile(x, slots).map(xc => f => VBool(xc(f).isInstanceOf[VErr]))

    // now() is the batch-constant timestamp, like the Column tier
    case Ast.Call("now", Vector()) =>
      ctx.nowMicros.map(us => { val v = VTimestamp(us); (_ => v): CV })

    case Ast.Call(fn, args) if Functions.pureGlobals(fn) =>
      compileAll(args, slots).map(cs => f => {
        val vs = Vector.newBuilder[V]
        var i = 0
        var err: VErr = null
        while (i < cs.length) {
          cs(i)(f) match {
            case e: VErr => if (err == null) err = e; i = cs.length
            case x => vs += x; i += 1
          }
        }
        if (err != null) err else Eval.guard(Functions.call2(fn, vs.result()))
      })

    // `as` let-binding: strict target-first, body over the new slot
    case Ast.Comprehension("as", target, v, None, body) =>
      val tcOpt = compile(target, slots)
      tcOpt.flatMap { tc =>
        val slot = ctx.alloc()
        compile(body, slots + (v -> slot)).map(bc => (f => tc(f) match {
          case err: VErr => err
          case t => f(slot) = t; bc(f)
        }): CV)
      }

    // map/filter/all/exists/exists_one: the wired fold itself
    case Ast.Comprehension(kind, target, x, pred, body) =>
      val tcOpt = compile(target, slots)
      tcOpt.flatMap { tc =>
        val slot = ctx.alloc()
        val inner = slots + (x -> slot)
        val pcOpt: Option[Option[CV]] = pred match {
          case None => Some(None)
          case Some(p) => compile(p, inner).map(Some(_))
        }
        for (pc <- pcOpt; bc <- compile(body, inner))
          yield fold(kind, tc, slot, pc, bc)
      }

    case Ast.Method(t, fn, args) => compileMethod(t, fn, args, slots)
    case Ast.Call(fn, args) if args.nonEmpty =>
      // global form of the method overloads (collate(x, p), etc.)
      compileMethod(args.head, fn, args.tail, slots)

    case _ => None
  }

  private def const(v: V): Option[CV] = Some(_ => v)

  /** Binary op resolved at compile time (no per-call string dispatch),
    * with same-type int fast paths for the comprehension-predicate hot
    * ops; everything else — including all error propagation — delegates
    * to the interpreter's own dispatch ([[Eval.binaryBridge]]). */
  private def binOp(op: String, lc: CV, rc: CV): CV = op match {
    case "+" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) => VInt(a + b)
      case (a, b) => Eval.binaryBridge("+", a, b)
    }
    case "-" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) => VInt(a - b)
      case (a, b) => Eval.binaryBridge("-", a, b)
    }
    case "*" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) => VInt(a * b)
      case (a, b) => Eval.binaryBridge("*", a, b)
    }
    case "%" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) =>
        if (b == 0) VErr("modulus by zero") else VInt(a % b)
      case (a, b) => Eval.binaryBridge("%", a, b)
    }
    case "==" => f => (lc(f), rc(f)) match {
      case (e: VErr, _) => e
      case (_, e: VErr) => e
      case (a, b) => VBool(Eval.equalsV(a, b))
    }
    case "!=" => f => (lc(f), rc(f)) match {
      case (e: VErr, _) => e
      case (_, e: VErr) => e
      case (a, b) => VBool(!Eval.equalsV(a, b))
    }
    case "<" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) => VBool(a < b)
      case (a, b) => Eval.binaryBridge("<", a, b)
    }
    case "<=" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) => VBool(a <= b)
      case (a, b) => Eval.binaryBridge("<=", a, b)
    }
    case ">" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) => VBool(a > b)
      case (a, b) => Eval.binaryBridge(">", a, b)
    }
    case ">=" => f => (lc(f), rc(f)) match {
      case (VInt(a), VInt(b)) => VBool(a >= b)
      case (a, b) => Eval.binaryBridge(">=", a, b)
    }
    case other => f => Eval.binaryBridge(other, lc(f), rc(f))
  }

  private def compileAll(es: Vector[Ast], slots: Map[String, Int])
      (implicit ctx: Ctx): Option[Vector[CV]] = {
    val b = Vector.newBuilder[CV]
    var i = 0
    while (i < es.length) {
      compile(es(i), slots) match {
        case Some(c) => b += c
        case None => return None
      }
      i += 1
    }
    Some(b.result())
  }

  /** List literal: all elements evaluated, first error wins (the
    * interpreter's ListLit contract). */
  private def listClosure(cs: Vector[CV]): CV = f => {
    val b = Vector.newBuilder[V]
    var i = 0
    var err: VErr = null
    while (i < cs.length && err == null) {
      cs(i)(f) match {
        case e: VErr => err = e
        case x => b += x
      }
      i += 1
    }
    if (err != null) err else VList(b.result())
  }

  /** Map literal: entry-order (k, v) evaluation, first error wins, then
    * the shared key-typing/collision core ([[Eval.mapFromPairs]]). */
  private def mapClosure(ks: Vector[CV], vs: Vector[CV]): CV = f => {
    val pairs = Vector.newBuilder[(V, V)]
    var i = 0
    var err: VErr = null
    while (i < ks.length && err == null) {
      (ks(i)(f), vs(i)(f)) match {
        case (e: VErr, _) => err = e
        case (_, e: VErr) => err = e
        case (kv, vv) => pairs += ((kv, vv))
      }
      i += 1
    }
    if (err != null) err else Eval.mapFromPairs(pairs.result())
  }

  /** The fold: mirrors [[Eval.comprehension]] exactly (items from a
    * list, or a map's canonical-order typed keys; per-kind error and
    * non-bool-predicate semantics), with the loop variable as one slot
    * store per element. */
  private def fold(kind: String, tc: CV, slot: Int,
      pred: Option[CV], body: CV): CV = {
    // kind resolved at compile time: one specialized closure per macro
    def items(f: Array[V]): Either[V, Vector[V]] = tc(f) match {
      case err: VErr => Left(err)
      case VList(xs) => Right(xs)
      case vm: VMap => Right(Eval.typedKeys(vm).map(_._2))
      case other => Left(VErr(s"no such overload: $kind over $other"))
    }
    kind match {
      case "map" => f => items(f) match {
        case Left(v) => v
        case Right(xs) =>
          val out = Vector.newBuilder[V]
          var i = 0
          var err: V = null
          while (i < xs.length && err == null) {
            f(slot) = xs(i)
            val keep = pred match {
              case None => true
              case Some(p) => p(f) match {
                case VBool(b) => b
                case e: VErr => err = e; false
                case other =>
                  err = VErr(s"no such overload: predicate $other"); false
              }
            }
            if (err == null && keep) body(f) match {
              case e: VErr => err = e
              case v => out += v
            }
            i += 1
          }
          if (err != null) err else VList(out.result())
      }
      case "filter" => f => items(f) match {
        case Left(v) => v
        case Right(xs) =>
          val out = Vector.newBuilder[V]
          var i = 0
          var err: V = null
          while (i < xs.length && err == null) {
            f(slot) = xs(i)
            body(f) match {
              case VBool(true) => out += xs(i)
              case VBool(false) =>
              case e: VErr => err = e
              case other => err = VErr(s"no such overload: predicate $other")
            }
            i += 1
          }
          if (err != null) err else VList(out.result())
      }
      case "all" => f => items(f) match {
        case Left(v) => v
        case Right(xs) =>
          var i = 0
          var res: V = VBool(true)
          while (i < xs.length && res == VBool(true)) {
            f(slot) = xs(i)
            body(f) match {
              case VBool(true) =>
              case VBool(false) => res = VBool(false)
              case e: VErr => res = e
              case other => res = VErr(s"no such overload: predicate $other")
            }
            i += 1
          }
          res
      }
      case "exists" => f => items(f) match {
        case Left(v) => v
        case Right(xs) =>
          var i = 0
          var res: V = VBool(false)
          while (i < xs.length && res == VBool(false)) {
            f(slot) = xs(i)
            body(f) match {
              case VBool(true) => res = VBool(true)
              case VBool(false) =>
              case e: VErr => res = e
              case other => res = VErr(s"no such overload: predicate $other")
            }
            i += 1
          }
          res
      }
      case "exists_one" => f => items(f) match {
        case Left(v) => v
        case Right(xs) =>
          var i = 0
          var n = 0
          var err: V = null
          while (i < xs.length && err == null) {
            f(slot) = xs(i)
            body(f) match {
              case VBool(true) => n += 1
              case VBool(false) =>
              case e: VErr => err = e
              case other => err = VErr(s"no such overload: predicate $other")
            }
            i += 1
          }
          if (err != null) err else VBool(n == 1)
      }
      case other => _ => VErr(s"unknown macro $other")
    }
  }

  private def compileMethod(t: Ast, fn: String, args: Vector[Ast],
      slots: Map[String, Int])(implicit ctx: Ctx): Option[CV] = {
    lazy val target = compile(t, slots)
    (fn, args) match {
      case ("of", Vector(x)) if t == Ast.Ident("optional") =>
        compile(x, slots).map(xc => f => xc(f) match {
          case e: VErr => e
          case ok => VOpt(Some(ok))
        })
      case ("none", Vector()) if t == Ast.Ident("optional") =>
        const(VOpt(None))
      case ("ofNonZeroValue", Vector(x)) if t == Ast.Ident("optional") =>
        compile(x, slots).map(xc => f => xc(f) match {
          case e: VErr => e
          case ok => VOpt(if (Eval.isZeroV(ok)) None else Some(ok))
        })
      case ("orValue", Vector(d)) =>
        for (tc <- target; dc <- compile(d, slots))
          yield (f => VOps.orValue(tc(f), dc(f)).asInstanceOf[V]): CV
      case ("or", Vector(d)) =>
        for (tc <- target; dc <- compile(d, slots))
          yield (f => Eval.orOptV(tc(f), dc(f))): CV
      case ("value", Vector()) =>
        target.map(tc => f => VOps.optValue(tc(f)).asInstanceOf[V])
      case ("hasValue", Vector()) =>
        target.map(tc => f => VOps.hasValue(tc(f)).asInstanceOf[V])

      // named-pattern regexps: registry resolved at compile time
      case (f0, Ast.StringLit(nm) +: rest) if f0.startsWith("re_") =>
        ctx.regexps.get(nm) match {
          case None => None
          case Some(pat) => rest match {
            case Vector() => target.map(tc => f => tc(f) match {
              case e: VErr => e
              case x => Functions.regexpBridge(f0, pat, x, Vector.empty)
            })
            case Vector(a) =>
              for (tc <- target; ac <- compile(a, slots))
                yield (f => (tc(f), ac(f)) match {
                  case (e: VErr, _) => e
                  case (_, e: VErr) => e
                  case (x, y) => Functions.regexpBridge(f0, pat, x, Vector(y))
                }): CV
            case _ => None
          }
        }

      // hintless XML decode (env-free, like the Column-tier kernel)
      case ("decode_xml", Vector()) =>
        target.map(tc => f => VOps.decodeXml(tc(f)).asInstanceOf[V])

      case (f0, as) if Lowering.loweredMethods.contains(f0) =>
        for (tc <- target; cs <- compileAll(as, slots))
          yield (f => tc(f) match {
            case e: VErr => e
            case x =>
              val vs = Vector.newBuilder[V]
              var i = 0
              var err: VErr = null
              while (i < cs.length && err == null) {
                cs(i)(f) match {
                  case e: VErr => err = e
                  case v => vs += v
                }
                i += 1
              }
              if (err != null) err
              else Functions.strictMethodBridge(f0, x, vs.result())
          }): CV
      case _ => None
    }
  }
}
