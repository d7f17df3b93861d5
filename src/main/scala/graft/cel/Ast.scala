package graft.cel

/** AST for the CEL subset the reference engine evaluates (cel-go core +
  * mito's extension libraries — SURVEY.md §2.1). Parsed by [[Parser]],
  * evaluated by [[Eval]]. All nodes are serializable so a compiled
  * program can ship inside a Catalyst expression to executors.
  */
sealed trait Ast extends Serializable {
  /** Source offset of this node (-1 = unstamped) — the analog of cel-go
    * node ids for DecoratedError-style span rendering. A mutable stamp
    * (not a constructor field) so the 40+ construction/match sites stay
    * untouched. */
  var pos: Int = -1
}

object Ast {
  // literals
  final case class IntLit(v: Long) extends Ast
  final case class UintLit(v: Long) extends Ast
  final case class DoubleLit(v: Double) extends Ast
  final case class StringLit(v: String) extends Ast
  final case class BytesLit(v: Array[Byte]) extends Ast
  final case class BoolLit(v: Boolean) extends Ast
  case object NullLit extends Ast

  final case class ListLit(elems: Vector[Ast]) extends Ast
  final case class MapLit(entries: Vector[(Ast, Ast)]) extends Ast

  final case class Ident(name: String) extends Ast
  final case class Select(target: Ast, field: String) extends Ast
  /** optional-typed field select `e.?f` (mito enables CEL optional types,
    * mito.go:83; exercised by testdata/optional_types.txt) */
  final case class SelectOpt(target: Ast, field: String) extends Ast
  final case class Index(target: Ast, index: Ast) extends Ast
  /** optional-typed index `e[?k]` (cel-go OptionalTypes `_[?_]`) */
  final case class IndexOpt(target: Ast, index: Ast) extends Ast

  /** global call f(args) */
  final case class Call(fn: String, args: Vector[Ast]) extends Ast
  /** method call target.f(args) */
  final case class Method(target: Ast, fn: String, args: Vector[Ast]) extends Ast

  final case class Unary(op: String, e: Ast) extends Ast
  final case class Binary(op: String, l: Ast, r: Ast) extends Ast
  final case class Ternary(cond: Ast, t: Ast, f: Ast) extends Ast

  /** comprehension macros: target.map(x, [pred,] expr), filter, all,
    * exists, exists_one, and mito's `as` let-binding */
  final case class Comprehension(kind: String, target: Ast, varName: String,
      pred: Option[Ast], expr: Ast) extends Ast
  /** has(e.f) */
  final case class Has(target: Ast, field: String) extends Ast
}
