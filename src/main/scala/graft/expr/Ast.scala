package graft.expr

/** AST of the Moloch search-expression language
  * (grammar: /root/reference/viewer/molochparser.jison:44-83).
  */
sealed trait Ast
object Ast {
  final case class And(l: Ast, r: Ast) extends Ast
  final case class Or(l: Ast, r: Ast) extends Ast
  final case class Not(e: Ast) extends Ast
  /** `field op value`; op ∈ eq ne lt lte gt gte. */
  final case class Cmp(field: String, op: CmpOp, value: Value) extends Ast
  /** `field == EXISTS!` / `field != EXISTS!`. */
  final case class Exists(field: String, negated: Boolean) extends Ast
}

sealed trait CmpOp
object CmpOp {
  case object Eq extends CmpOp
  case object Ne extends CmpOp
  case object Lt extends CmpOp
  case object Lte extends CmpOp
  case object Gt extends CmpOp
  case object Gte extends CmpOp
}

sealed trait Value
object Value {
  /** Bare token — wildcards (`*`) significant, numbers significant. */
  final case class Bare(s: String) extends Value
  /** `"quoted"` — always literal. */
  final case class Quoted(s: String) extends Value
  /** `/regex/` — anchored full-match (ES regexp semantics). */
  final case class Regex(re: String) extends Value
  /** `[a, b, /c/, d*]` — OR of member matches. */
  final case class Lst(items: Seq[Value]) extends Value
}
