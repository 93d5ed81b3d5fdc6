package graft.expr

/** Hand-rolled lexer + recursive-descent parser for the Moloch expression
  * language (token rules: viewer/molochparser.jison:1-29; precedence:
  * `!` binds tightest, then comparison, `&&` over `||`).
  *
  * Token shapes:
  *   STR        `[-+a-zA-Z0-9_.@:*?/$]+`
  *   QUOTEDSTR  `"..."` with backslash escapes
  *   REGEXSTR   `/.../` with backslash escapes
  *   LIST       `[...]` raw text, comma-split (escaped commas kept)
  *   operators  `== = != <= < >= > && & || | ! ( )` and `EXISTS!`
  */
object Parser {

  // user-input errors are one catchable family: the compiler's own
  // rejections (unknown field, view recursion, bad operand) raise
  // IllegalArgumentException, so syntax errors do too
  final case class ParseError(msg: String, pos: Int)
      extends IllegalArgumentException(s"$msg at position $pos")

  private sealed trait Tok { def pos: Int }
  private case class TStr(s: String, pos: Int) extends Tok
  private case class TQuoted(s: String, pos: Int) extends Tok
  private case class TRegex(s: String, pos: Int) extends Tok
  private case class TList(raw: String, pos: Int) extends Tok
  private case class TOp(op: String, pos: Int) extends Tok // == != <= < >= >
  private case class TAnd(pos: Int) extends Tok
  private case class TOr(pos: Int) extends Tok
  private case class TNot(pos: Int) extends Tok
  private case class TLParen(pos: Int) extends Tok
  private case class TRParen(pos: Int) extends Tok
  private case class TExists(pos: Int) extends Tok
  private case class TEof(pos: Int) extends Tok

  private val strChar: Char => Boolean = c =>
    c.isLetterOrDigit || "-+_.@:*?/$".contains(c)

  private def lex(in: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = in.length
    while (i < n) {
      val c = in(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') {
        val sb = new StringBuilder
        var j = i + 1
        while (j < n && in(j) != '"') {
          if (in(j) == '\\' && j + 1 < n) { sb.append(in(j + 1)); j += 2 }
          else { sb.append(in(j)); j += 1 }
        }
        if (j >= n) throw ParseError("unterminated quote", i)
        out += TQuoted(sb.toString, i); i = j + 1
      } else if (c == '[') {
        val sb = new StringBuilder
        var j = i + 1
        while (j < n && in(j) != ']') {
          if (in(j) == '\\' && j + 1 < n) { sb.append(in(j)).append(in(j + 1)); j += 2 }
          else { sb.append(in(j)); j += 1 }
        }
        if (j >= n) throw ParseError("unterminated list", i)
        out += TList(sb.toString, i); i = j + 1
      } else if (c == '&') {
        out += TAnd(i); i += (if (i + 1 < n && in(i + 1) == '&') 2 else 1)
      } else if (c == '|') {
        out += TOr(i); i += (if (i + 1 < n && in(i + 1) == '|') 2 else 1)
      } else if (c == '(') { out += TLParen(i); i += 1 }
      else if (c == ')') { out += TRParen(i); i += 1 }
      else if (c == '<' || c == '>') {
        if (i + 1 < n && in(i + 1) == '=') { out += TOp(s"$c=", i); i += 2 }
        else { out += TOp(c.toString, i); i += 1 }
      } else if (c == '=') {
        out += TOp("==", i); i += (if (i + 1 < n && in(i + 1) == '=') 2 else 1)
      } else if (c == '!') {
        if (i + 1 < n && in(i + 1) == '=') { out += TOp("!=", i); i += 2 }
        else { out += TNot(i); i += 1 }
      } else if (c == '/' && isRegexStart(in, i, out.result())) {
        // Regex only in value position: /.../ with escapes.
        val sb = new StringBuilder
        var j = i + 1
        var done = false
        while (j < n && !done) {
          if (in(j) == '\\' && j + 1 < n) {
            // keep escape sequences INSIDE the pattern (\d, \., \w …);
            // only the delimiter escape collapses — the jison REGEXSTR
            // strips nothing but the surrounding slashes
            if (in(j + 1) == '/') sb.append('/')
            else { sb.append(in(j)); sb.append(in(j + 1)) }
            j += 2
          }
          else if (in(j) == '/') done = true
          else { sb.append(in(j)); j += 1 }
        }
        if (!done) throw ParseError("unterminated regex", i)
        out += TRegex(sb.toString, i); i = j + 1
      } else if (strChar(c)) {
        val start = i
        while (i < n && strChar(in(i))) i += 1
        val s = in.substring(start, i)
        if (s == "EXISTS!") out += TExists(start) // can't happen: ! not strChar
        else out += TStr(s, start)
      } else throw ParseError(s"unexpected character '$c'", i)
    }
    // Merge STR "EXISTS" followed by "!" → EXISTS! token
    val toks = out.result()
    val merged = Vector.newBuilder[Tok]
    var k = 0
    while (k < toks.length) {
      toks(k) match {
        case TStr("EXISTS", p) if k + 1 < toks.length && toks(k + 1).isInstanceOf[TNot] =>
          merged += TExists(p); k += 2
        case t => merged += t; k += 1
      }
    }
    merged += TEof(in.length)
    merged.result()
  }

  /** A '/' begins a regex iff the previous meaningful token is a comparison
    * operator (value position); otherwise it is part of a STR (e.g. CIDR).
    */
  private def isRegexStart(in: String, i: Int, sofar: Vector[Tok]): Boolean =
    sofar.lastOption.exists(_.isInstanceOf[TOp])

  private def splitList(raw: String): Seq[Value] = {
    // Comma split honoring backslash escapes (jison ListToArray:764-775).
    val parts = Seq.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw(i)
      if (c == '\\' && i + 1 < raw.length) {
        // escaped comma joins the item; any other escape is preserved
        // verbatim so regex items keep their \d/\. sequences
        if (raw(i + 1) == ',') sb.append(',')
        else { sb.append(c); sb.append(raw(i + 1)) }
        i += 2
      }
      else if (c == ',') { parts += sb.toString; sb.clear(); i += 1 }
      else { sb.append(c); i += 1 }
    }
    parts += sb.toString
    parts.result().map(_.trim).filter(_.nonEmpty).map { s =>
      if (s.length >= 2 && s.head == '"' && s.last == '"')
        Value.Quoted(s.substring(1, s.length - 1))
      else if (s.length >= 2 && s.head == '/' && s.last == '/')
        Value.Regex(s.substring(1, s.length - 1))
      else Value.Bare(s)
    }
  }

  private final class P(toks: Vector[Tok]) {
    private var idx = 0
    private def peek: Tok = toks(idx)
    private def next(): Tok = { val t = toks(idx); idx += 1; t }

    def parseExpr(): Ast = {
      val e = parseOr()
      peek match {
        case TEof(_) => e
        case t       => throw ParseError("trailing input", t.pos)
      }
    }

    private def parseOr(): Ast = {
      var l = parseAnd()
      while (peek.isInstanceOf[TOr]) { next(); l = Ast.Or(l, parseAnd()) }
      l
    }

    private def parseAnd(): Ast = {
      var l = parseUnary()
      while (peek.isInstanceOf[TAnd]) { next(); l = Ast.And(l, parseUnary()) }
      l
    }

    private def parseUnary(): Ast = peek match {
      case TNot(_)    => next(); Ast.Not(parseUnary())
      case TLParen(_) =>
        next()
        val e = parseOr()
        peek match {
          case TRParen(_) => next(); e
          case t          => throw ParseError("expected ')'", t.pos)
        }
      case _ => parseCmp()
    }

    private def parseCmp(): Ast = {
      val field = next() match {
        case TStr(s, _) => s
        case t          => throw ParseError("expected field name", t.pos)
      }
      val op = next() match {
        case TOp(o, _) => o
        case t         => throw ParseError("expected operator", t.pos)
      }
      val cmpOp = op match {
        case "==" => CmpOp.Eq
        case "!=" => CmpOp.Ne
        case "<"  => CmpOp.Lt
        case "<=" => CmpOp.Lte
        case ">"  => CmpOp.Gt
        case ">=" => CmpOp.Gte
      }
      next() match {
        case TExists(p) =>
          cmpOp match {
            case CmpOp.Eq => Ast.Exists(field, negated = false)
            case CmpOp.Ne => Ast.Exists(field, negated = true)
            case _        => throw ParseError("EXISTS! requires == or !=", p)
          }
        case TStr(s, _)    => Ast.Cmp(field, cmpOp, Value.Bare(s))
        case TQuoted(s, _) => Ast.Cmp(field, cmpOp, Value.Quoted(s))
        case TRegex(s, _)  => Ast.Cmp(field, cmpOp, Value.Regex(s))
        case TList(raw, _) => Ast.Cmp(field, cmpOp, Value.Lst(splitList(raw)))
        case t             => throw ParseError("expected value", t.pos)
      }
    }
  }

  def parse(expression: String): Ast = new P(lex(expression)).parseExpr()
}
