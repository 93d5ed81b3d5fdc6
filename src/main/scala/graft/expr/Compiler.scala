package graft.expr

import java.time.Instant

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{IpFunctions, IpUtil}
import graft.model.{FieldDef, FieldKind, FieldRegistry, FileEntry}

/** Compile a Moloch search expression to a Spark `Column` predicate.
  *
  * Semantics mirror the reference's ES query formatting
  * (viewer/molochparser.jison:449-583 formatQuery):
  *   - `!=` / `!` are ES `must_not`: a row with a NULL field *matches* the
  *     negation (SQL `cond IS NOT TRUE`), unlike bare SQL `<>`;
  *   - bare values containing `*` are wildcards (`?` also wildcards inside
  *     a wildcard value); quoted values are always literal;
  *   - `/re/` is an anchored full match (ES regexp);
  *   - lists are an OR of member matches (terms ∪ wildcards ∪ regexes);
  *   - `lo`/`up` term kinds case-fold the operand (columns are normalized
  *     at ingest, as in the reference);
  *   - integer values support the `10-20` range shorthand;
  *   - ip values support CIDR, `10.10` prefix shorthand and `:port` pairing;
  *   - date/seconds values support `-5d`, `@h`, absolute formats (the
  *     comparison instant `now` is injected for determinism);
  *   - meta-fields (e.g. `ip`, `port`) fan out to an OR over member fields.
  *
  * Multivalued (array) columns get membership semantics: `f == v` means
  * "some element matches", as ES term queries do on arrays.
  */
final class Compiler(
    registry: FieldRegistry,
    col: String => Column = org.apache.spark.sql.functions.col,
    now: Instant = Instant.now(),
    shortcuts: Map[String, Seq[String]] = Map.empty,
    views: Map[String, String] = Map.empty,
    maxDepth: Int = 10,
    files: Seq[FileEntry] = Nil,
    // per-user rights (viewer: req.user flattened into parser yy state;
    // molochparser.jison:308-310/351-353). None = unrestricted (internal
    // callers); Some(rights) enforces each field's requiredRight: a
    // direct query on an unpermitted field throws "<field> - permission
    // denied", while meta-field fan-out skips unpermitted members
    // silently (jison:318-321).
    rights: Option[Set[String]] = None) {

  import Ast._
  import CmpOp._

  /** A `[...]` list (or an expanded shortcut) must carry at least one
    * item: an empty one would otherwise escape as
    * UnsupportedOperationException from `reduce` — outside the
    * IllegalArgumentException family HTTP callers map to 400.
    */
  private def items1(items: Seq[Value]): Seq[Value] = {
    if (items.isEmpty)
      throw new IllegalArgumentException("empty list value")
    items
  }

  /** [[FieldRegistry.expand]] with the requiredRight gate applied. */
  private def expandChecked(field: String): Seq[graft.model.FieldDef] = {
    val defs = registry.expand(field)
    rights match {
      case None => defs
      case Some(rs) =>
        if (registry.isMeta(field)) {
          val allowed = defs.filter(_.requiredRight.forall(rs.contains))
          if (allowed.isEmpty)
            throw new IllegalArgumentException(s"$field - permission denied")
          allowed
        } else {
          defs.foreach(d => if (!d.requiredRight.forall(rs.contains))
            throw new IllegalArgumentException(s"$field - permission denied"))
          defs
        }
    }
  }

  def compile(expression: String): Column = compileAt(expression, 0)

  private def compileAt(expression: String, depth: Int): Column = {
    if (depth > maxDepth)
      throw new IllegalArgumentException("view recursion too deep")
    toCol(Parser.parse(expression), depth)
  }

  /** Mandatory-filter injection: AND a forced expression (column ACL /
    * admin-forced predicate) into a user query — reference
    * viewer/viewerUtils.js:239-249 (Q19).
    */
  def compileWithForced(expression: String, forced: Option[String]): Column =
    forced match {
      case Some(f) => compile(f) && compile(expression)
      case None    => compile(expression)
    }

  /** `$name` shortcut values → stored lookup lists (Q14, reference
    * viewer/molochparser.jison:377-447).
    */
  private def expandShortcut(v: Value): Value = v match {
    case Value.Bare(s) if s.startsWith("$") =>
      val items = shortcuts.getOrElse(s.substring(1),
        throw new IllegalArgumentException(s"unknown shortcut $s"))
      Value.Lst(items.map(Value.Bare))
    case Value.Lst(items) => Value.Lst(items.map(expandShortcut))
    case other => other
  }

  /** ES must_not semantics: a row matches the negation when the inner
    * predicate is false OR NULL (missing field). Implemented by pushing
    * the negation down to comparison leaves (De Morgan over "is-not-true")
    * so each leaf compiles to `!pred || col IS NULL` — all parquet-
    * pushable filters, unlike a `NOT coalesce(pred, false)` wrapper which
    * disables pushdown entirely. Equivalent because every leaf predicate
    * is null-intolerant (null input ⇒ null result).
    */
  private def toCol(ast: Ast, depth: Int): Column = ast match {
    case And(l, r) => toCol(l, depth) && toCol(r, depth)
    case Or(l, r)  => toCol(l, depth) || toCol(r, depth)
    case Not(e)    => neg(e, depth)
    case Exists(field, negated) =>
      val c = expandChecked(field).map(existsCol).reduce(_ || _)
      if (negated) !c else c // existsCol is never NULL
    case Cmp("view", op, value) =>
      val ast1 = viewAst(value, depth)
      if (op == Ne) neg(ast1, depth + 1) else toCol(ast1, depth + 1)
    case Cmp("file", Eq, value) if files.nonEmpty => fileAnd(value)
    case Cmp("file", Ne, value) if files.nonEmpty =>
      !coalesce(fileAnd(value), lit(false))
    case Cmp(field, Ne, value) =>
      neg(Cmp(field, Eq, value), depth)
    case Cmp(field, op, value0) =>
      val value = expandShortcut(value0)
      val defs = expandPortAware(field, value)
      defs.map(d => cmpCol(d, op, value)).reduce(_ || _)
  }

  /** Meta fan-out with a `:port`-bearing ip operand keeps only the
    * portField carriers (molochparser.js:311-330 getIpInfoList needPort —
    * `ip == a.b.c.d:80` never consults dns/xff ips, which have no paired
    * port to test).
    */
  private def expandPortAware(field: String, value: Value): Seq[FieldDef] = {
    val defs = expandChecked(field)
    if (registry.isMeta(field) && defs.exists(_.kind == FieldKind.IpK) &&
      ipValueHasPort(value))
      defs.filter(_.portField.isDefined)
    else defs
  }

  /** Compile "ast is NOT true" (false-or-null matches). */
  private def neg(ast: Ast, depth: Int): Column = ast match {
    case And(l, r) => neg(l, depth) || neg(r, depth)
    case Or(l, r)  => neg(l, depth) && neg(r, depth)
    // not-true(not-true(e)) = is-true(e); in a filter context NULL already
    // behaves as false, so plain compilation is equivalent.
    case Not(e)    => toCol(e, depth)
    case Exists(field, negated) =>
      val c = expandChecked(field).map(existsCol).reduce(_ || _)
      if (negated) c else !c
    case Cmp("view", op, value) =>
      val ast1 = viewAst(value, depth)
      if (op == Ne) toCol(ast1, depth + 1) else neg(ast1, depth + 1)
    case Cmp("file", Eq, value) if files.nonEmpty =>
      !coalesce(fileAnd(value), lit(false))
    case Cmp("file", Ne, value) if files.nonEmpty => fileAnd(value)
    case Cmp(field, Ne, value) => toCol(Cmp(field, Eq, value), depth)
    case Cmp(field, op, value0) =>
      val value = expandShortcut(value0)
      // must_not(OR over fanned-out fields) = AND of per-field negations
      val porty = ipValueHasPort(value)
      expandPortAware(field, value)
        .map { d =>
          if (d.kind == FieldKind.IpK && porty)
            // a `:port` / `ip:port` form (jison parseIpPort:150-293)
            // references the PORT column, which the ip-column null-guard
            // below doesn't cover: ES must_not is is-not-true of the
            // inner bool, so a row with a NULL ip but a matching port is
            // still EXCLUDED — the generic guard would include it
            !coalesce(cmpCol(d, op, value), lit(false))
          else !cmpCol(d, op, value) || fieldCol(d).isNull
        }
        .reduce(_ && _)
  }

  /** Does an (expanded) ip operand carry a `:port` conjunct or port-only
    * form anywhere? Decides the null-guard shape in [[neg]].
    */
  private def ipValueHasPort(v: Value): Boolean = v match {
    case Value.Bare(s)   => splitIpPort(s.trim)._2.isDefined
    case Value.Quoted(s) => splitIpPort(s.trim)._2.isDefined
    case Value.Lst(xs)   => xs.exists(ipValueHasPort)
    case _               => false
  }

  /** Resolve a `view == name` value to its stored expression's AST
    * (Q15, jison:529-542 viewand). `depth` guards against mutually
    * recursive views.
    */
  private def viewAst(value: Value, depth: Int): Ast = {
    if (depth > maxDepth)
      throw new IllegalArgumentException("view recursion too deep")
    val name = value match {
      case Value.Bare(s) => s; case Value.Quoted(s) => s
      case other => throw new IllegalArgumentException(s"bad view $other")
    }
    val ex = views.getOrElse(name,
      throw new IllegalArgumentException(s"$name - View not found"))
    Parser.parse(ex)
  }

  /** Q16 `file == name` fileand rewrite: resolve the capture file name
    * (exact, wildcard, or /regex/) through the files dimension to its
    * (node, fileId) rows, and expand to an OR of per-file
    * `node == n && fileId == id` terms — the reference resolves before
    * querying ES the same way (viewer/viewerUtils.js:152-170). An
    * unmatched name is an error, as in the reference.
    */
  private def fileAnd(value: Value): Column = {
    val matched = value match {
      case Value.Regex(re) =>
        val p = java.util.regex.Pattern.compile("^(?:" + re + ")$")
        files.filter(f => p.matcher(f.name).matches())
      case Value.Bare(s) if s.contains("*") =>
        val p = java.util.regex.Pattern.compile(
          "^" + s.split("\\*", -1).map(java.util.regex.Pattern.quote)
            .mkString(".*") + "$")
        files.filter(f => p.matcher(f.name).matches())
      case Value.Bare(s)   => files.filter(_.name == s)
      case Value.Quoted(s) => files.filter(_.name == s)
      case other => throw new IllegalArgumentException(s"bad file value $other")
    }
    if (matched.isEmpty)
      throw new IllegalArgumentException(s"File '$value' not found")
    matched.map(f =>
      col("node") === lit(f.node) &&
        array_contains(col("fileId"), lit(f.id))).reduce(_ || _)
  }

  /** The queryable column: FLAG_CNT companions compare the stored
    * array's size (field.c:300-316), everything else the column itself.
    */
  private def fieldCol(d: FieldDef): Column =
    if (d.cnt) size(col(d.dbField)) else col(d.dbField)

  private def existsCol(d: FieldDef): Column = {
    val c = fieldCol(d)
    if (d.multiValued) c.isNotNull && size(c) > 0 else c.isNotNull
  }

  private def cmpCol(d: FieldDef, op: CmpOp, value: Value): Column = {
    import FieldKind._
    d.kind match {
      case IntegerK | FloatK => numericCmp(d, op, value)
      case SecondsK | DateK  => dateCmp(d, op, value)
      case IpK               => ipCmp(d, op, value)
      case TermK | LoTermK | UpTermK | TextK => stringCmp(d, op, value)
    }
  }

  // ---------------------------------------------------------------- numeric

  private def numericCmp(d: FieldDef, op: CmpOp, value: Value): Column = {
    val c = fieldCol(d)
    def lits(v: Value): Column = lit(numVal(d, v))
    val rangeRe = "^(-?\\d+)-(-?\\d+)$".r
    (op, value) match {
      case (Eq | Ne, Value.Bare(rangeRe(lo, hi))) =>
        inRange(d, c, lo.toDouble, hi.toDouble)
      case (Eq | Ne, Value.Lst(items)) =>
        // a list item may itself be the 10-20 range shorthand (the
        // reference's termOrTermsInt handles each element)
        items1(items).map {
          case Value.Bare(rangeRe(lo, hi)) =>
            inRange(d, c, lo.toDouble, hi.toDouble)
          case i => eqOne(d, c, lits(i))
        }.reduce(_ || _)
      case (Eq | Ne, v) =>
        eqOne(d, c, lits(v))
      case (Lt, v)  => ineq(d, c, _ < lits(v))
      case (Lte, v) => ineq(d, c, _ <= lits(v))
      case (Gt, v)  => ineq(d, c, _ > lits(v))
      case (Gte, v) => ineq(d, c, _ >= lits(v))
      case _ => throw new IllegalArgumentException(s"bad numeric op $op")
    }
  }

  private def eqOne(d: FieldDef, c: Column, v: Column): Column =
    if (d.multiValued) array_contains(c, v) else c === v

  /** Inequality with array-membership semantics on multivalued columns
    * (some element satisfies), as ES range queries behave on arrays.
    */
  private def ineq(d: FieldDef, c: Column, f: Column => Column): Column =
    if (d.multiValued) exists(c, f) else f(c)

  private def inRange(d: FieldDef, c: Column, lo: Double, hi: Double): Column =
    if (d.multiValued) exists(c, e => e >= lit(lo) && e <= lit(hi))
    else c >= lit(lo) && c <= lit(hi)

  private def numVal(d: FieldDef, v: Value): Double = {
    val raw = v match {
      case Value.Bare(s)   => s
      case Value.Quoted(s) => s
      case other => throw new IllegalArgumentException(
        s"${d.expression}: unsupported numeric value $other")
    }
    val t = d.transform.map(_.apply(raw)).getOrElse(raw)
    t.toDouble
  }

  // ---------------------------------------------------------------- string

  private def foldCase(d: FieldDef, s: String): String = d.kind match {
    case FieldKind.LoTermK => s.toLowerCase
    case FieldKind.UpTermK => s.toUpperCase
    case _                 => s
  }

  /** Moloch wildcard (`*` any, `?` one) → SQL LIKE pattern. */
  private[expr] def wildcardToLike(s: String): String =
    s.flatMap {
      case '*'  => "%"
      case '?'  => "_"
      case '%'  => "\\%"
      case '_'  => "\\_"
      case '\\' => "\\\\"
      case c    => c.toString
    }

  private def stringMatchOne(d: FieldDef, v: Value): Column => Column = {
    def tx(s: String): String = foldCase(d, d.transform.map(_.apply(s)).getOrElse(s))
    // lo/up termfields match case-insensitively on BOTH sides: the
    // reference's ES analyzer lowercases stored values at index time,
    // so original-case storage (ASN org names) still matches lowered
    // operands (viewer/molochparser.jison:498-518)
    def foldCol(e: Column): Column = d.kind match {
      case FieldKind.LoTermK => lower(e)
      case FieldKind.UpTermK => upper(e)
      case _                 => e
    }
    // textfield kind: analyzed phrase match (ES match_phrase on the
    // tokenized column) — the phrase's tokens must appear in order with
    // token boundaries, case-insensitively (jison:670-673,700-702)
    if (d.kind == FieldKind.TextK) {
      val phrase = v match {
        case Value.Bare(s)   => s
        case Value.Quoted(s) => s
        case other => throw new IllegalArgumentException(
          s"textfield needs a term/phrase, got $other")
      }
      val toks = phrase.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      if (toks.isEmpty) return _ => lit(false)
      val re = "(^|[^a-z0-9])" + toks.map(java.util.regex.Pattern.quote)
        .mkString("[^a-z0-9]+") + "([^a-z0-9]|$)"
      return e => lower(e).rlike(re)
    }
    v match {
      case Value.Regex(re) =>
        // lo/up termfields fold BOTH sides like every other value shape
        // (the jison formatValue lowercases the whole operand, regexes
        // included — bug-compatible: character classes fold too)
        val full = "^(?:" + foldCase(d, re) + ")$" // ES regexp is anchored
        e => foldCol(e).rlike(full)
      case Value.Quoted(s) =>
        val lit0 = tx(s); e => foldCol(e) === lit(lit0)
      case Value.Bare(s) if s.contains("*") =>
        if (s == "*") throw new IllegalArgumentException(
          "Please use 'EXISTS!' instead of a '*' in expression")
        val pat = wildcardToLike(tx(s)); e => foldCol(e).like(pat)
      case Value.Bare(s) =>
        val lit0 = tx(s); e => foldCol(e) === lit(lit0)
      case Value.Lst(_) =>
        throw new IllegalArgumentException("nested list")
    }
  }

  private def stringCmp(d: FieldDef, op: CmpOp, value: Value): Column = {
    val c = fieldCol(d)
    def apply1(v: Value): Column = {
      val f = stringMatchOne(d, v)
      if (d.multiValued) exists(c, f) else f(c)
    }
    val m = value match {
      case Value.Lst(items) => items1(items).map(apply1).reduce(_ || _)
      case v                => apply1(v)
    }
    op match {
      case Eq => m
      case Ne => throw new IllegalStateException("Ne is normalized to Eq upstream")
      case _  => throw new IllegalArgumentException(
        s"Invalid operator '$op' for ${d.expression}")
    }
  }

  // ------------------------------------------------------------------ date

  private def dateCmp(d: FieldDef, op: CmpOp, value: Value): Column = {
    val c = fieldCol(d)
    def secs(v: Value): Long = v match {
      case Value.Bare(s)   => DateParse.parseSeconds(s, now)
      case Value.Quoted(s) => DateParse.parseSeconds(s, now)
      case other => throw new IllegalArgumentException(s"bad date value $other")
    }
    // DateK columns are timestamps; SecondsK columns are epoch-second longs.
    def bound(v: Value): Column =
      if (d.kind == FieldKind.DateK) timestamp_seconds(lit(secs(v))) else lit(secs(v))
    def dateEqM(v: Value): Column =
      if (d.multiValued) exists(c, e => dateEq(d, e, bound(v)))
      else dateEq(d, c, bound(v))
    (op, value) match {
      case (Eq | Ne, Value.Lst(items)) =>
        items1(items).map(dateEqM).reduce(_ || _)
      case (Eq | Ne, v) =>
        dateEqM(v)
      case (Lt, v)  => ineq(d, c, _ < bound(v))
      case (Lte, v) => ineq(d, c, _ <= bound(v))
      case (Gt, v)  => ineq(d, c, _ > bound(v))
      case (Gte, v) => ineq(d, c, _ >= bound(v))
      case _ => throw new IllegalArgumentException(s"bad date op $op")
    }
  }

  /** Date equality = within the named second (ES range gte/lte — jison
    * termOrTermsDate). For timestamp columns: [t, t+1s); for
    * epoch-second long columns: [t, t+1).
    */
  private def dateEq(d: FieldDef, c: Column, t: Column): Column =
    if (d.kind == FieldKind.DateK) c >= t && c < t + expr("INTERVAL 1 SECOND")
    else c >= t && c < t + lit(1L)

  // -------------------------------------------------------------------- ip

  private def ipCmp(d: FieldDef, op: CmpOp, value: Value): Column = {
    value match {
      case Value.Regex(_) => throw new IllegalArgumentException(
        "Regex not supported for ip queries")
      case Value.Bare(s) if s.contains("*") => throw new IllegalArgumentException(
        "Wildcard not supported for ip queries")
      case _ =>
    }
    val c = fieldCol(d)
    def one(raw0: String): Column = {
      val raw = raw0.trim
      // :port / .port alone, or trailing port on v4 (`:p`) / v6 (`.p`)
      val (ipPart, portPart) = splitIpPort(raw)
      val ipMatch: Option[Column] = ipPart.map { ip =>
        if (d.multiValued) exists(c, e => IpFunctions.ipInCidr(e, ip))
        else IpFunctions.ipInCidr(c, ip)
      }
      val portMatch: Option[Column] = portPart.map { p =>
        val pf = d.portField.getOrElse(throw new IllegalArgumentException(
          s"${d.expression} doesn't support port"))
        // null-intolerant: the must_not guard in toCol only null-guards
        // the IP column; a NULL port (ICMP) must make this sub-predicate
        // FALSE so `ip != a.b.c.d:p` still includes the row (ES: a term
        // on a missing field fails, so the inner bool fails and must_not
        // matches)
        coalesce(col(pf) === lit(p.toInt), lit(false))
      }
      (ipMatch, portMatch) match {
        case (Some(a), Some(b)) => a && b
        case (Some(a), None)    => a
        case (None, Some(b))    => b
        case (None, None)       => lit(false)
      }
    }
    def strOf(v: Value): String = v match {
      case Value.Bare(s) => s; case Value.Quoted(s) => s
      case other => throw new IllegalArgumentException(s"bad ip value $other")
    }
    (op, value) match {
      case (Eq | Ne, Value.Lst(items)) =>
        items1(items).map(i => one(strOf(i))).reduce(_ || _)
      case (Eq | Ne, v) =>
        one(strOf(v))
      case (rangeOp, v) =>
        // gt/lt on ip: numeric 128-bit order, like the reference's ES range
        // on an ip-typed field. Both sides map to the fixed-width 16-byte
        // v4-mapped form (ip_sortable) whose unsigned BinaryType ordering
        // is numeric IP order — a lexicographic compare of the canonical
        // strings would put '9.0.0.1' above '10.0.0.0'.
        // an unparseable operand (including a `:port` suffix, which has
        // no meaning on an order compare) must surface as a 400-class
        // parse error — not compile to lit(false) and silently return
        // zero rows (ES likewise rejects a bad ip range value)
        val raw = strOf(v)
        val base = IpUtil.expandShorthand(raw).split('/').head
        val bytes = IpUtil.toBytes(base)
        if (bytes == null)
          throw new IllegalArgumentException(s"bad ip range value '$raw'")
        else {
          val target = lit(bytes)
          def cmp(e: Column): Column = rangeOp match {
            case Lt  => IpFunctions.ipSortable(e) < target
            case Lte => IpFunctions.ipSortable(e) <= target
            case Gt  => IpFunctions.ipSortable(e) > target
            case Gte => IpFunctions.ipSortable(e) >= target
            case _   => lit(false)
          }
          if (d.multiValued) exists(c, cmp) else cmp(c)
        }
    }
  }

  /** Split the reference's ip:port forms (jison parseIpPort:150-293):
    * `:80` → (None, 80); `10.1.2.3:80`; v6 `1::2.80`. Deliberately
    * bug-compatible on v4-mapped v6 literals: `::ffff:8.8.8.8` splits at
    * the first dot exactly like parseIpPort's `dots = str.split('.')`
    * (jison:246-251), yielding ip `::ffff:8` + port 8.
    */
  private[expr] def splitIpPort(raw: String): (Option[String], Option[String]) = {
    if (raw.startsWith(":") || raw.startsWith("."))
      return (None, Some(raw.substring(1)))
    val colons = raw.split(':')
    if (colons.length > 2) { // v6: port after '.'
      val dots = raw.split('.')
      if (dots.length > 1 && dots(1).nonEmpty) (Some(dots(0)), Some(dots(1)))
      else (Some(raw), None)
    } else if (colons.length == 2 && colons(1).nonEmpty) {
      (Some(colons(0)), Some(colons(1)))
    } else (Some(raw), None)
  }
}
