package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{IpFunctions, IpUtil}
import graft.model.{FieldDef, FieldKind, FieldRegistry}

/** Loader for the reference's capture rules files (tests/rules.yaml
  * format; engine capture/rules.c, special ops capture/field.c:1483-1489)
  * so an operator's existing rules file drives the batch pipeline
  * unchanged.
  *
  * Semantics transcribed from rules.c:
  *   - a rule carries exactly one of `bpf` / `fields` (`expression` is
  *     rejected there too, rules.c:395);
  *   - `fields` entries AND together per field POSITION; the values of
  *     one field (across its exact list and every `,modifier` variant)
  *     OR together (rules.c:474-476 registers a position once;
  *     check_str_match:772-818 passes on ANY stored value);
  *   - `,head/,startsWith`, `,tail/,endsWith` and `,contains` are only
  *     legal on string kinds (rules.c:484,493 LOGEXIT on int/ip), and —
  *     faithfully replicated — the reference's match switch FALLS
  *     THROUGH (no break, rules.c:794-816), so every modifier variant
  *     degenerates to a substring (contains) test;
  *   - ip values are CIDR-matched (patricia trie there, `ip_in_cidr`
  *     here), integer values are exact set membership;
  *   - ops add a value to a field, or one of the special `_` controls.
  *
  * The YAML subset accepted is exactly what rules.c's hand-rolled
  * parser reads: `version: 1`, a `rules:` list of block maps with
  * scalar values, nested `fields:`/`ops:` maps and `- ` value lists.
  * Anything else fails loudly (the reference LOGEXITs on every parse
  * surprise rather than guessing).
  */
object RulesLoader {

  // ------------------------------------------------------------- model
  sealed trait RuleOp
  /** Append `value` to a (multi-valued) field when the rule matches.
    * `arrayKind` mirrors the registry's STR_ARRAY/STR_HASH split
    * (field.c:561-581): set-kinded fields dedup (a duplicate insert is a
    * no-op) so the batch form canonicalizes sort+dedup; array-kinded
    * fields append unconditionally, order and duplicates preserved.
    */
  final case class AddToField(expression: String, dbField: String,
      value: String, arrayKind: Boolean = false) extends RuleOp
  /** `-field: value` — withdraw a value. */
  final case class RemoveFromField(expression: String, dbField: String,
      value: String) extends RuleOp
  /** One of the `_` capture controls (field.c:1483-1489). */
  final case class SpecialOp(name: String, value: Int) extends RuleOp

  final case class LoadedRule(
      name: String,
      when: String,
      bpf: Option[String],
      predicate: Option[Column],
      ops: Seq[RuleOp],
      log: Boolean)

  private val Whens = Set("everyPacket", "sessionSetup", "afterClassify",
    "fieldSet", "beforeMiddleSave", "beforeFinalSave", "beforeBothSave")

  private val Specials = Map(
    "dontSaveSPI" -> "_dontSaveSPI",
    "_dontSaveSPI" -> "_dontSaveSPI",
    "_maxPacketsToSave" -> "_maxPacketsToSave",
    "_minPacketsBeforeSavingSPI" -> "_minPacketsBeforeSavingSPI",
    "_dropBySrc" -> "_dropBySrc",
    "_dropByDst" -> "_dropByDst",
    "_dontCheckYara" -> "_dontCheckYara")

  // -------------------------------------------------------- yaml subset
  private final case class Node(key: String, value: Option[String],
      children: Seq[Node])

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') ||
      (t.head == '\'' && t.last == '\''))) t.substring(1, t.length - 1)
    else t
  }

  /** Parse the block-structured subset: `key:`, `key: value`, `- item`,
    * `- key: value` (list-of-maps opener), nested by indentation.
    */
  private def parseYaml(text: String): Seq[Node] = {
    final case class Line(indent: Int, isItem: Boolean, body: String)
    val lines = text.split("\n").toSeq
      .map(l => if (l.contains('\t'))
        throw new IllegalArgumentException("rules yaml: tabs not supported")
      else l)
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#") &&
        l.trim != "---" && l.trim != "...")
      .map { l =>
        val indent = l.indexWhere(_ != ' ')
        val t = l.trim
        if (t.startsWith("- ")) Line(indent, isItem = true, t.substring(2))
        else if (t == "-") Line(indent, isItem = true, "")
        else Line(indent, isItem = false, t)
      }

    def parseBlock(from: Int, indent: Int): (Seq[Node], Int) = {
      val out = Seq.newBuilder[Node]
      var i = from
      while (i < lines.size && lines(i).indent >= indent) {
        val ln = lines(i)
        if (ln.indent > indent)
          throw new IllegalArgumentException(
            s"rules yaml: unexpected indent at '${ln.body}'")
        if (ln.isItem) {
          // a list item: scalar, or the first key of an item map whose
          // further keys sit at indent + 2 (the `- ` takes two columns).
          // A colon only opens a map when followed by a space or ending
          // the line — scalar values legitimately carry colons (v6
          // addresses, MACs), `- 2001:06f8::/32` stays a scalar.
          if (ln.body.isEmpty)
            throw new IllegalArgumentException("rules yaml: empty list item")
          val colonAt = ln.body.indexOf(':')
          val opensMap = colonAt >= 0 && (colonAt == ln.body.length - 1 ||
            ln.body.charAt(colonAt + 1) == ' ')
          if (!opensMap) {
            out += Node(stripQuotes(ln.body), None, Nil)
            i += 1
          } else {
            val k = stripQuotes(ln.body.substring(0, colonAt))
            val v = ln.body.substring(colonAt + 1).trim
            val first =
              if (v.isEmpty) {
                val (kids, next) = parseBlock(i + 1, indent + 4)
                i = next
                Node(k, None, kids)
              } else { i += 1; Node(k, Some(stripQuotes(v)), Nil) }
            // the rest of this item-map's keys at indent + 2
            val (rest, next2) = parseBlock(i, indent + 2)
            i = next2
            out += Node("-", None, first +: rest)
          }
        } else {
          val colonAt = ln.body.indexOf(':')
          if (colonAt < 0 || (colonAt != ln.body.length - 1 &&
            ln.body.charAt(colonAt + 1) != ' '))
            throw new IllegalArgumentException(
              s"rules yaml: expected key: at '${ln.body}'")
          val k = stripQuotes(ln.body.substring(0, colonAt))
          val v = ln.body.substring(colonAt + 1).trim
          if (v.isEmpty) {
            val (kids, next) = parseBlock(i + 1, indent + 2)
            i = next
            out += Node(k, None, kids)
          } else {
            out += Node(k, Some(stripQuotes(v)), Nil)
            i += 1
          }
        }
      }
      (out.result(), i)
    }
    parseBlock(0, 0)._1
  }

  // --------------------------------------------------------- compiling
  /** Load and compile a rules file against `registry`; `colFor` resolves
    * db column names on the target frame (defaults to the session-table
    * resolver).
    */
  def load(text: String, registry: FieldRegistry,
      colFor: String => Column = graft.model.FieldRegistry.sessionCol)
      : Seq[LoadedRule] = {
    val top = parseYaml(text)
    val version = top.find(_.key == "version").flatMap(_.value)
    if (!version.contains("1"))
      throw new IllegalArgumentException("rules yaml: missing version: 1")
    val rules = top.find(_.key == "rules").map(_.children).getOrElse(
      throw new IllegalArgumentException("rules yaml: missing rules"))
    rules.map { item =>
      if (item.key != "-")
        throw new IllegalArgumentException("rules yaml: rules must be a list")
      compileRule(item.children, registry, colFor)
    }
  }

  private def compileRule(keys: Seq[Node], registry: FieldRegistry,
      colFor: String => Column): LoadedRule = {
    def one(k: String): Option[Node] = keys.find(_.key == k)
    val name = one("name").flatMap(_.value).getOrElse(
      throw new IllegalArgumentException("rule: missing name"))
    val when = one("when").flatMap(_.value).getOrElse(
      throw new IllegalArgumentException(s"rule '$name': missing when"))
    if (!Whens(when))
      throw new IllegalArgumentException(s"rule '$name': unknown when '$when'")
    val bpf = one("bpf").flatMap(_.value)
    val fields = one("fields").map(_.children).getOrElse(Nil)
    if (one("expression").isDefined)
      throw new IllegalArgumentException(
        s"rule '$name': expression rules not supported (rules.c:395 same)")
    if (bpf.isEmpty == fields.isEmpty)
      throw new IllegalArgumentException(
        s"rule '$name': exactly one of bpf/fields required")
    if (when == "everyPacket" && bpf.isEmpty)
      throw new IllegalArgumentException(
        s"rule '$name': everyPacket only supports bpf")
    if (when != "everyPacket" && when != "sessionSetup" && bpf.nonEmpty)
      throw new IllegalArgumentException(
        s"rule '$name': $when doesn't support bpf")

    val opsNode = one("ops").getOrElse(
      throw new IllegalArgumentException(s"rule '$name': ops required"))
    val ops = opsNode.children.map { o =>
      val value = o.value.getOrElse(throw new IllegalArgumentException(
        s"rule '$name': op ${o.key} needs a value"))
      Specials.get(o.key) match {
        case Some(canon) => SpecialOp(canon, value.toInt)
        case None =>
          val (expr, remove) =
            if (o.key.startsWith("-")) (o.key.substring(1), true)
            else (o.key, false)
          val d = registry.get(expr).getOrElse(
            throw new IllegalArgumentException(
              s"rule '$name': unknown op field '$expr'"))
          if (remove) RemoveFromField(expr, d.dbField, value)
          else AddToField(expr, d.dbField, value, d.arrayKind)
      }
    }
    val log = one("log").flatMap(_.value).exists(_.equalsIgnoreCase("true"))

    val predicate = if (fields.isEmpty) None else {
      // group the `expr[,modifier]` entries by base expression — ONE
      // position per rule, values OR across variants (rules.c:474-476)
      val grouped = fields.map { f =>
        val (base, mod) = f.key.split(",", 2) match {
          case Array(b) => (b, None)
          case Array(b, m) => (b, Some(m))
        }
        mod.foreach { m =>
          if (!Set("head", "startsWith", "tail", "endsWith", "contains")(m))
            throw new IllegalArgumentException(
              s"rule '$name': field ${f.key} doesn't support modifier $m")
        }
        val values =
          f.value.map(Seq(_)).getOrElse(f.children.map { c =>
            if (c.value.nonEmpty || c.children.nonEmpty)
              throw new IllegalArgumentException(
                s"rule '$name': field ${f.key} values must be scalars")
            c.key
          })
        (base, mod, values)
      }.groupBy(_._1)

      val perField = grouped.toSeq.sortBy(_._1).map { case (base, entries) =>
        val d = registry.get(base).getOrElse(
          throw new IllegalArgumentException(
            s"rule '$name': couldn't find field '$base'"))
        val exact = entries.filter(_._2.isEmpty).flatMap(_._3)
        val patterns = entries.filter(_._2.nonEmpty).flatMap(_._3)
        fieldMatch(name, d, exact, patterns, colFor)
      }
      Some(perField.reduce(_ && _))
    }

    LoadedRule(name, when, bpf, predicate, ops, log)
  }

  /** One field position's match: exact-set OR modifier patterns.
    * Modifier patterns use substring semantics for every modifier — the
    * reference's match switch falls through (rules.c:794-816), so a
    * `,endsWith` pattern that appears mid-value still matches there; we
    * replicate rather than "fix" it.
    */
  private def fieldMatch(rule: String, d: FieldDef, exact: Seq[String],
      patterns: Seq[String], colFor: String => Column): Column = {
    import FieldKind._
    val c = if (d.cnt) size(colFor(d.dbField)) else colFor(d.dbField)
    d.kind match {
      case IntegerK | FloatK | SecondsK | DateK =>
        if (patterns.nonEmpty)
          throw new IllegalArgumentException(
            s"rule '$rule': ${d.expression} doesn't support modifiers")
        val vals = exact.map(_.toDouble)
        val hit = (e: Column) => vals.map(v => e === lit(v)).reduce(_ || _)
        if (d.multiValued && !d.cnt) exists(c, hit) else hit(c)
      case IpK =>
        if (patterns.nonEmpty)
          throw new IllegalArgumentException(
            s"rule '$rule': ${d.expression} doesn't support modifiers")
        val cidrs = exact.map { v =>
          val cidr = if (v.contains("/")) v
          else if (v.contains(":")) s"$v/128" else s"$v/32"
          if (IpUtil.parseCidr(cidr).isEmpty)
            throw new IllegalArgumentException(
              s"rule '$rule': bad ip value '$v'")
          cidr
        }
        val hit = (e: Column) =>
          cidrs.map(IpFunctions.ipInCidr(e, _)).reduce(_ || _)
        if (d.multiValued) exists(c, hit) else hit(c)
      case TermK | LoTermK | UpTermK | TextK =>
        val hits = exact.map(v => (e: Column) => e === lit(v)) ++
          patterns.map(p => (e: Column) => e.contains(lit(p)))
        if (hits.isEmpty)
          throw new IllegalArgumentException(
            s"rule '$rule': ${d.expression} has no values")
        val hit = (e: Column) => hits.map(h => h(e)).reduce(_ || _)
        if (d.multiValued) exists(c, hit) else hit(c)
    }
  }

  // -------------------------------------------------------- application
  /** Apply the batch-representable ops of save-stage field rules to a
    * session frame: field adds/removes, `_dontSaveSPI`,
    * `_minPacketsBeforeSavingSPI` (drop when under the floor) and
    * `_maxPacketsToSave` (truncate the packet reference arrays).
    * Capture-time controls (`_dropBySrc`/`_dropByDst`/`_dontCheckYara`)
    * and bpf rules have no meaning on an already-built session row —
    * they fail loudly rather than silently no-op, matching the
    * reference's LOGEXIT posture on surprises.
    */
  def applySpi(df0: DataFrame, rules: Seq[LoadedRule]): DataFrame = {
    var df = df0
    rules.foreach { r =>
      val pred = r.predicate.getOrElse(throw new IllegalArgumentException(
        s"rule '${r.name}': bpf rules apply at capture, not on SPI rows"))
      r.ops.foreach {
        case AddToField(_, dbField, value, arrayKind) =>
          val cur = coalesce(col(dbField),
            array().cast(df.schema(dbField).dataType))
          // set-kinded fields canonicalize (dup insert is a no-op in the
          // reference, field.c:566-581, and set order is unobservable);
          // array-kinded fields append — order and duplicates are the
          // reference semantics (field.c:561-565 g_ptr_array_add)
          val added =
            if (arrayKind) concat(cur, array(lit(value)))
            else array_sort(array_union(cur, array(lit(value))))
          df = df.withColumn(dbField,
            when(pred, added).otherwise(col(dbField)))
        case RemoveFromField(_, dbField, value) =>
          df = df.withColumn(dbField,
            when(pred, array_remove(coalesce(col(dbField),
              array().cast(df.schema(dbField).dataType)), value))
              .otherwise(col(dbField)))
        case SpecialOp("_dontSaveSPI", v) if v != 0 =>
          df = df.filter(!coalesce(pred, lit(false)))
        case SpecialOp("_minPacketsBeforeSavingSPI", n) =>
          df = df.filter(!coalesce(pred && col("totPackets") < n, lit(false)))
        case SpecialOp("_maxPacketsToSave", n) =>
          Seq("packetPos", "packetLen", "packetFileIdx").foreach { pc =>
            if (df.columns.contains(pc))
              df = df.withColumn(pc,
                when(pred, slice(col(pc), 1, n)).otherwise(col(pc)))
          }
        case SpecialOp(other, _) =>
          throw new IllegalArgumentException(
            s"rule '${r.name}': $other is a capture-time control with no " +
              "SPI-row meaning")
      }
    }
    df
  }
}
