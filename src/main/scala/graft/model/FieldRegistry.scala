package graft.model

/** Field kind taxonomy, mirroring the reference's query-side kinds
  * (reference: capture/field.c:190-219, viewer/internals.js:48-54).
  *
  * `lo`/`up` variants case-fold the operand before matching
  * (reference: viewer/molochparser.jison:498-518).
  */
sealed trait FieldKind
object FieldKind {
  case object IntegerK   extends FieldKind // integer
  case object SecondsK   extends FieldKind // epoch seconds
  case object DateK      extends FieldKind // timestamp column
  case object IpK        extends FieldKind // ip (string, CIDR-matchable)
  case object TermK      extends FieldKind // termfield (exact/keyword)
  case object LoTermK    extends FieldKind // lotermfield
  case object UpTermK    extends FieldKind // uptermfield
  case object TextK      extends FieldKind // textfield (tokenized)
  case object FloatK     extends FieldKind // numeric double (extension)
}

/** One registered queryable field.
  *
  * Mirrors the reference's field registry entries stored in the ES `fields`
  * index (reference: capture/field.c:254-344 moloch_field_define):
  * user-facing `expression` name, storage column `dbField`, query `kind`,
  * whether the storage column is an array (reference *_ARRAY/_HASH types →
  * membership semantics), an optional paired port field (reference
  * `portField`), and an optional operand transform applied at query time
  * (reference: viewer/molochparser.jison:752-762).
  */
final case class FieldDef(
    expression: String,
    dbField: String,
    kind: FieldKind,
    multiValued: Boolean = false,
    portField: Option[String] = None,
    transform: Option[String => String] = None)

/** Expression-name → field metadata lookup driving the query compiler.
  *
  * Also models the reference's regex meta-fields (`port`, `country`, `asn`,
  * `rir`, `host`, `ip`) which fan out to an OR over every column whose
  * dbField matches a pattern (reference: db/db.pl:749-788, expansion at
  * viewer/molochparser.jison:356-375).
  */
final case class FieldRegistry(
    fields: Seq[FieldDef],
    metaFields: Map[String, Seq[String]] = Map.empty) {

  private val byExpr: Map[String, FieldDef] =
    fields.map(f => f.expression -> f).toMap

  def get(expression: String): Option[FieldDef] = byExpr.get(expression)

  def apply(expression: String): FieldDef =
    byExpr.getOrElse(expression,
      throw new IllegalArgumentException(s"unknown field: $expression"))

  /** Expand a meta-field to its member expressions, if registered. */
  def expand(expression: String): Seq[FieldDef] =
    metaFields.get(expression) match {
      case Some(members) => members.map(apply)
      case None          => Seq(apply(expression))
    }

  def isMeta(expression: String): Boolean = metaFields.contains(expression)
}

object FieldRegistry {
  import FieldKind._

  /** Registry over the driver's synthetic `events` table, used by the
    * oracle-checked expression-compiler queries. The session registry for
    * the pcap ETL path lives in [[graft.etl.SessionSchema]].
    */
  val events: FieldRegistry = FieldRegistry(Seq(
    FieldDef("id",         "event_id",   IntegerK),
    FieldDef("ts",         "ts",         DateK),
    FieldDef("user",       "user_id",    IntegerK),
    FieldDef("type",       "event_type", TermK),
    FieldDef("type.lower", "event_type", LoTermK),
    FieldDef("value",      "value",      FloatK),
    FieldDef("props",      "props",      TermK)
  ))
}
