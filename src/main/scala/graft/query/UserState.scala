package graft.query

import org.apache.spark.sql.{Encoders, SparkSession}

/** E46: per-user UI-configuration persistence — the reference keeps
  * three families of named per-user layout objects on the user document
  * and serves them through dedicated endpoints:
  *
  *  - table states (`GET/POST /api/user/state/:name`, also mounted at
  *    `/tableState/:tablename` — viewer/apiUsers.js:1558-1612
  *    getUserState/updateUserState): a free-form JSON blob per table
  *    name, `{}` when unset;
  *  - custom Sessions column configurations (`/api/user/column(s)`,
  *    apiUsers.js:1187-1345): named `{columns, order}` lists — names
  *    sanitized to `[-a-zA-Z0-9\s_:]`, unique per user, create rejects
  *    duplicates, update requires an existing entry, delete by name;
  *  - SPI View field configurations (`/api/user/spiview(s)`,
  *    apiUsers.js:1360-1465): same CRUD discipline over `{fields}`.
  *
  * Spark-first shape: one tiny parquet table of
  * `(userId, kind, name, json)` rows (kind ∈ state|column|spiview)
  * rewritten whole per mutation ([[graft.model.TinyTable]]) — layout
  * configuration is dozens of rows per user, never data-scale. The
  * payload stays the caller's JSON verbatim, as in the reference (the
  * UI owns its meaning); only names are validated here.
  */
object UserState {

  final case class Entry(userId: String, kind: String, name: String,
      json: String)

  val StateKind = "state"
  val ColumnKind = "column"
  val SpiviewKind = "spiview"

  /** Reference name sanitation for column/spiview configs
    * (apiUsers.js:1230 `replace(/[^-a-zA-Z0-9\s_:]/g, '')`).
    */
  def sanitizeName(name: String): String =
    name.replaceAll("[^-a-zA-Z0-9\\s_:]", "")

  private implicit val enc: org.apache.spark.sql.Encoder[Entry] =
    Encoders.product[Entry]

  private def readAll(spark: SparkSession, path: String): Seq[Entry] =
    graft.model.TinyTable.read[Entry](spark, path)

  private def writeAll(spark: SparkSession, path: String,
      rows: Seq[Entry]): Unit =
    graft.model.TinyTable.write(spark, path, rows, "userstate")

  // ----------------------------------------------------- table states

  /** getUserState: the stored blob, or the reference's literal `{}`. */
  def getState(spark: SparkSession, path: String, userId: String,
      name: String): String =
    readAll(spark, path)
      .find(e => e.userId == userId && e.kind == StateKind && e.name == name)
      .map(_.json).getOrElse("{}")

  /** updateUserState: upsert, no name discipline (any table name). */
  def setState(spark: SparkSession, path: String, userId: String,
      name: String, json: String): Unit = {
    val all = readAll(spark, path)
    val rest = all.filterNot(e =>
      e.userId == userId && e.kind == StateKind && e.name == name)
    writeAll(spark, path, rest :+ Entry(userId, StateKind, name, json))
  }

  // ------------------------------------- named configs (column/spiview)

  /** getUserColumns / getUserSpiviewFields: this user's configs. */
  def list(spark: SparkSession, path: String, userId: String,
      kind: String): Seq[Entry] =
    readAll(spark, path)
      .filter(e => e.userId == userId && e.kind == kind)
      .sortBy(_.name)

  /** createUserColumns / createUserSpiviewFields: sanitized non-empty
    * name, unique per (user, kind) — a duplicate is an error, exactly
    * like the reference's 403.
    */
  def create(spark: SparkSession, path: String, userId: String,
      kind: String, name: String, json: String): Entry = {
    val n = sanitizeName(name)
    require(n.nonEmpty, s"Invalid configuration name '$name'")
    require(json.nonEmpty, "Missing configuration body")
    val all = readAll(spark, path)
    require(!all.exists(e =>
      e.userId == userId && e.kind == kind && e.name == n),
      s"There is already a configuration named '$n'")
    val e = Entry(userId, kind, n, json)
    writeAll(spark, path, all :+ e)
    e
  }

  /** updateUserColumns / updateUserSpiviewFields: the named config must
    * already exist (the reference answers 'not found' rather than
    * creating).
    */
  def update(spark: SparkSession, path: String, userId: String,
      kind: String, name: String, json: String): Entry = {
    val all = readAll(spark, path)
    val found = all.exists(e =>
      e.userId == userId && e.kind == kind && e.name == name)
    require(found, s"Configuration '$name' not found")
    val e = Entry(userId, kind, name, json)
    writeAll(spark, path, all.map(x =>
      if (x.userId == userId && x.kind == kind && x.name == name) e else x))
    e
  }

  /** deleteUserColumns / deleteUserSpiviewFields. */
  def delete(spark: SparkSession, path: String, userId: String,
      kind: String, name: String): Unit = {
    val all = readAll(spark, path)
    require(all.exists(e =>
      e.userId == userId && e.kind == kind && e.name == name),
      s"Configuration '$name' not found")
    writeAll(spark, path, all.filterNot(e =>
      e.userId == userId && e.kind == kind && e.name == name))
  }
}
