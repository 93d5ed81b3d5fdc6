package graft.query

import org.apache.spark.sql.{Encoders, SparkSession}

import graft.ops.{Forward, Notifier}

/** Persisted periodic queries — the `/api/user/cron(s)` CRUD surface
  * (reference: viewer/apiUsers.js:960-1060 getUserCron /
  * createUserCron / deleteUserCron / updateUserCron; route pairs
  * viewer/viewer.js:1396-1424). The reference stores each query as an
  * ES `queries` document whose `_id` becomes the client-visible `key`;
  * here the store is a [[graft.model.TinyTable]] parquet like every
  * sibling config store (users, shortcuts, views, notifiers), and the
  * key is the sanitized name made unique with a numeric suffix — stable
  * across renames exactly like [[Shortcuts]] ids.
  *
  * Semantics carried over:
  *  - create (apiUsers.js:1006-1077) requires name, expression
  *    (`query`), action and tags; optional description/notifier; seeds
  *    `lpValue = lastRun` from `since` hours back, clamped to the
  *    store's oldest session (`since == -1` → start at the oldest);
  *    `count = 0`, creator recorded (`anonymous` when absent);
  *  - update (apiUsers.js:1114-1183) replaces the editable fields,
  *    clears description/notifier when omitted, preserves
  *    lpValue/count/creator/created, and records who toggled
  *    enabled/disabled and when (`lastToggledBy`/`lastToggled`);
  *  - delete (apiUsers.js:1087-1103) is by key;
  *  - list (apiUsers.js:966-995) is creator-scoped, created-ascending.
  *
  * [[processOnce]] is the persistent twin of
  * [[CronQueries.processOnce]]: it loads the store, advances every
  * enabled query, and writes the moved watermarks
  * (lpValue/count/lastRun/lastNotified) back — so `lpValue` survives a
  * restart, which is the whole point of the reference keeping it in ES
  * (viewer.js:2199-2260 processCronQuery reads and re-saves it).
  * Replaying a pass with the same `nowSec` is a no-op: every query's
  * watermark already sits at `nowSec`.
  */
object CronStore {

  final case class StoredCronQuery(
      key: String,
      name: String,
      expression: String,
      tags: Seq[String],
      action: String = "tag",
      creator: String = "anonymous",
      description: String = "",
      notifier: String = "", // empty = no notifier
      enabled: Boolean = true,
      created: Long = 0L,
      lpValue: Long = 0L,
      lastRun: Long = 0L,
      count: Long = 0L,
      lastNotified: Long = 0L,
      lastNotifiedCount: Long = 0L,
      lastToggledBy: String = "",
      lastToggled: Long = 0L)

  def sanitizeKey(name: String): String =
    name.replaceAll("[^-a-zA-Z0-9_: ]", "").trim

  def readAll(spark: SparkSession, path: String): Seq[StoredCronQuery] =
    graft.model.TinyTable.read[StoredCronQuery](spark, path)(
      Encoders.product[StoredCronQuery])

  private def writeAll(spark: SparkSession, path: String,
      rows: Seq[StoredCronQuery]): Unit =
    graft.model.TinyTable.write(spark, path, rows,
      "cronqueries")(Encoders.product[StoredCronQuery])

  /** getUserCron: the creator's queries, oldest first. */
  def list(spark: SparkSession, path: String,
      creator: String): Seq[StoredCronQuery] =
    readAll(spark, path).filter(_.creator == creator)
      .sortBy(q => (q.created, q.key))

  /** createUserCron (apiUsers.js:1006-1077). `sinceHours == -1` starts
    * the watermark at the store's oldest session (`minTimestampSec`,
    * the reference's `Db.getMinValue(timestamp)`); otherwise `nowSec -
    * 3600*sinceHours`, never older than the store. A store-less caller
    * (no sessions yet) starts at `nowSec`, like the reference's
    * minTimestamp fallback.
    */
  def create(spark: SparkSession, path: String, creator: String,
      name: String, expression: String, tags: Seq[String],
      action: String = "tag", description: String = "",
      notifier: String = "", sinceHours: Long = 0L,
      nowSec: Long = 0L,
      minTimestampSec: Option[Long] = None): StoredCronQuery = {
    require(name.trim.nonEmpty, "Missing query name")
    require(expression.trim.nonEmpty, "Missing query expression")
    require(action.trim.nonEmpty, "Missing query action")
    require(tags.nonEmpty, "Missing query tag(s)")
    val all = readAll(spark, path)
    val base = {
      val k = sanitizeKey(name)
      if (k.nonEmpty) k else "query"
    }
    val taken = all.map(_.key).toSet
    val key = if (!taken(base)) base
      else Iterator.from(2).map(i => s"$base-$i").find(!taken(_)).get
    val minTs = minTimestampSec.getOrElse(nowSec)
    val lp =
      if (sinceHours == -1L) minTs
      else math.max(minTs, nowSec - 3600L * math.max(0L, sinceHours))
    val q = StoredCronQuery(key = key, name = name, expression = expression,
      tags = tags, action = action,
      creator = if (creator.nonEmpty) creator else "anonymous",
      description = description, notifier = notifier,
      created = nowSec, lpValue = lp, lastRun = lp)
    writeAll(spark, path, all :+ q)
    q
  }

  /** updateUserCron (apiUsers.js:1114-1183): editable fields replaced
    * (description/notifier cleared when omitted, exactly like the
    * reference's `notifier: undefined, description: ''` doc);
    * watermark/count/creator/created preserved; an enabled flip records
    * the toggling actor and time. Mutation is owner-or-admin, the same
    * discipline as every sibling config store ([[Shortcuts]],
    * [[ViewsStore]]) and the reference's creator-scoped queries.
    */
  def update(spark: SparkSession, path: String, actorId: String,
      key: String, name: String, expression: String, tags: Seq[String],
      action: String, enabled: Boolean, description: String = "",
      notifier: String = "", nowSec: Long = 0L,
      actorIsAdmin: Boolean = false): StoredCronQuery = {
    require(key.nonEmpty, "Missing query key")
    require(name.trim.nonEmpty, "Missing query name")
    require(expression.trim.nonEmpty, "Missing query expression")
    require(action.trim.nonEmpty, "Missing query action")
    require(tags.nonEmpty, "Missing query tag(s)")
    val all = readAll(spark, path)
    val old = all.find(_.key == key).getOrElse(
      throw new NoSuchElementException(s"Query $key not found"))
    if (old.creator != actorId && !actorIsAdmin)
      throw new IllegalStateException(
        s"Query $key belongs to ${old.creator}")
    val toggled = old.enabled != enabled
    val q = old.copy(name = name, expression = expression, tags = tags,
      action = action, enabled = enabled, description = description,
      notifier = notifier,
      lastToggledBy = if (toggled) actorId else old.lastToggledBy,
      lastToggled = if (toggled) nowSec else old.lastToggled)
    writeAll(spark, path, all.map(x => if (x.key == key) q else x))
    q
  }

  /** deleteUserCron (apiUsers.js:1087-1103); owner-or-admin like
    * [[update]].
    */
  def delete(spark: SparkSession, path: String, actorId: String,
      key: String, actorIsAdmin: Boolean = false): Unit = {
    require(key.nonEmpty, "Missing query key")
    val all = readAll(spark, path)
    val old = all.find(_.key == key).getOrElse(
      throw new NoSuchElementException(s"Query $key not found"))
    if (old.creator != actorId && !actorIsAdmin)
      throw new IllegalStateException(
        s"Query $key belongs to ${old.creator}")
    writeAll(spark, path, all.filterNot(_.key == key))
  }

  private[query] def toCronQuery(s: StoredCronQuery): CronQueries.CronQuery =
    CronQueries.CronQuery(name = s.name, expression = s.expression,
      tags = s.tags, enabled = s.enabled, lpValue = s.lpValue,
      count = s.count, action = s.action, creator = s.creator,
      notifier = Option(s.notifier).filter(_.nonEmpty),
      lastNotified = s.lastNotified,
      lastNotifiedCount = s.lastNotifiedCount)

  /** One store-backed scheduler pass: load, advance every enabled query
    * via [[CronQueries.processOnce]], persist the moved state. The
    * store round-trip is what the reference's processCronQuery does per
    * query against ES (read `lpValue`, process windows, write back).
    * Returns the persisted post-pass rows.
    */
  def processOnce(spark: SparkSession, sessionPath: String,
      storePath: String, nowSec: Long,
      chunkSecs: Long = 86400L,
      notifiers: Map[String, Notifier] = Map.empty,
      clusters: Map[String, Forward.Cluster] = Map.empty,
      shortcutsPath: Option[String] = None,
      forwardBatch: Long = 1000L): Seq[StoredCronQuery] = {
    val all = readAll(spark, storePath)
    if (all.isEmpty) return Nil
    val advanced = CronQueries.processOnce(spark, sessionPath,
      all.map(toCronQuery), nowSec, chunkSecs, notifiers, clusters,
      shortcutsPath, forwardBatch)
    // processOnce maps order-preserving, so zip merges state by position —
    // but nothing else pins that contract, so assert it: a future
    // filter/reorder inside CronQueries.processOnce must fail loudly here
    // rather than silently cross-wire watermarks between stored queries.
    require(advanced.size == all.size,
      s"cron state misalignment: ${all.size} stored vs ${advanced.size} advanced")
    val merged = all.zip(advanced).map { case (s, a) =>
      require(a.name == s.name,
        s"cron state misalignment: stored '${s.name}' paired with '${a.name}'")
      if (!s.enabled) s
      else s.copy(lpValue = a.lpValue, count = a.count,
        lastRun = if (a.lpValue != s.lpValue) nowSec else s.lastRun,
        lastNotified = a.lastNotified,
        lastNotifiedCount = a.lastNotifiedCount)
    }
    if (merged != all) writeAll(spark, storePath, merged)
    merged
  }
}
