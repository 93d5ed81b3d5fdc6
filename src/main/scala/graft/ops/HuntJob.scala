package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.SessionBuilder.SessionRow

/** Hunt job lifecycle — the resumable background form of [[Hunt]]
  * (reference: viewer/apiHunts.js:370-580 runHuntJob / processHuntJobs):
  * the reference runs hunts as ES-persisted jobs batched by session,
  * checkpointing `lastPacketTime` as it goes, pausable by flipping the
  * job's status (the runner polls it every 2 s), paused-with-error on
  * failure, and notifier-alerted on completion. At 100 TB a hunt WILL be
  * interrupted; a one-shot scan would restart from zero.
  *
  * This module re-expresses that as a cursor over the session stream:
  * sessions are processed in `(lastPacket, sessionId, segmentSeq)` order
  * in bounded batches; after each batch the matched keys are appended to
  * `<huntDir>/matches` (parquet) and the cursor + counters checkpoint to
  * `<huntDir>/state.properties` (written atomically: temp + move). The
  * reference keeps only `lastPacketTime` and re-scans equal-timestamp
  * ties on restart (apiHunts.js:556 `gte: hunt.lastPacketTime`); the
  * full triple cursor here resumes exactly, and because the match log is
  * keyed, a crash BETWEEN the match append and the state write merely
  * re-appends the same keys — [[matches]] reads distinct, so recovery is
  * idempotent either way.
  *
  * Scale: each batch is a `TakeOrdered(batchSize)` over the
  * cursor-filtered sessions — the sort is bounded by the batch, never
  * global — and the packet I/O inside the batch is [[Hunt.run]]'s
  * seek-only reads. State is O(1) per hunt regardless of corpus size.
  */
object HuntJob {

  final case class State(
      huntId: String,
      name: String,
      status: String, // queued | running | paused | finished
      searchedSessions: Long = 0L,
      matchedSessions: Long = 0L,
      totalSessions: Long = -1L, // -1 = not yet counted
      // exclusive resume cursor: the last processed session key
      lastPacketTime: Long = Long.MinValue,
      lastSessionId: String = "",
      lastSegmentSeq: Long = Long.MinValue,
      // store-backed hunts ([[processStore]]) walk day partitions in
      // order; the cursor day makes each batch scan ONE partition and a
      // resume re-enter exactly where the crash left off. Empty for
      // frame-based hunts.
      lastDay: String = "",
      errors: Seq[String] = Nil,
      // non-creator users granted access (POST /api/hunt/:id/users)
      users: Seq[String] = Nil,
      // match annotations were withdrawn (removefromsessions)
      removed: Boolean = false)

  private def stateFile(huntDir: String) =
    Paths.get(huntDir, "state.properties")

  def load(huntDir: String): Option[State] = {
    val f = stateFile(huntDir)
    if (!Files.exists(f)) None
    else {
      val p = new java.util.Properties()
      val in = Files.newInputStream(f)
      try p.load(in) finally in.close()
      val nErr = p.getProperty("nErrors", "0").toInt
      Some(State(
        huntId = p.getProperty("huntId"),
        name = p.getProperty("name"),
        status = p.getProperty("status"),
        searchedSessions = p.getProperty("searchedSessions").toLong,
        matchedSessions = p.getProperty("matchedSessions").toLong,
        totalSessions = p.getProperty("totalSessions").toLong,
        lastPacketTime = p.getProperty("lastPacketTime").toLong,
        lastSessionId = p.getProperty("lastSessionId"),
        lastSegmentSeq = p.getProperty("lastSegmentSeq").toLong,
        lastDay = p.getProperty("lastDay", ""),
        errors = (0 until nErr).map(i => p.getProperty(s"error.$i")),
        users = p.getProperty("users", "").split(",").toSeq
          .filter(_.nonEmpty),
        removed = p.getProperty("removed", "false").toBoolean))
    }
  }

  def save(huntDir: String, st: State): Unit = {
    Files.createDirectories(Paths.get(huntDir))
    val p = new java.util.Properties()
    p.setProperty("huntId", st.huntId)
    p.setProperty("name", st.name)
    p.setProperty("status", st.status)
    p.setProperty("searchedSessions", st.searchedSessions.toString)
    p.setProperty("matchedSessions", st.matchedSessions.toString)
    p.setProperty("totalSessions", st.totalSessions.toString)
    p.setProperty("lastPacketTime", st.lastPacketTime.toString)
    p.setProperty("lastSessionId", st.lastSessionId)
    p.setProperty("lastSegmentSeq", st.lastSegmentSeq.toString)
    p.setProperty("lastDay", st.lastDay)
    p.setProperty("users", st.users.mkString(","))
    p.setProperty("removed", st.removed.toString)
    p.setProperty("nErrors", st.errors.size.toString)
    st.errors.zipWithIndex.foreach { case (e, i) =>
      p.setProperty(s"error.$i", e)
    }
    val tmp = Paths.get(huntDir, "state.properties.tmp")
    val out = Files.newOutputStream(tmp)
    try p.store(out, "graft hunt job state") finally out.close()
    Files.move(tmp, stateFile(huntDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Create a new queued hunt (reference POST /api/hunt → status
    * `queued`, picked up by processHuntJobs).
    */
  def create(huntDir: String, huntId: String, name: String): State = {
    val st = State(huntId, name, status = "queued")
    save(huntDir, st)
    st
  }

  /** Flip a running/queued hunt to paused (reference PUT
    * /api/hunt/:id/pause). The runner observes it at its next batch
    * boundary — the analogue of the reference's 2-second status poll.
    */
  def pause(huntDir: String): State = setStatus(huntDir, "paused")

  /** Re-queue a paused hunt (reference PUT /api/hunt/:id/play). Also
    * clears the paused-with-error state so a failed batch is retried.
    */
  def resume(huntDir: String): State = setStatus(huntDir, "queued")

  /** POST /api/hunt/:id/users (apiHunts.js:1035-1080 addUsers): grant
    * hunt visibility to more users. Ids are validated against the user
    * registry (`knownUser`, typically
    * `UsersStore.readAll(...).map(_.userId).toSet`); valid ids are
    * appended set-wise, invalid ones reported back — the reference's
    * `{users, invalidUsers}` answer. All-invalid is an error (404).
    */
  def addUsers(huntDir: String, userIds: Seq[String],
      knownUser: String => Boolean): (State, Seq[String]) = {
    require(userIds.nonEmpty,
      "You must provide users in a comma separated string")
    val st = load(huntDir).getOrElse(
      throw new IllegalStateException(s"no hunt state at $huntDir"))
    val (valid, invalid) = userIds.map(_.trim).filter(_.nonEmpty)
      .partition(knownUser)
    if (valid.isEmpty)
      throw new NoSuchElementException("Unable to validate user IDs provided")
    val next = st.copy(users = (st.users ++ valid).distinct)
    save(huntDir, next)
    (next, invalid)
  }

  /** DELETE /api/hunt/:id/user/:user (apiHunts.js:1090-1117): the user
    * must currently have access.
    */
  def removeUser(huntDir: String, userId: String): State = {
    val st = load(huntDir).getOrElse(
      throw new IllegalStateException(s"no hunt state at $huntDir"))
    if (!st.users.contains(userId))
      throw new NoSuchElementException(
        "That user does not have access to this hunt")
    val next = st.copy(users = st.users.filterNot(_ == userId))
    save(huntDir, next)
    next
  }

  /** PUT /api/hunt/:id/removefromsessions (apiHunts.js:970-1023):
    * withdraw this hunt's match annotations. The reference strips
    * huntId/huntName from every matched session doc; here the
    * annotations live in the hunt's own match log, so the withdrawal is
    * one recursive delete of `matches/` — O(1) metadata work at any
    * store scale — plus the `removed` flag. A hunt with no matches is
    * an error (the reference's 202 "Nothing to do").
    */
  def removeFromSessions(huntDir: String): State = {
    val st = load(huntDir).getOrElse(
      throw new IllegalStateException(s"no hunt state at $huntDir"))
    if (st.matchedSessions == 0)
      throw new IllegalStateException(
        "Nothing to do: this hunt has not matched any sessions.")
    val dir = Paths.get(huntDir, "matches")
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
    val next = st.copy(removed = true)
    save(huntDir, next)
    next
  }

  private def setStatus(huntDir: String, status: String): State = {
    val st = load(huntDir).getOrElse(
      throw new IllegalStateException(s"no hunt state at $huntDir"))
    val next =
      if (st.status == "finished") st // terminal, like the reference
      else st.copy(status = status)
    save(huntDir, next)
    next
  }

  /** Run the hunt forward: up to `maxBatches` batches of `batchSize`
    * sessions each, checkpointing after every batch. Returns the final
    * state. Safe to call repeatedly (and after a crash): a finished or
    * paused hunt returns immediately; anything else continues from the
    * cursor. A batch failure records the error, pauses the hunt
    * (reference pauseHuntJobWithError) and alerts; completion alerts
    * with the reference's matched/searched summary message.
    */
  def process(
      sessions: Dataset[SessionRow], cfg: Hunt.HuntConfig, huntDir: String,
      batchSize: Int = 1000, maxBatches: Int = Int.MaxValue,
      notifier: Notifier = Notifier.Log,
      keys: String => graft.etl.PcapCrypto.FileKeys =
        _ => graft.etl.PcapCrypto.Normal,
      store: graft.etl.PcapStore.Store = graft.etl.PcapStore.Local): State = {
    require(batchSize > 0)
    var st = load(huntDir).getOrElse(
      throw new IllegalStateException(s"no hunt state at $huntDir"))
    if (st.status == "finished" || st.status == "paused") return st
    if (st.totalSessions < 0) {
      try st = st.copy(totalSessions = sessions.count())
      catch { case e: Exception => return pauseError(huntDir, st, e, notifier) }
    }
    // preserve a pause that raced the totalSessions count above
    val raced = load(huntDir)
    if (raced.exists(_.status == "paused")) return raced.get
    st = st.copy(status = "running")
    save(huntDir, st)
    runBatches(sessions, cfg, huntDir, batchSize, maxBatches, notifier,
      keys, store, st, finishOnEmpty = true).st
  }

  /** Outcome of a bounded batch walk over one frame: `exhausted` means
    * an empty batch was seen (the frame has no sessions past the
    * cursor); `stopped` covers pause / error / finished; `budget` means
    * the batch allowance ran out mid-frame.
    */
  private final case class BatchRun(st: State, used: Int, reason: String)

  /** The one pause-with-error path (reference pauseHuntJobWithError):
    * record, checkpoint, alert. Returns the paused state.
    */
  private def pauseError(huntDir: String, st: State, e: Exception,
      notifier: Notifier): State = {
    val paused = st.copy(status = "paused",
      errors = st.errors :+ s"Hunt error: ${e.getMessage}")
    save(huntDir, paused)
    notifier.notify(s"${paused.name} hunt job paused with error",
      s"${e.getMessage} — ${paused.matchedSessions} matched sessions " +
        s"out of ${paused.searchedSessions} searched sessions.")
    paused
  }

  /** Completion: mark finished, checkpoint, alert. */
  private def finish(huntDir: String, st: State,
      notifier: Notifier): State = {
    val fin = st.copy(status = "finished")
    save(huntDir, fin)
    notifier.notify(s"${fin.name} hunt job finished",
      s"${fin.matchedSessions} matched sessions out of " +
        s"${fin.searchedSessions} searched sessions.")
    fin
  }

  private def runBatches(
      sessions: Dataset[SessionRow], cfg: Hunt.HuntConfig, huntDir: String,
      batchSize: Int, maxBatches: Int, notifier: Notifier,
      keys: String => graft.etl.PcapCrypto.FileKeys,
      store: graft.etl.PcapStore.Store,
      st0: State, finishOnEmpty: Boolean): BatchRun = {
    var st = st0
    val matchesDir = Paths.get(huntDir, "matches").toString
    var batches = 0
    var reason = "budget"
    var done = false
    while (!done && batches < maxBatches) {
      // re-read state between batches: an external pause() lands here
      val cur = load(huntDir).get
      if (cur.status != "running") {
        // keep THIS walk's cursor day: an external pause only flips the
        // status byte, it doesn't know about day carving
        st = cur.copy(lastDay = st.lastDay)
        reason = "stopped"; done = true
      } else {
        try {
          val after =
            col("lastPacket") > st.lastPacketTime ||
              (col("lastPacket") === st.lastPacketTime &&
                (col("sessionId") > st.lastSessionId ||
                  (col("sessionId") === st.lastSessionId &&
                    col("segmentSeq") > st.lastSegmentSeq)))
          val batch = sessions.filter(after)
            .orderBy(col("lastPacket"), col("sessionId"), col("segmentSeq"))
            .limit(batchSize)
          val hunted = Hunt.run(batch, cfg, keys, store)
            .select(col("sessionId"), col("segmentSeq").cast("long"),
              col("lastPacket"), col("huntTag"))
            .collect() // bounded by batchSize
          if (hunted.isEmpty) {
            if (finishOnEmpty) {
              st = finish(huntDir, st, notifier)
              reason = "stopped"
            } else reason = "exhausted"
            done = true
          } else {
            val matched = hunted.filter(!_.isNullAt(3))
            if (matched.nonEmpty) {
              val spark = sessions.sparkSession
              import spark.implicits._
              matched.map(r => (r.getString(0), r.getLong(1), r.getString(3)))
                .toSeq.toDF("sessionId", "segmentSeq", "huntTag")
                .coalesce(1)
                .write.mode("append").parquet(matchesDir)
            }
            val last = hunted.map(r =>
              (r.getLong(2), r.getString(0), r.getLong(1))).max
            st = st.copy(
              searchedSessions = st.searchedSessions + hunted.length,
              matchedSessions = st.matchedSessions + matched.length,
              lastPacketTime = last._1, lastSessionId = last._2,
              lastSegmentSeq = last._3)
            // a pause() written DURING this batch must survive the
            // checkpoint save - re-read and preserve an external status
            // change instead of clobbering it with "running"
            load(huntDir).filter(_.status != "running").foreach { ext =>
              st = st.copy(status = ext.status)
              reason = "stopped"; done = true
            }
            save(huntDir, st)
            batches += 1
          }
        } catch {
          case e: Exception =>
            st = pauseError(huntDir, st, e, notifier)
            reason = "stopped"; done = true
        }
      }
    }
    BatchRun(st, batches, reason)
  }

  /** Store-backed hunt: like [[process]], but over a day-partitioned
    * [[graft.etl.SessionStore]] with the cursor walk carved BY PARTITION
    * — each batch's `TakeOrdered` scans exactly one day directory, not
    * the whole store. The frame-based walk re-scans the full store for
    * every `totalSessions/batchSize` batch (the reference pays one
    * indexed ES query per batch; a 100 TB store cannot pay a full scan
    * per 1000 sessions). Processing order is days ascending, then
    * `(lastPacket, sessionId, segmentSeq)` within the day — a different
    * total order than [[process]]'s global one, but the match log and
    * counters are order-independent, and `State.lastDay` makes a crashed
    * walk resume inside the exact partition it died in.
    */
  def processStore(
      spark: SparkSession, storePath: String, cfg: Hunt.HuntConfig,
      huntDir: String, batchSize: Int = 1000,
      maxBatches: Int = Int.MaxValue,
      notifier: Notifier = Notifier.Log,
      keys: String => graft.etl.PcapCrypto.FileKeys =
        _ => graft.etl.PcapCrypto.Normal,
      store: graft.etl.PcapStore.Store = graft.etl.PcapStore.Local): State = {
    require(batchSize > 0)
    import spark.implicits._
    var st = load(huntDir).getOrElse(
      throw new IllegalStateException(s"no hunt state at $huntDir"))
    if (st.status == "finished" || st.status == "paused") return st
    // partition listing + parquet-footer count: metadata-scale work
    val days =
      try listDays(spark, storePath)
      catch { case e: Exception => return pauseError(huntDir, st, e, notifier) }
    if (st.totalSessions < 0) {
      try st = st.copy(totalSessions =
        if (days.isEmpty) 0L
        else graft.etl.SessionStore.read(spark, storePath).count())
      catch { case e: Exception => return pauseError(huntDir, st, e, notifier) }
    }
    val raced = load(huntDir)
    if (raced.exists(_.status == "paused")) return raced.get
    st = st.copy(status = "running")
    save(huntDir, st)
    if (days.isEmpty) return finish(huntDir, st, notifier)
    val todo = if (st.lastDay.isEmpty) days else days.filter(_ >= st.lastDay)
    // the cursor day (and everything after it) may have been expired
    // from the store since the crash: nothing left to scan is a
    // completed hunt, not a forever-'running' one
    if (todo.isEmpty) return finish(huntDir, st, notifier)
    var remaining = maxBatches
    var stopped = false
    for (day <- todo if !stopped && remaining > 0) {
      if (day != st.lastDay) {
        // fresh partition: reset the in-day triple, record the day so a
        // crash resumes here
        st = st.copy(lastDay = day, lastPacketTime = Long.MinValue,
          lastSessionId = "", lastSegmentSeq = Long.MinValue)
        save(huntDir, st)
      }
      val frame = graft.etl.SessionStore.read(spark, storePath)
        .filter(col("day") === day)
        .drop("day")
        .as[SessionRow]
      val out = runBatches(frame, cfg, huntDir, batchSize, remaining,
        notifier, keys, store, st,
        finishOnEmpty = day == todo.last)
      st = out.st
      remaining -= out.used
      if (out.reason == "stopped") stopped = true
      else if (out.reason == "budget" && remaining <= 0) stopped = true
    }
    st
  }

  /** Day partition keys of a session store, from the directory listing
    * only — no data files touched.
    */
  private def listDays(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("day="))
      .map(_.stripPrefix("day="))
      .sorted
  }

  /** The accumulated match log: distinct (sessionId, segmentSeq,
    * huntTag) keys — distinct because crash recovery may re-append a
    * batch (see class doc).
    */
  def matches(spark: SparkSession, huntDir: String): DataFrame = {
    val dir = Paths.get(huntDir, "matches")
    if (!Files.exists(dir)) {
      import spark.implicits._
      Seq.empty[(String, Long, String)]
        .toDF("sessionId", "segmentSeq", "huntTag")
    } else
      spark.read.parquet(dir.toString)
        .select("sessionId", "segmentSeq", "huntTag").distinct()
  }
}
