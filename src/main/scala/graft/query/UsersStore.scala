package graft.query

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

import org.apache.spark.sql.{Encoders, SparkSession}

/** Persisted user accounts — the viewer's users CRUD
  * (reference: viewer/apiUsers.js createUser:246-300, updateUser,
  * deleteUser, getUsers listing, updateUserPassword:425-450; password
  * storage viewer/config.js:99-142 pass2store/store2ha1).
  *
  * Credential fidelity: `passStore` holds the HTTP-digest HA1
  * (`md5(userId:realm:password)`, required for digest auth — the
  * reference's comment at config.js:100) encrypted at rest.
  *  - New style (`aes256Encryption`): AES-256-CBC with
  *    `key = sha256(passwordSecret)` and a random IV, stored as
  *    `ivHex.cipherHex` (config.js:103-109).
  *  - Old style: OpenSSL-compatible `aes192` createCipher — key+IV
  *    derived from the secret by one-round-MD5 EVP_BytesToKey, no salt
  *    (config.js:111-116); the derivation already pinned by
  *    [[graft.etl.PcapCrypto.evpBytesToKey]]'s OpenSSL vectors.
  *
  * Like [[Shortcuts]], the table is configuration, not data: whole-table
  * rewrite per mutation is one small task at any session-store scale,
  * and reads are broadcast-sized. Single-writer.
  */
object UsersStore {

  final case class StoredUser(
      userId: String,
      userName: String,
      passStore: String,
      enabled: Boolean = true,
      webEnabled: Boolean = true,
      createEnabled: Boolean = false,
      emailSearch: Boolean = false,
      removeEnabled: Boolean = false,
      packetSearch: Boolean = true,
      hidePcap: Boolean = false,
      hideFiles: Boolean = false,
      hideStats: Boolean = false,
      disablePcapDownload: Boolean = false,
      expression: String = "",
      timeLimitHours: Long = -1L, // -1 = unlimited
      lastUsed: Long = 0L,
      // /api/user/settings blob (apiUsers.js:602-650) — typed as a
      // string map instead of opaque JSON; list-valued settings keep
      // their JSON text as the value
      settings: Map[String, String] = Map.empty,
      welcomeMsgNum: Long = 1L)

  // ----------------------------------------------------------- crypto

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.ISO_8859_1))
      .map("%02x".format(_)).mkString

  private def sha256(s: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.ISO_8859_1))

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  private def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** config.js:99-118. `aes256 = false` reproduces the legacy
    * createCipher('aes192') form (deterministic — no IV).
    */
  def pass2store(userId: String, password: String,
      realm: String = "Moloch", secret: String = "password",
      aes256: Boolean = true,
      rng: java.security.SecureRandom = new java.security.SecureRandom())
      : String = {
    val ha1 = md5hex(s"$userId:$realm:$password")
    val m = ha1.getBytes(StandardCharsets.ISO_8859_1)
    if (aes256) {
      val iv = new Array[Byte](16)
      rng.nextBytes(iv)
      val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(sha256(secret), "AES"),
        new IvParameterSpec(iv))
      hex(iv) + "." + hex(c.doFinal(m))
    } else {
      // EVP_BytesToKey(md5, 1 round, no salt) for aes-192-cbc: 24-byte
      // key + 16-byte IV, exactly node's crypto.createCipher('aes192')
      val (key, iv) = graft.etl.PcapCrypto.evpBytesToKey(
        secret.getBytes(StandardCharsets.ISO_8859_1), 24, 16)
      val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(iv))
      hex(c.doFinal(m))
    }
  }

  /** config.js:121-142: passStore → digest HA1 (both storage styles). */
  def store2ha1(passStore: String, secret: String = "password"): String = {
    val parts = passStore.split("\\.")
    val (key, iv, ct) =
      if (parts.length == 2)
        (sha256(secret), unhex(parts(0)), unhex(parts(1)))
      else {
        val (k, i) = graft.etl.PcapCrypto.evpBytesToKey(
          secret.getBytes(StandardCharsets.ISO_8859_1), 24, 16)
        (k, i, unhex(passStore))
      }
    val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new IvParameterSpec(iv))
    new String(c.doFinal(ct), StandardCharsets.ISO_8859_1)
  }

  /** Digest-auth check: recompute HA1 from the offered password. */
  def validatePassword(user: StoredUser, password: String,
      realm: String = "Moloch", secret: String = "password"): Boolean =
    user.passStore.nonEmpty &&
      store2ha1(user.passStore, secret) ==
        md5hex(s"${user.userId}:$realm:$password")

  // ------------------------------------------------------------ store

  /** Reads tolerate stores written before a field existed (e.g. tables
    * from before `settings`/`welcomeMsgNum`): [[graft.model.TinyTable]]
    * fills absent columns with these defaults instead of throwing on the
    * narrower parquet schema.
    */
  def readAll(spark: SparkSession, path: String): Seq[StoredUser] =
    graft.model.TinyTable.read[StoredUser](spark, path,
      defaults = Map(
        "welcomeMsgNum" -> org.apache.spark.sql.functions.lit(1L)))(
      Encoders.product[StoredUser])

  private def writeAll(spark: SparkSession, path: String,
      rows: Seq[StoredUser]): Unit =
    graft.model.TinyTable.write(spark, path, rows,
      "users")(Encoders.product[StoredUser])

  /** createUser (apiUsers.js:246-300): admin only, userId must be new.
    * `userId` is sanitized like the reference (no leading/trailing
    * space; the reference 403s on missing fields).
    */
  def create(spark: SparkSession, path: String, actorIsAdmin: Boolean,
      user: StoredUser, password: String,
      realm: String = "Moloch", secret: String = "password"): StoredUser = {
    if (!actorIsAdmin) throw new IllegalStateException("Need admin privileges")
    val id = user.userId.trim
    require(id.nonEmpty, "Missing userId")
    require(user.userName.trim.nonEmpty, "Missing userName")
    require(password.nonEmpty, "Missing password")
    val all = readAll(spark, path)
    if (all.exists(_.userId == id))
      throw new IllegalArgumentException(s"User $id already exists")
    val stored = user.copy(userId = id,
      passStore = pass2store(id, password, realm, secret))
    writeAll(spark, path, all :+ stored)
    stored
  }

  /** updateUser: admin, or the user themself for non-permission fields
    * (the reference splits settings vs admin updates; enforced here by
    * refusing permission changes from non-admins).
    */
  def update(spark: SparkSession, path: String, actorId: String,
      actorIsAdmin: Boolean, user: StoredUser): StoredUser = {
    val all = readAll(spark, path)
    val old = all.find(_.userId == user.userId).getOrElse(
      throw new NoSuchElementException(s"User ${user.userId} not found"))
    val permChanged = Seq[StoredUser => Any](
      _.enabled, _.webEnabled, _.createEnabled, _.emailSearch,
      _.removeEnabled, _.packetSearch, _.hidePcap, _.hideFiles,
      _.hideStats, _.disablePcapDownload, _.expression, _.timeLimitHours)
      .exists(f => f(old) != f(user))
    if (!actorIsAdmin && (actorId != user.userId || permChanged))
      throw new IllegalStateException("Need admin privileges")
    val stored = user.copy(passStore = old.passStore) // password via changePassword
    writeAll(spark, path, all.map(u => if (u.userId == user.userId) stored else u))
    stored
  }

  /** updateUserPassword (apiUsers.js:425-450): the user must present
    * their current password unless an admin resets it.
    */
  def changePassword(spark: SparkSession, path: String, actorIsAdmin: Boolean,
      userId: String, currentPassword: Option[String], newPassword: String,
      realm: String = "Moloch", secret: String = "password"): Unit = {
    require(newPassword.nonEmpty, "New password needed")
    val all = readAll(spark, path)
    val old = all.find(_.userId == userId).getOrElse(
      throw new NoSuchElementException(s"User $userId not found"))
    if (!actorIsAdmin) {
      val ok = currentPassword.exists(p =>
        validatePassword(old, p, realm, secret))
      if (!ok) throw new IllegalStateException("Current password mismatch")
    }
    val stored = old.copy(
      passStore = pass2store(userId, newPassword, realm, secret))
    writeAll(spark, path, all.map(u => if (u.userId == userId) stored else u))
  }

  /** The reference's settingDefaults (viewer/internals.js:70-83): what
    * `GET /api/user/settings` answers before a user customizes anything;
    * stored settings shallow-merge over these per key.
    */
  val settingDefaults: Map[String, String] = Map(
    "timezone" -> "local",
    "detailFormat" -> "last",
    "showTimestamps" -> "last",
    "sortColumn" -> "firstPacket",
    "sortDirection" -> "desc",
    "spiGraph" -> "node",
    "connSrcField" -> "source.ip",
    "connDstField" -> "ip.dst:port",
    "numPackets" -> "last",
    "theme" -> "default-theme",
    "manualQuery" -> "false",
    "timelineDataFilters" ->
      """["network.packets","network.bytes","totDataBytes"]""")

  /** getUserSettings (apiUsers.js:602-623): defaults overlaid with the
    * user's stored keys; an unknown or settings-less user gets pure
    * defaults, like the reference's settings-less settingUser.
    */
  def getSettings(spark: SparkSession, path: String,
      userId: String): Map[String, String] =
    settingDefaults ++ readAll(spark, path)
      .find(_.userId == userId).map(_.settings).getOrElse(Map.empty)

  /** updateUserSettings (apiUsers.js:633-650): replace the user's
    * settings wholesale; the auth `token` key is stripped before
    * storage exactly like the reference's `delete settings.token`.
    */
  def updateSettings(spark: SparkSession, path: String, userId: String,
      settings: Map[String, String]): Unit = {
    val all = readAll(spark, path)
    val old = all.find(_.userId == userId).getOrElse(
      throw new NoSuchElementException(s"User $userId not found"))
    val stored = old.copy(settings = settings - "token")
    writeAll(spark, path, all.map(u => if (u.userId == userId) stored else u))
  }

  /** acknowledgeMsg (apiUsers.js:1525-1556): only the user themself can
    * dismiss their welcome message; records the dismissed number.
    */
  def acknowledgeMsg(spark: SparkSession, path: String, actorId: String,
      userId: String, msgNum: Long): Unit = {
    require(msgNum > 0, "Message number required")
    if (actorId != userId)
      throw new IllegalStateException("Can not change other users msg")
    val all = readAll(spark, path)
    val old = all.find(_.userId == userId).getOrElse(
      throw new NoSuchElementException(s"User $userId not found"))
    writeAll(spark, path, all.map(u =>
      if (u.userId == userId) old.copy(welcomeMsgNum = msgNum) else u))
  }

  /** deleteUser: admin only; the reference also refuses self-delete. */
  def delete(spark: SparkSession, path: String, actorId: String,
      actorIsAdmin: Boolean, userId: String): Unit = {
    if (!actorIsAdmin) throw new IllegalStateException("Need admin privileges")
    if (actorId == userId)
      throw new IllegalStateException("Can not delete yourself")
    val all = readAll(spark, path)
    if (!all.exists(_.userId == userId))
      throw new NoSuchElementException(s"User $userId not found")
    writeAll(spark, path, all.filterNot(_.userId == userId))
  }

  /** getUsers listing (admin surface): name-filtered, sorted. */
  def list(spark: SparkSession, path: String, actorIsAdmin: Boolean,
      searchTerm: Option[String] = None): Seq[StoredUser] = {
    if (!actorIsAdmin) throw new IllegalStateException("Need admin privileges")
    readAll(spark, path)
      .filter(u => searchTerm.forall(t =>
        u.userId.toLowerCase.contains(t.toLowerCase) ||
        u.userName.toLowerCase.contains(t.toLowerCase)))
      .sortBy(_.userId)
  }

  /** The query-facade view of a stored account ([[Users.applyTo]]). */
  def toUser(s: StoredUser,
      views: Map[String, String] = Map.empty,
      shortcuts: Map[String, Seq[String]] = Map.empty): User =
    User(s.userId, s.enabled, s.webEnabled, s.createEnabled, s.emailSearch,
      s.removeEnabled, s.packetSearch, s.hidePcap, s.hideFiles, s.hideStats,
      s.disablePcapDownload,
      Option(s.expression).filter(_.nonEmpty),
      Some(s.timeLimitHours).filter(_ >= 0),
      views, shortcuts)
}
