package graft.query

import java.time.Instant

import org.apache.spark.sql.Column

import graft.expr.Compiler
import graft.model.{FieldRegistry, FileEntry}

/** The viewer's user/permission model (viewer/apiUsers.js:107-170 user
  * fields, viewer/viewer.js:553-570 checkPermissions).
  *
  * Positive permissions gate endpoints (webEnabled, emailSearch,
  * removeEnabled, packetSearch, createEnabled); the four INVERSE
  * permissions deny when SET (hidePcap, hideFiles, hideStats,
  * disablePcapDownload — viewer.js:554-559). Per-user query policy is
  * carried by `expression` (forced ACL predicate ANDed into every
  * search, viewerUtils.js:239-249) and `timeLimit` (max queryable
  * window in hours, apiSessions.js:1206-1218). Saved views and
  * shortcuts are per-user state handed to the expression parser
  * (apiSessions.js:1343-1352).
  */
final case class User(
    userId: String,
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
    expression: Option[String] = None,
    timeLimitHours: Option[Long] = None,
    views: Map[String, String] = Map.empty,
    shortcuts: Map[String, Seq[String]] = Map.empty) {

  /** The positive rights this user holds, by permission name — the
    * flattened `req.user` flags the reference hands to the parser and
    * checkPermissions.
    */
  def rights: Set[String] = Seq(
    "enabled" -> enabled, "webEnabled" -> webEnabled,
    "createEnabled" -> createEnabled, "emailSearch" -> emailSearch,
    "removeEnabled" -> removeEnabled, "packetSearch" -> packetSearch)
    .collect { case (name, true) => name }.toSet
}

object Users {

  /** Permissions that DENY when set on the user (viewer.js:554-559). */
  val inversePermissions: Set[String] =
    Set("hidePcap", "hideFiles", "hideStats", "disablePcapDownload")

  private def has(user: User, permission: String): Boolean = permission match {
    case "enabled"             => user.enabled
    case "webEnabled"          => user.webEnabled
    case "createEnabled"       => user.createEnabled
    case "emailSearch"         => user.emailSearch
    case "removeEnabled"       => user.removeEnabled
    case "packetSearch"        => user.packetSearch
    case "hidePcap"            => user.hidePcap
    case "hideFiles"           => user.hideFiles
    case "hideStats"           => user.hideStats
    case "disablePcapDownload" => user.disablePcapDownload
    case other =>
      throw new IllegalArgumentException(s"unknown permission $other")
  }

  /** checkPermissions (viewer.js:553-570): every named permission must
    * be held, except inverse permissions which must NOT be set. Returns
    * the denial message (the reference's 403 body) or None when allowed.
    */
  def checkPermissions(user: User, permissions: Seq[String]): Option[String] =
    permissions.collectFirst {
      case p if has(user, p) == inversePermissions.contains(p) =>
        "You do not have permission to access this resource"
    }

  /** An expression compiler carrying this user's rights, views and
    * shortcuts — email-field queries throw "… - permission denied"
    * unless the user holds emailSearch, exactly as the parser does with
    * `yy.emailSearch` (molochparser.jison:308-310).
    */
  def compilerFor(
      user: User, registry: FieldRegistry,
      col: String => Column = org.apache.spark.sql.functions.col,
      now: Instant = Instant.now(),
      files: Seq[FileEntry] = Nil): Compiler =
    new Compiler(registry, col, now, user.shortcuts, user.views,
      files = files, rights = Some(user.rights))

  /** Apply the user's query policy to a session-query facade: forced
    * ACL expression, time-window cap, views and shortcuts.
    */
  def applyTo(builder: SessionQueryBuilder, user: User): SessionQueryBuilder = {
    val b1 = builder.copy(views = user.views, shortcuts = user.shortcuts,
      rights = Some(user.rights))
    val b2 = user.expression.map(b1.forced).getOrElse(b1)
    user.timeLimitHours.map(b2.timeLimit).getOrElse(b2)
  }
}
