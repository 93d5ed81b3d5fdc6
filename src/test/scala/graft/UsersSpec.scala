package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.FieldRegistry
import graft.query.{User, Users}

/** User/permission model (viewer.js:553-570 checkPermissions,
  * molochparser.jison:308-321 requiredRight enforcement).
  */
class UsersSpec extends AnyFunSuite with SparkSpecBase {

  private val basic = User("alice")
  private val emailUser = User("bob", emailSearch = true)

  test("checkPermissions: positive must be held, inverse must be unset") {
    assert(Users.checkPermissions(basic, Seq("webEnabled")).isEmpty)
    assert(Users.checkPermissions(basic, Seq("emailSearch")).isDefined)
    assert(Users.checkPermissions(emailUser,
      Seq("webEnabled", "emailSearch")).isEmpty)
    assert(Users.checkPermissions(basic, Seq("hideStats")).isEmpty)
    assert(Users.checkPermissions(basic.copy(hideStats = true),
      Seq("hideStats")).isDefined)
    assert(Users.checkPermissions(
      basic.copy(disablePcapDownload = true),
      Seq("webEnabled", "disablePcapDownload")).isDefined)
  }

  test("email fields require emailSearch: direct query throws, meta fan-out skips") {
    import spark.implicits._
    val d = Seq((1L, Seq("mail.example.com"), Seq("x@example.com")),
      (2L, Seq("other.org"), Seq.empty[String]))
      .toDF("id", "emailHost", "emailSrc")
      .withColumn("httpHost",
        when(col("id") === 2, array(lit("web.example.net")))
          .otherwise(array(lit("mail.example.com"))))
      .withColumn("dnsQname", array().cast("array<string>"))
      .withColumn("quicHost", array().cast("array<string>"))
      .withColumn("dnsMailserverHost", array().cast("array<string>"))
      .withColumn("dnsNameserverHost", array().cast("array<string>"))
      .withColumn("smbHost", array().cast("array<string>"))
      .withColumn("socksHost", lit(null).cast("string"))
      .withColumn("dhcpHost", array().cast("array<string>"))
      .withColumn("oracleHost", lit(null).cast("string"))
    val noRight = Users.compilerFor(basic, FieldRegistry.sessions,
      FieldRegistry.sessionCol)
    val withRight = Users.compilerFor(emailUser, FieldRegistry.sessions,
      FieldRegistry.sessionCol)
    // direct email query: denied vs allowed
    val ex = intercept[IllegalArgumentException](
      noRight.compile("email.src == x@example.com"))
    assert(ex.getMessage.contains("permission denied"))
    assert(d.filter(withRight.compile("email.src == x@example.com"))
      .count() == 1)
    // the .cnt companion inherits the gate
    intercept[IllegalArgumentException](
      noRight.compile("email.src.cnt >= 1"))
    // host meta fan-out: both users match via httpHost; only the
    // emailSearch user also matches rows whose ONLY hostname is email's
    val d2 = d.withColumn("httpHost",
      when(col("id") === 1, array().cast("array<string>"))
        .otherwise(col("httpHost")))
    assert(d2.filter(noRight.compile("host == mail.example.com"))
      .count() == 0)
    assert(d2.filter(withRight.compile("host == mail.example.com"))
      .count() == 1)
  }

  test("applyTo injects forced expression, time limit, views and shortcuts") {
    val u = User("carol",
      expression = Some("type == purchase"),
      timeLimitHours = Some(72),
      views = Map("big" -> "value >= 100"),
      shortcuts = Map("vips" -> Seq("1", "2")))
    val b = Users.applyTo(
      graft.query.SessionQueryBuilder(
        Tables.load(spark, sf, "events"), FieldRegistry.events,
        firstCol = "ts", lastCol = "ts"), u)
    assert(b.forcedStr.contains("type == purchase"))
    assert(b.timeLimitHours.contains(72L))
    assert(b.views == u.views && b.shortcuts == u.shortcuts)
  }

  test("facade enforces requiredRight: email query denied without emailSearch") {
    // the round-4 gap: expressions compiled through the FACADE (not just
    // Users.compilerFor) must enforce emailSearch like the reference's
    // buildSessionQuery, which always parses with req.user flags
    val base = graft.query.SessionQueryBuilder(
      spark.emptyDataFrame, FieldRegistry.sessions)
    val denied = Users.applyTo(base, basic)
      .expression("email.src == x@example.com")
    val ex = intercept[IllegalArgumentException](denied.frame)
    assert(ex.getMessage.contains("permission denied"))
    // with the right, compilation proceeds past the gate
    val allowed = Users.applyTo(base, emailUser)
      .expression("email.src == x@example.com")
    val ex2 = intercept[Exception](allowed.frame.count())
    assert(!ex2.getMessage.contains("permission denied"))
  }
}
