package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Notifier, NotifierStore}
import graft.query.ViewsStore

/** Notifier registry CRUD (apiNotifiers.js) and saved-view persistence
  * (apiUsers.js:651-860).
  */
class NotifierViewsStoreSpec extends AnyFunSuite with SparkSpecBase {

  private def tmp(p: String) =
    Files.createTempDirectory(p).resolve("store").toString

  test("notifier CRUD: admin gate, type/field validation, sensitive strip") {
    val path = tmp("graft-notif")
    intercept[IllegalStateException] {
      NotifierStore.create(spark, path, "bob", actorIsAdmin = false,
        "n", "slack", Map("slackWebhookUrl" -> "http://x"), 1L)
    }
    intercept[IllegalArgumentException] { // unknown type
      NotifierStore.create(spark, path, "admin", actorIsAdmin = true,
        "n", "pager", Map(), 1L)
    }
    intercept[IllegalArgumentException] { // missing required field
      NotifierStore.create(spark, path, "admin", actorIsAdmin = true,
        "n", "twilio", Map("accountSid" -> "x"), 1L)
    }
    val n = NotifierStore.create(spark, path, "admin", actorIsAdmin = true,
      "ops alert!", "slack", Map("slackWebhookUrl" -> "http://hook"), 5L)
    assert(n.name == "ops alert") // [^-a-zA-Z0-9_: ] stripped, space kept
    intercept[IllegalArgumentException] { // duplicate
      NotifierStore.create(spark, path, "admin", actorIsAdmin = true,
        "ops alert", "slack", Map("slackWebhookUrl" -> "http://h2"), 6L)
    }

    // non-admin listing: name+type only, no field values
    val visible = NotifierStore.list(spark, path, actorIsAdmin = false)
    assert(visible.map(v => (v.name, v.ntype)) == Seq(("ops alert", "slack")))
    assert(visible.head.fieldValues.isEmpty && visible.head.user.isEmpty)
    assert(NotifierStore.list(spark, path, actorIsAdmin = true)
      .head.fields("slackWebhookUrl") == "http://hook")

    val up = NotifierStore.update(spark, path, actorIsAdmin = true,
      "ops alert", "slack", Map("slackWebhookUrl" -> "http://new"))
    assert(up.fields("slackWebhookUrl") == "http://new")
    intercept[NoSuchElementException] {
      NotifierStore.delete(spark, path, actorIsAdmin = true, "nope")
    }
    NotifierStore.delete(spark, path, actorIsAdmin = true, "ops alert")
    assert(NotifierStore.readAll(spark, path).isEmpty)
  }

  test("issueAlert resolves stored configs; unknown names never throw") {
    val path = tmp("graft-notif2")
    NotifierStore.create(spark, path, "admin", actorIsAdmin = true,
      "mem", "slack", Map("slackWebhookUrl" -> "http://hook"), 1L)
    val sink = new Notifier.Memory
    assert(NotifierStore.issueAlert(spark, path, "mem", "hunt done",
      "5 matches", _ => sink))
    assert(sink.alerts == Seq(("hunt done", "5 matches")))
    assert(!NotifierStore.issueAlert(spark, path, "ghost", "t", "m"))
    assert(NotifierStore.test(spark, path, "mem", _ => sink))
    assert(sink.alerts(1) == (("Test alert", "Test alert")))
    // asMap bridges into the cron/hunt notifier consumers
    val m = NotifierStore.asMap(spark, path, _ => sink)
    assert(m.keySet == Set("mem"))
  }

  test("views: scoping, shared merge precedence, toggleShare, Q15 compile") {
    val path = tmp("graft-views")
    ViewsStore.create(spark, path, "alice", "errors", "type == error")
    // same name allowed for another user's OWN scope
    ViewsStore.create(spark, path, "bob", "errors", "type == click")
    intercept[IllegalArgumentException] { // dup within own scope
      ViewsStore.create(spark, path, "alice", "errors", "x")
    }
    ViewsStore.create(spark, path, "carol", "big", "value > 100",
      shared = true)

    // merge: own + shared; own wins on collision with shared
    ViewsStore.create(spark, path, "dave", "big", "value > 999")
    assert(ViewsStore.forUser(spark, path, "alice") ==
      Map("errors" -> "type == error", "big" -> "value > 100"))
    assert(ViewsStore.forUser(spark, path, "dave")("big") == "value > 999")

    // shared mutation needs admin or creator
    intercept[IllegalStateException] {
      ViewsStore.delete(spark, path, "alice", actorIsAdmin = false,
        "big", shared = true)
    }
    ViewsStore.update(spark, path, "carol", actorIsAdmin = false,
      "big", shared = true, newExpression = "value > 150")
    assert(ViewsStore.forUser(spark, path, "alice")("big") == "value > 150")

    // toggleShare moves scopes and checks target collisions
    intercept[IllegalArgumentException] { // dave's 'big' would collide
      ViewsStore.toggleShare(spark, path, "dave", actorIsAdmin = false,
        "big", share = true)
    }
    val moved = ViewsStore.toggleShare(spark, path, "alice",
      actorIsAdmin = false, "errors", share = true)
    assert(moved.shared)
    // bob's own 'errors' still wins for bob; alice now sees hers shared
    assert(ViewsStore.forUser(spark, path, "bob")("errors") == "type == click")
    assert(ViewsStore.forUser(spark, path, "eve")("errors") == "type == error")

    // Q15 end-to-end: compile a view == query with the stored map
    val c = new graft.expr.Compiler(graft.model.FieldRegistry.events,
      now = SparkEntry.now,
      views = ViewsStore.forUser(spark, path, "eve"))
    val ev = Tables.load(spark, sf, "events")
    val n = ev.filter(c.compile("view == errors")).count()
    assert(n > 0 && n == ev.filter(col("event_type") === "error").count())
  }
}
