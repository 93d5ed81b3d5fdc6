package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{Users, UsersStore}
import graft.query.UsersStore.StoredUser

/** Store-backed user accounts (apiUsers.js) + the pass2store /
  * store2ha1 credential scheme (config.js:99-142).
  */
class UsersStoreSpec extends AnyFunSuite with SparkSpecBase {

  private def path() =
    Files.createTempDirectory("graft-users").resolve("users").toString

  test("pass2store: legacy aes192 form matches the OpenSSL vector; both styles round-trip") {
    // openssl enc -aes-192-cbc -md md5 -nosalt -pass pass:password over
    // md5('alice:Moloch:s3cret') = 13a479127176bff252b65bcb5a16e32e
    val legacy = UsersStore.pass2store("alice", "s3cret", aes256 = false)
    assert(legacy ==
      "3cdb4ad18d0ff3044b4887ff1df4a596" +
      "0e14f7784f27974e172d3173a41ffa64" +
      "897aea8515c8e2c5eb934b3449794a7e")
    assert(UsersStore.store2ha1(legacy) == "13a479127176bff252b65bcb5a16e32e")

    val modern = UsersStore.pass2store("alice", "s3cret")
    assert(modern.matches("[0-9a-f]{32}\\.[0-9a-f]+"))
    assert(UsersStore.store2ha1(modern) == "13a479127176bff252b65bcb5a16e32e")
    // random IV: two encryptions differ, both decrypt to the same HA1
    val modern2 = UsersStore.pass2store("alice", "s3cret")
    assert(modern != modern2 &&
      UsersStore.store2ha1(modern2) == UsersStore.store2ha1(modern))
  }

  test("user CRUD: admin gates, uniqueness, password checks, self-delete refusal") {
    val p = path()
    intercept[IllegalStateException] { // non-admin cannot create
      UsersStore.create(spark, p, actorIsAdmin = false,
        StoredUser("bob", "Bob", ""), "pw")
    }
    val bob = UsersStore.create(spark, p, actorIsAdmin = true,
      StoredUser("bob", "Bob", "", emailSearch = true), "hunter2")
    intercept[IllegalArgumentException] { // duplicate id
      UsersStore.create(spark, p, actorIsAdmin = true,
        StoredUser("bob", "Bob2", ""), "x")
    }
    assert(UsersStore.validatePassword(bob, "hunter2"))
    assert(!UsersStore.validatePassword(bob, "wrong"))

    // self-update of non-permission fields ok; permission flip needs admin
    UsersStore.update(spark, p, "bob", actorIsAdmin = false,
      bob.copy(userName = "Robert"))
    intercept[IllegalStateException] {
      UsersStore.update(spark, p, "bob", actorIsAdmin = false,
        bob.copy(createEnabled = true))
    }
    val promoted = UsersStore.update(spark, p, "admin", actorIsAdmin = true,
      bob.copy(userName = "Robert", createEnabled = true))
    assert(promoted.createEnabled)
    // update never silently changes the password
    assert(UsersStore.validatePassword(
      UsersStore.readAll(spark, p).find(_.userId == "bob").get, "hunter2"))

    // password change: wrong current refused; admin reset skips the check
    intercept[IllegalStateException] {
      UsersStore.changePassword(spark, p, actorIsAdmin = false, "bob",
        Some("wrong"), "newpw")
    }
    UsersStore.changePassword(spark, p, actorIsAdmin = false, "bob",
      Some("hunter2"), "newpw")
    assert(UsersStore.validatePassword(
      UsersStore.readAll(spark, p).find(_.userId == "bob").get, "newpw"))
    UsersStore.changePassword(spark, p, actorIsAdmin = true, "bob",
      None, "resetpw")

    // listing is admin-only, searchable
    UsersStore.create(spark, p, actorIsAdmin = true,
      StoredUser("carol", "Carol", ""), "pw")
    intercept[IllegalStateException] {
      UsersStore.list(spark, p, actorIsAdmin = false)
    }
    assert(UsersStore.list(spark, p, actorIsAdmin = true)
      .map(_.userId) == Seq("bob", "carol"))
    assert(UsersStore.list(spark, p, actorIsAdmin = true,
      searchTerm = Some("CAR")).map(_.userId) == Seq("carol"))

    // deletes: self-delete refused, admin-only
    intercept[IllegalStateException] {
      UsersStore.delete(spark, p, "bob", actorIsAdmin = true, "bob")
    }
    UsersStore.delete(spark, p, "admin", actorIsAdmin = true, "carol")
    assert(UsersStore.list(spark, p, actorIsAdmin = true)
      .map(_.userId) == Seq("bob"))
  }

  test("readAll tolerates stores written before settings/welcomeMsgNum existed") {
    // a pre-upgrade table: same rows minus the columns added later
    val p = path()
    UsersStore.create(spark, p, actorIsAdmin = true,
      UsersStore.StoredUser("old-user", "Old User", ""), "pw")
    val narrowed = spark.read.parquet(p)
      .drop("settings", "welcomeMsgNum")
    val tmp = p + "-narrow"
    narrowed.write.parquet(tmp)
    val back = UsersStore.readAll(spark, tmp)
    assert(back.map(_.userId) == Seq("old-user"))
    assert(back.head.settings == Map.empty[String, String])
    assert(back.head.welcomeMsgNum == 1L) // domain default, not type zero
    // and every operation over the old store works, not just the read
    assert(UsersStore.getSettings(spark, tmp, "old-user") ==
      UsersStore.settingDefaults)
  }

  test("stored account feeds the query facade with its permissions") {
    val p = path()
    UsersStore.create(spark, p, actorIsAdmin = true,
      StoredUser("dave", "Dave", "", emailSearch = false,
        expression = "node == a1", timeLimitHours = 24), "pw")
    val stored = UsersStore.readAll(spark, p).head
    val u = UsersStore.toUser(stored)
    assert(u.expression.contains("node == a1"))
    assert(u.timeLimitHours.contains(24L))
    assert(!u.rights.contains("emailSearch"))
    // the facade's compiler denies email fields for this account
    val c = Users.compilerFor(u, graft.model.FieldRegistry.sessions,
      graft.model.FieldRegistry.sessionCol, SparkEntry.now)
    val e = intercept[IllegalArgumentException] {
      c.compile("email.src == x@y.com")
    }
    assert(e.getMessage.contains("permission denied"))
  }
}
