package graft

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{Ast, CmpOp, DateParse, Parser, Value}
import graft.functions.IpUtil

class ParserSpec extends AnyFunSuite {
  import Ast._

  test("precedence: && binds tighter than ||") {
    val a = Parser.parse("a == 1 || b == 2 && c == 3")
    assert(a == Or(Cmp("a", CmpOp.Eq, Value.Bare("1")),
      And(Cmp("b", CmpOp.Eq, Value.Bare("2")), Cmp("c", CmpOp.Eq, Value.Bare("3")))))
  }

  test("not and parens") {
    val a = Parser.parse("!(a == 1) && b != 2")
    assert(a == And(Not(Cmp("a", CmpOp.Eq, Value.Bare("1"))),
      Cmp("b", CmpOp.Ne, Value.Bare("2"))))
  }

  test("single & and | accepted like the reference lexer") {
    assert(Parser.parse("a == 1 & b == 2") ==
      And(Cmp("a", CmpOp.Eq, Value.Bare("1")), Cmp("b", CmpOp.Eq, Value.Bare("2"))))
  }

  test("quoted strings keep spaces and escapes") {
    assert(Parser.parse("f == \"a b\\\"c\"") ==
      Cmp("f", CmpOp.Eq, Value.Quoted("a b\"c")))
  }

  test("regex value") {
    assert(Parser.parse("f == /ab.c/") == Cmp("f", CmpOp.Eq, Value.Regex("ab.c")))
  }

  test("list value with quoted, wildcard, regex members") {
    val Cmp(_, _, Value.Lst(items)) =
      Parser.parse("f == [a, \"b c\", /d+/, e*]"): @unchecked
    assert(items == Seq(Value.Bare("a"), Value.Quoted("b c"),
      Value.Regex("d+"), Value.Bare("e*")))
  }

  test("regex escapes are preserved; only the delimiter escape collapses") {
    // \d must survive into the pattern — stripping it made /AS\d+/
    // match the literal string "ASd+"
    assert(Parser.parse("f == /AS\\d+/") ==
      Cmp("f", CmpOp.Eq, Value.Regex("AS\\d+")))
    assert(Parser.parse("f == /a\\/b/") ==
      Cmp("f", CmpOp.Eq, Value.Regex("a/b"))) // escaped delimiter
    val Cmp(_, _, Value.Lst(items)) =
      Parser.parse("f == [/1\\.2/, x]"): @unchecked
    assert(items == Seq(Value.Regex("1\\.2"), Value.Bare("x")))
  }

  test("EXISTS! forms") {
    assert(Parser.parse("f == EXISTS!") == Exists("f", negated = false))
    assert(Parser.parse("f != EXISTS!") == Exists("f", negated = true))
  }

  test("cidr value is not a regex") {
    assert(Parser.parse("ip == 10.0.0.0/8") ==
      Cmp("ip", CmpOp.Eq, Value.Bare("10.0.0.0/8")))
  }

  test("= alias for ==") {
    assert(Parser.parse("a = 1") == Cmp("a", CmpOp.Eq, Value.Bare("1")))
  }
}

class DateParseSpec extends AnyFunSuite {
  private val now = Instant.parse("2024-02-15T10:30:45Z")
  private def p(s: String) = DateParse.parseSeconds(s, now)

  test("relative offsets") {
    assert(p("-1h") == now.getEpochSecond - 3600)
    assert(p("-5d") == now.getEpochSecond - 5 * 86400)
    assert(p("+2m") == now.getEpochSecond + 120)
    assert(p("-d") == now.getEpochSecond - 86400) // implicit count 1
  }

  test("snapping") {
    assert(p("@h") == Instant.parse("2024-02-15T10:00:00Z").getEpochSecond)
    assert(p("@d") == Instant.parse("2024-02-15T00:00:00Z").getEpochSecond)
    // 2024-02-15 is a Thursday; week snaps to Sunday 02-11
    assert(p("@w") == Instant.parse("2024-02-11T00:00:00Z").getEpochSecond)
    assert(p("@M") == Instant.parse("2024-02-01T00:00:00Z").getEpochSecond)
    assert(p("@y") == Instant.parse("2024-01-01T00:00:00Z").getEpochSecond)
  }

  test("offset with snap applies snap first") {
    assert(p("-1d@d") == Instant.parse("2024-02-14T00:00:00Z").getEpochSecond)
  }

  test("absolute formats") {
    assert(p("2024/01/10") == Instant.parse("2024-01-10T00:00:00Z").getEpochSecond)
    assert(p("2024/01/10 12:30:00") ==
      Instant.parse("2024-01-10T12:30:00Z").getEpochSecond)
    assert(p("1700000000") == 1700000000L)
  }
}

class IpUtilSpec extends AnyFunSuite {
  test("cidr membership v4") {
    val c = IpUtil.parseCidr("10.0.0.0/8").get
    assert(c.contains(IpUtil.toBytes("10.1.2.3")))
    assert(!c.contains(IpUtil.toBytes("11.1.2.3")))
  }

  test("non-octet-aligned prefix") {
    val c = IpUtil.parseCidr("192.168.0.0/12").get
    assert(c.contains(IpUtil.toBytes("192.175.255.255")))
    assert(!c.contains(IpUtil.toBytes("192.176.0.0")))
  }

  test("shorthand expansion") {
    assert(IpUtil.expandShorthand("10") == "10.0.0.0/8")
    assert(IpUtil.expandShorthand("10.10") == "10.10.0.0/16")
    assert(IpUtil.expandShorthand("10.10.10") == "10.10.10.0/24")
    assert(IpUtil.expandShorthand("10.1.2.3") == "10.1.2.3")
    assert(IpUtil.expandShorthand("10.10/12") == "10.10.0.0/12")
  }

  test("v6") {
    val c = IpUtil.parseCidr("2001:db8::/32").get
    assert(c.contains(IpUtil.toBytes("2001:db8:1::5")))
    assert(!c.contains(IpUtil.toBytes("2001:db9::1")))
  }

  test("v4-mapped canonicalization") {
    assert(IpUtil.canonical(IpUtil.toBytes("1.2.3.4")) == "1.2.3.4")
  }

  test("literal-only parse: hostnames never resolve") {
    assert(IpUtil.toBytes("example.com") == null)
    assert(IpUtil.toBytes("localhost") == null)
    assert(IpUtil.toBytes("a.b.c.d") == null)
    assert(IpUtil.toBytes("256.1.1.1") == null)
    assert(IpUtil.toBytes("1.2.3") == null)
    assert(IpUtil.toBytes("zz::1") == null)
    assert(IpUtil.toBytes("") == null)
    // inet_addr-style bare number kept for shorthand compatibility
    assert(IpUtil.canonical(IpUtil.toBytes("10")) == "0.0.0.10")
  }

  test("sortable bytes order numerically, not lexicographically") {
    def le(a: String, b: String): Boolean = {
      val x = IpUtil.toBytes(a); val y = IpUtil.toBytes(b)
      java.util.Arrays.compareUnsigned(x, y) < 0
    }
    assert(le("9.0.0.1", "10.0.0.0"))  // string compare would invert this
    assert(le("10.0.0.0", "10.0.0.1"))
    assert(le("10.255.255.255", "11.0.0.0"))
    assert(le("255.255.255.255", "::1:0:0:0"))
  }
}

class CommunityIdSpec extends AnyFunSuite {
  import graft.functions.CommunityId
  test("tcp/udp/sctp get ids; icmp and other protocols get null") {
    assert(CommunityId.compute("1.2.3.4", "5.6.7.8", 1122, 80, 6) != null)
    assert(CommunityId.compute("1.2.3.4", "5.6.7.8", 1122, 80, 17) != null)
    assert(CommunityId.compute("1.2.3.4", "5.6.7.8", 1122, 80, 132) != null)
    assert(CommunityId.compute("1.2.3.4", "5.6.7.8", 0, 0, 1) == null)   // icmp
    assert(CommunityId.compute("::1", "::2", 0, 0, 58) == null)          // icmpv6
    assert(CommunityId.compute("1.2.3.4", "5.6.7.8", 0, 0, 47) == null)  // gre
  }

  test("known vector: corelight spec tcp example") {
    // community-id-spec test data: 66.35.250.204:80 ↔ 128.232.110.120:34855 tcp
    assert(CommunityId.compute("128.232.110.120", "66.35.250.204", 34855, 80, 6) ==
      "1:LQU9qZlK+B5F3KDmev6m5PMibrg=")
  }

  test("direction-independent") {
    val a = CommunityId.compute("10.0.0.1", "10.0.0.2", 1000, 2000, 6)
    val b = CommunityId.compute("10.0.0.2", "10.0.0.1", 2000, 1000, 6)
    assert(a == b)
  }
}
