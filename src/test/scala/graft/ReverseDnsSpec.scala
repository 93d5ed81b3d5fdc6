package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ReverseDns

/** E43 /api/reversedns (apiMisc.js:176-190). */
class ReverseDnsSpec extends AnyFunSuite {

  test("ptr names follow RFC 1035/3596 reverse forms") {
    assert(ReverseDns.ptrName("1.2.3.4").contains("4.3.2.1.in-addr.arpa"))
    assert(ReverseDns.ptrName("192.0.2.255")
      .contains("255.2.0.192.in-addr.arpa"))
    assert(ReverseDns.ptrName("2001:db8::1").contains(
      "1.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.0.8.b.d.0.1.0.0.2" +
        ".ip6.arpa"))
    assert(ReverseDns.ptrName("not-an-ip").isEmpty)
    assert(ReverseDns.ptrName("example.com").isEmpty,
      "hostnames must never reach the resolver")
    // hex-lookalike hostnames, wrong octet counts, out-of-range and
    // ambiguous-octal octets are NOT literals (reviewed: they would
    // otherwise trigger the forward lookup this endpoint must not make)
    assert(ReverseDns.ptrName("ad.be").isEmpty)
    assert(ReverseDns.ptrName("cafe.df").isEmpty)
    assert(ReverseDns.ptrName("1.2.3.4.5").isEmpty)
    assert(ReverseDns.ptrName("999.0.0.1").isEmpty)
    assert(ReverseDns.ptrName("01.2.3.4").isEmpty)
  }

  test("lookup joins hostnames; failures answer the literal reference string") {
    assert(ReverseDns.lookup("8.8.8.8",
      _ => Seq("dns.google")) == "dns.google")
    assert(ReverseDns.lookup("1.2.3.4",
      _ => Seq("a.example", "b.example")) == "a.example, b.example")
    assert(ReverseDns.lookup("1.2.3.4", _ => Nil) == "reverse error")
    assert(ReverseDns.lookup("1.2.3.4",
      _ => throw new RuntimeException("boom")) == "reverse error")
    // the system resolver in a no-egress sandbox takes the error path,
    // never throws out of lookup
    assert(ReverseDns.lookup("nonsense") == "reverse error")
  }
}
