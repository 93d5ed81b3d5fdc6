package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SshParser

/** Differential fuzz of the SSH walker against an independent second
  * transcription of the reference's machine (capture/parsers/ssh.c +
  * capture/bsb.h) — the ASN.1/HTTP/SMTP/DNS/TLS pattern. The
  * production walker is graft.etl.SshParser; the model below is a
  * re-derivation written from the C with a different structure.
  *
  * Quirk surface both transcribe (and the generator aims at):
  *  - every chunk starting "SSH" and longer than 3 bytes is a banner:
  *    version = bytes to the first LF (trailing CR dropped), lowered;
  *    NO LF records nothing; the rest of the chunk (pipelined binary
  *    bytes) is DISCARDED; a 3-byte "SSH" chunk is NOT a banner and
  *    feeds the binary buffer;
  *  - per-direction 8196-byte buffers with overflow truncation; a
  *    declared message length < 2 or > 8196 sets a SHARED done flag;
  *  - the KEXINIT hassh walk is bounded by the BUFFER, not the
  *    message: name-lists overrunning the declared length read into
  *    following buffered bytes; any failed needed import suppresses
  *    the hash;
  *  - the host key comes only from code 33 (never 31), base64 of the
  *    length-prefixed blob with no shape validation; code 33 sets done
  *    and leaves the buffer unconsumed;
  *  - packets 6..15 per direction count sizes < 50 / 50..99; past 15
  *    in one direction the parser unregisters, tagging
  *    ssh-reverse-shell iff BOTH directions had more mid-size than
  *    small packets (counting continues even when done).
  */
class SshDifferentialFuzzSpec extends AnyFunSuite {

  // ---------------------------------------------------------------- model

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(b).map(x => f"$x%02x".takeRight(2)).mkString

  private final class MRes {
    var version = List.empty[String]
    var hassh = List.empty[String]
    var hasshServer = List.empty[String]
    var key = List.empty[String]
    var shell = false
  }

  /** the byte-exact keyinit model walk (re-derived from ssh.c:34-117;
    * structured as a wants-table loop, unlike the production
    * transcription's straight-line field sequence)
    */
  private def mKeyinitExact(a: Array[Byte], start: Int, stop: Int,
      isDst: Boolean): Option[String] = {
    var p = start
    var err = false
    var hashErr = false
    val out = new java.io.ByteArrayOutputStream
    def need(n: Long): Boolean =
      if (!err && p + n <= stop) true else { err = true; false }
    def len32(): Long = {
      if (!need(4)) return 0L
      val v = ((a(p) & 0xffL) << 24) | ((a(p + 1) & 0xffL) << 16) |
        ((a(p + 2) & 0xffL) << 8) | (a(p + 3) & 0xffL)
      p += 4; v
    }
    // skip cookie
    if (need(16)) p += 16
    // field 0: kex — export attempted even on failure
    var l = len32()
    if (need(l)) { out.write(a, p, l.toInt); p += l.toInt }
    else if (l != 0) hashErr = true
    out.write(';')
    // field 1: host key algos — skipped
    l = len32(); if (need(l)) p += l.toInt
    // fields 2..7: enc c2s/s2c, mac c2s/s2c, comp c2s/s2c
    val wants = Seq(!isDst, isDst, !isDst, isDst, !isDst, isDst)
    var i = 0
    while (i < 6) {
      l = len32()
      val at = if (need(l)) { val v = p; p += l.toInt; v } else -1
      if (err) return None
      if (wants(i)) {
        if (at >= 0) out.write(a, at, l.toInt) else if (l != 0) hashErr = true
        if (i < 4) out.write(';')
      }
      i += 1
    }
    if (!err && !hashErr) Some(md5hex(out.toByteArray)) else None
  }

  private def mParse(chunks: Seq[(Int, Array[Byte])]): Option[MRes] = {
    val r = new MRes
    val buf = Array.ofDim[Byte](2, 8196)
    val used = new Array[Int](2)
    val pkts = new Array[Int](2)
    val small = new Array[Int](2)
    val mid = new Array[Int](2)
    var done = false
    var unregistered = false
    var found = false
    def isSsh(d: Array[Byte]) =
      d.length >= 3 && d(0) == 'S' && d(1) == 'S' && d(2) == 'H'
    def consume(w: Int, d: Array[Byte]): Unit = {
      if (unregistered) return
      pkts(w) += 1
      if (pkts(w) > 5) {
        if (d.length < 50) small(w) += 1
        else if (d.length < 100) mid(w) += 1
        if (pkts(w) > 15) {
          if (mid(0) > small(0) && mid(1) > small(1)) r.shell = true
          unregistered = true
          return
        }
      }
      if (done) return
      if (d.length > 3 && isSsh(d)) {
        val lf = d.indexWhere(_ == 0x0a)
        val cut = if (lf > 0 && d(lf - 1) == 0x0d) lf - 1 else lf
        if (lf >= 0)
          r.version ::= new String(d, 0, cut,
            StandardCharsets.ISO_8859_1).toLowerCase
        return
      }
      val room = 8196 - used(w)
      val k = math.min(room, d.length)
      System.arraycopy(d, 0, buf(w), used(w), k)
      used(w) += k
      var halt = false
      while (!halt && used(w) > 6) {
        val mLen = ((buf(w)(0) & 0xffL) << 24) | ((buf(w)(1) & 0xffL) << 16) |
          ((buf(w)(2) & 0xffL) << 8) | (buf(w)(3) & 0xffL)
        if (mLen < 2 || mLen > 8196) { done = true; return }
        if (mLen + 4 > used(w)) return
        buf(w)(5) & 0xff match {
          case 20 =>
            mKeyinitExact(buf(w), 6, used(w), isDst = w == 1) match {
              case Some(h) => if (w == 1) r.hasshServer ::= h else r.hassh ::= h
              case None    =>
            }
          case 33 =>
            done = true
            if (used(w) >= 10) {
              val kl = ((buf(w)(6) & 0xffL) << 24) |
                ((buf(w)(7) & 0xffL) << 16) |
                ((buf(w)(8) & 0xffL) << 8) | (buf(w)(9) & 0xffL)
              if (kl <= used(w) - 10)
                r.key ::= java.util.Base64.getEncoder.encodeToString(
                  java.util.Arrays.copyOfRange(buf(w), 10, 10 + kl.toInt))
            }
            halt = true
          case _ =>
        }
        if (!halt) {
          val eat = (mLen + 4).toInt
          used(w) -= eat
          System.arraycopy(buf(w), eat, buf(w), 0, used(w))
        }
      }
    }
    chunks.foreach { case (w, d) =>
      if (!found) { if (isSsh(d)) { found = true; consume(w, d) } }
      else consume(w, d)
    }
    if (found) Some(r) else None
  }

  // ------------------------------------------------------------- compare

  private def compare(chunks: Seq[(Int, Array[Byte])], label: String): Unit = {
    val m = mParse(chunks)
    val p = SshParser.parseChunks(chunks)
    (m, p) match {
      case (None, None) => ()
      case (Some(a), Some(b)) =>
        val mf = Seq("version" -> a.version.reverse.distinct,
          "hassh" -> a.hassh.reverse.distinct,
          "hasshServer" -> a.hasshServer.reverse.distinct,
          "key" -> a.key.reverse.distinct,
          "shell" -> (if (a.shell) Seq("y") else Nil))
        val pf = Seq("version" -> b.version, "hassh" -> b.hassh,
          "hasshServer" -> b.hasshServer, "key" -> b.key,
          "shell" -> (if (b.reverseShell) Seq("y") else Nil))
        val diffs = mf.zip(pf).filter { case ((_, x), (_, y)) => x != y }
        assert(diffs.isEmpty, s"\n[$label]\n" + diffs.map {
          case ((f, x), (_, y)) => s"  $f:\n    model=$x\n    ours =$y"
        }.mkString("\n") + "\nchunks:\n" + chunks.map { case (d, c) =>
          s"  dir$d " + c.take(60).map(x => f"$x%02x").mkString(" ") +
            (if (c.length > 60) s" …(${c.length})" else "")
        }.mkString("\n"))
      case _ => fail(s"[$label] model=${m.isDefined} ours=${p.isDefined}")
    }
  }

  // ------------------------------------------------------------ generator

  private final class Rng(var seed: Long) {
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    def pick[T](xs: Seq[T]): T = xs(nextInt(xs.length))
    def chance(pct: Int): Boolean = nextInt(100) < pct
  }

  private def genChunks(rng: Rng, recipe: StringBuilder)
      : Seq[(Int, Array[Byte])] = {
    val chunks = scala.collection.mutable.ArrayBuffer[(Int, Array[Byte])]()
    def u32(e: java.io.ByteArrayOutputStream, v: Long): Unit = {
      e.write(((v >> 24) & 0xff).toInt); e.write(((v >> 16) & 0xff).toInt)
      e.write(((v >> 8) & 0xff).toInt); e.write((v & 0xff).toInt)
    }
    def strList(e: java.io.ByteArrayOutputStream, s: String,
        lie: Int = 0): Unit = {
      u32(e, s.length.toLong + lie)
      e.write(s.getBytes(StandardCharsets.ISO_8859_1), 0, s.length)
    }
    def banner(dir: Int): Unit = {
      val base = s"SSH-2.0-Fuzz_${rng.nextInt(999)}"
      val tail = rng.nextInt(5) match {
        case 0 => "\r\n"
        case 1 => "\n"
        case 2 => ""      // no LF: nothing recorded
        case 3 => "\nTRAILING-binary-bytes-discarded"
        case _ => "\r\n"
      }
      chunks += ((dir, (base + tail).getBytes(StandardCharsets.ISO_8859_1)))
      recipe.append(s"b$dir ")
    }
    def kexinitMsg(dir: Int): Unit = {
      val body = new java.io.ByteArrayOutputStream
      for (i <- 0 until 16) body.write(i * 3)
      val nLists = rng.pick(Seq(10, 10, 10, 10, 3, 7, 12))
      for (i <- 0 until nLists) {
        val s = s"algo-${rng.nextInt(30)},x${rng.nextInt(9)}"
        val lie = if (rng.chance(12)) rng.pick(Seq(-2, 3, 40, 5000)) else 0
        strList(body, s, lie)
      }
      if (rng.chance(70)) { body.write(0); u32(body, 0) } // flags+reserved
      wrap(dir, 20, body.toByteArray)
      recipe.append(s"kex$dir/$nLists ")
    }
    def keyMsg(dir: Int): Unit = {
      val body = new java.io.ByteArrayOutputStream
      val blob = new java.io.ByteArrayOutputStream
      strList(blob, rng.pick(Seq("ssh-rsa", "ssh-ed25519", "zz")))
      for (_ <- 0 until rng.nextInt(60)) blob.write(rng.nextInt(256))
      val b = blob.toByteArray
      val lie = if (rng.chance(20)) rng.pick(Seq(-3, 5, 4000)) else 0
      u32(body, b.length.toLong + lie)
      body.write(b, 0, b.length)
      wrap(dir, 33, body.toByteArray)
      recipe.append(s"key$dir ")
    }
    def wrap(dir: Int, code: Int, payload: Array[Byte]): Unit = {
      val pad = rng.nextInt(12)
      val e = new java.io.ByteArrayOutputStream
      val declared: Long = rng.nextInt(20) match {
        case 0 => rng.pick(Seq(0L, 1L)) // < 2: done
        case 1 => 8197L + rng.nextInt(100000) // > MAX: done
        case 2 => 0x80000000L + rng.nextInt(1000) // huge u32
        case _ => (1 + 1 + payload.length + pad).toLong
      }
      u32(e, declared)
      e.write(pad); e.write(code)
      e.write(payload, 0, payload.length)
      for (_ <- 0 until pad) e.write(0)
      chunks += ((dir, e.toByteArray))
    }
    def noise(dir: Int): Unit = {
      val n = rng.pick(Seq(3, 30, 60, 80, 120))
      val a = Array.tabulate(n)(i => ((i * 13 + 7) & 0xff).toByte)
      if (rng.chance(30)) { a(0) = 'S'; a(1) = 'S'; a(2) = 'H' } // 3-byte gate
      chunks += ((dir, a))
      recipe.append(s"n$dir ")
    }
    if (!rng.chance(10)) banner(0)
    if (!rng.chance(20)) banner(1)
    if (!rng.chance(15)) kexinitMsg(0)
    if (!rng.chance(15)) kexinitMsg(1)
    if (rng.chance(60)) keyMsg(if (rng.chance(80)) 1 else 0)
    if (rng.chance(30)) kexinitMsg(rng.nextInt(2)) // post-done kexinit
    // reverse-shell shaped tail: many small/mid chunks
    if (rng.chance(40)) {
      recipe.append("tail ")
      for (_ <- 0 until 12 + rng.nextInt(10)) noise(rng.nextInt(2))
    }
    // random chunk merging: coalesce adjacent same-direction chunks
    // (two messages in one delivered packet)
    if (rng.chance(35) && chunks.length >= 2) {
      recipe.append("merge ")
      val i = rng.nextInt(chunks.length - 1)
      if (chunks(i)._1 == chunks(i + 1)._1) {
        val merged = chunks(i)._2 ++ chunks(i + 1)._2
        chunks(i) = (chunks(i)._1, merged)
        chunks.remove(i + 1)
      }
    }
    // random chunk splitting (mid-message deliveries)
    if (rng.chance(35) && chunks.nonEmpty) {
      recipe.append("split ")
      val i = rng.nextInt(chunks.length)
      val (d, c) = chunks(i)
      if (c.length > 2) {
        val cut = 1 + rng.nextInt(c.length - 1)
        chunks(i) = (d, c.take(cut))
        chunks.insert(i + 1, (d, c.drop(cut)))
      }
    }
    // byte mutations
    if (rng.chance(20) && chunks.nonEmpty) {
      recipe.append("mut ")
      val i = rng.nextInt(chunks.length)
      val (d, c) = chunks(i)
      if (c.nonEmpty) {
        val b = c.clone()
        for (_ <- 0 to rng.nextInt(4))
          b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        chunks(i) = (d, b)
      }
    }
    chunks.toSeq
  }

  // --------------------------------------------------------------- tests

  test("generated sessions: walker matches the ssh.c model") {
    // soak knobs: GRAFT_FUZZ_TRIALS=30000 GRAFT_FUZZ_SEED=0x... sbt test
    val nTrials =
      sys.env.get("GRAFT_FUZZ_TRIALS").map(_.toInt).getOrElse(1500)
    val rng = new Rng(sys.env.get("GRAFT_FUZZ_SEED")
      .map(java.lang.Long.decode(_).longValue).getOrElse(0x55aa7eL))
    for (trial <- 0 until nTrials) {
      val recipe = new StringBuilder
      compare(genChunks(rng, recipe), s"trial $trial: $recipe")
    }
  }

  test("pinned ssh.c quirks") {
    def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.ISO_8859_1)
    // 1. banner chunk without LF records nothing; with pipelined binary
    // after the LF the binary part is discarded
    compare(Seq((0, b("SSH-2.0-NoNewline"))), "no-LF banner")
    val pipelined = b("SSH-2.0-X\r\n") ++
      Array[Byte](0, 0, 0, 12, 0, 20) ++ new Array[Byte](10)
    compare(Seq((0, pipelined), (1, b("SSH-2.0-Y\r\n"))),
      "binary after banner discarded")
    val got = SshParser.parseChunks(
      Seq((0, pipelined), (1, b("SSH-2.0-Y\r\n")))).get
    assert(got.hassh.isEmpty,
      "kexinit pipelined behind the banner LF must be discarded")
    // 2. a 3-byte "SSH" chunk is NOT a banner (feeds the buffer)
    compare(Seq((0, b("SSH-2.0-A\n")), (0, "SSH".getBytes)), "SSH 3-byte")
    // 3. code 33 key without validation; code 31 never yields a key
    def msg(code: Int, payload: Array[Byte]): Array[Byte] = {
      val e = new java.io.ByteArrayOutputStream
      val total = 2 + payload.length
      e.write(0); e.write(0); e.write(total >> 8); e.write(total & 0xff)
      e.write(0); e.write(code); e.write(payload, 0, payload.length)
      e.toByteArray
    }
    val blob = Array[Byte](0, 0, 0, 2, 'z', 'z')
    val keyed = {
      val e = new java.io.ByteArrayOutputStream
      e.write(Array[Byte](0, 0, 0, 6), 0, 4); e.write(blob, 0, blob.length)
      e.toByteArray
    }
    val s31 = Seq((0, b("SSH-2.0-C\n")), (1, b("SSH-2.0-S\n")),
      (1, msg(31, keyed)))
    assert(SshParser.parseChunks(s31).get.key.isEmpty,
      "code 31 must not yield a key (reference reads only 33)")
    compare(s31, "code 31 no key")
    val s33 = Seq((0, b("SSH-2.0-C\n")), (1, b("SSH-2.0-S\n")),
      (1, msg(33, keyed)))
    assert(SshParser.parseChunks(s33).get.key ==
      Seq(java.util.Base64.getEncoder.encodeToString(blob)),
      "code 33 blob base64s without validation")
    compare(s33, "code 33 key")
    // 4. declared length < 2 sets the SHARED done flag: the OTHER
    // direction's later kexinit is also ignored
    val poison = Seq((0, b("SSH-2.0-C\n")), (1, b("SSH-2.0-S\n")),
      (0, Array[Byte](0, 0, 0, 0, 0, 0, 0)),
      (1, msg(20, new Array[Byte](60))))
    compare(poison, "shared done flag")
    // 5. reverse-shell heuristic fires only when BOTH directions are
    // mid-size dominated
    def tail(dir: Int, size: Int, n: Int) =
      (0 until n).map(_ => (dir, new Array[Byte](size)))
    val shellish = Seq((0, b("SSH-2.0-C\n")), (1, b("SSH-2.0-S\n"))) ++
      (0 until 15).flatMap(_ => Seq((0, new Array[Byte](70)),
        (1, new Array[Byte](70))))
    assert(SshParser.parseChunks(shellish).get.reverseShell,
      "mid-size dominated both directions tags")
    compare(shellish, "reverse shell")
    val oneSided = Seq((0, b("SSH-2.0-C\n")), (1, b("SSH-2.0-S\n"))) ++
      tail(0, 70, 16) ++ tail(1, 20, 16)
    assert(!SshParser.parseChunks(oneSided).get.reverseShell,
      "one-sided mid-size must not tag")
    compare(oneSided, "one-sided no tag")
  }
}
