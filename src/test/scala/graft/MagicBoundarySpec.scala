package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Magic

/** Boundary sweep for the body-magic table (reference:
  * capture/parsers.c:51-320 moloch_parsers_magic_basic). Every entry
  * gets a minimal matching body typed from the reference's needles and
  * macro guards — MAGIC_MATCH/STRCASE unguarded (bounded here: a needle
  * past the end is a non-match, the only safe reading of the C
  * over-read), MAGIC_*_LEN strict `len > off + |needle|` — then the
  * detector is swept over EVERY truncation: below 5 the dispatcher
  * refuses, below the entry's match length the expected fallback holds
  * (None, or the branch's own default like shellscript), at and above
  * it the type must hold. Filler is digits so no needle can appear by
  * accident.
  */
class MagicBoundarySpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def ascii(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.ISO_8859_1)

  private final case class Entry(name: String, body: Array[Byte],
      typ: String, matchLen: Int, fallback: Option[String] = None)

  private val entries = Seq(
    Entry("ftyp-qt", bytes(0, 0, 0, 0x18) ++ ascii("ftypqt12"),
      "video/quicktime", 11),
    Entry("ftyp-3gp", bytes(0, 0, 0, 0x18) ++ ascii("ftyp3g12"),
      "video/3gpp", 11),
    Entry("ttf", bytes(0, 1, 0, 0, 0) ++ ascii("77"),
      "application/x-font-ttf", 5),
    Entry("webm", bytes(0x1a, 0x45, 0xdf, 0xa3) ++ ascii("77webm33"),
      "video/webm", 10), // needle at 6..9 → len ≥ 10 (guard len > 8 subsumed)
    Entry("matroska", bytes(0x1a, 0x45, 0xdf, 0xa3) ++ ascii("5matroska3"),
      "video/x-matroska", 13),
    Entry("gzip", bytes(0x1f, 0x8b) ++ ascii("123"), "application/x-gzip", 5),
    Entry("compress", bytes(0x1f, 0x9d) ++ ascii("123"),
      "application/x-compress", 5),
    Entry("shellscript", ascii("#!123"), "text/x-shellscript", 5),
    Entry("node", ascii("#!7node8"), "application/javascript", 8,
      fallback = Some("text/x-shellscript")),
    Entry("perl", ascii("#!0perl4"), "text/x-perl", 8,
      fallback = Some("text/x-shellscript")),
    Entry("ruby", ascii("#!9ruby12"), "text/x-ruby", 8,
      fallback = Some("text/x-shellscript")),
    Entry("python", ascii("#!4python77"), "text/x-python", 10,
      fallback = Some("text/x-shellscript")),
    Entry("pdf", ascii("%PDF-1.4"), "application/pdf", 5),
    Entry("doctype-html", ascii("<!DocType HTML5"), "text/html", 15),
    Entry("doctype-svg", ascii("<!doctype SVG77"), "text/svg+xml", 14),
    Entry("xml", ascii("<?XML4444"), "text/xml", 5),
    Entry("svg-in-xml", ascii("<?xml88<svg"), "image/svg+xml", 11,
      fallback = Some("text/xml")),
    Entry("php", ascii("<?PHP99"), "text/x-php", 6),
    Entry("php-space", ascii("<? Php337"), "text/x-php", 7),
    Entry("body", ascii("<BODY77"), "text/html", 5),
    Entry("head", ascii("<HeAd99"), "text/html", 5),
    Entry("html", ascii("<HtMl00"), "text/html", 5),
    Entry("svg", ascii("<SvG23"), "image/svg", 5),
    Entry("json", ascii("{\"z9876"), "application/json", 5),
    Entry("psd", ascii("8BPS0"), "image/vnd.adobe.photoshop", 5),
    Entry("bmp", ascii("BM111"), "application/x-ms-bmp", 5),
    Entry("bzip2", ascii("BZh91"), "application/x-bzip2", 5),
    Entry("swf", ascii("CWS55"), "application/x-shockwave-flash", 5),
    Entry("flv", ascii("FLV") ++ bytes(1) ++ ascii("5"), "video/x-flv", 5),
    Entry("gif", ascii("GIF89"), "image/gif", 5),
    Entry("icns", ascii("icns9"), "image/x-icns", 5),
    Entry("mp3", ascii("ID357"), "audio/mpeg", 5),
    Entry("dosexec", ascii("MZ902"), "application/x-dosexec", 5),
    Entry("cab", ascii("MSCF") ++ bytes(0, 0) ++ ascii("9"),
      "application/vnd.ms-cab-compressed", 7),
    Entry("speex", ascii("OggS") ++ ascii("7" * 24) ++ ascii("Speex   ") ++
      ascii("66666"), "audio/ogg", 41),
    Entry("flac", ascii("OggS") ++ ascii("7" * 25) ++ ascii("FLAC") ++
      ascii("88888888"), "audio/ogg", 41),
    Entry("vorbis", ascii("OggS") ++ ascii("7" * 24) ++ bytes(1) ++
      ascii("vorbis") ++ ascii("666666"), "audio/ogg", 41),
    Entry("theora", ascii("OggS") ++ ascii("7" * 24) ++ bytes(0x80) ++
      ascii("theora") ++ ascii("666666"), "video/ogg", 41),
    Entry("opentype", ascii("OTTO4"), "application/vnd.ms-opentype", 5),
    Entry("zip-local", ascii("PK") ++ bytes(3, 4) ++ ascii("9"),
      "application/zip", 5),
    Entry("zip-eocd", ascii("PK") ++ bytes(5, 6) ++ ascii("9"),
      "application/zip", 5),
    // the C needle "PK\007\008PK" is PK \x07 \x00 '8' P K ("\008" is
    // NUL + '8'), MATCH_LEN strict: len > 7
    Entry("zip-split", ascii("PK") ++ bytes(7, 0) ++ ascii("8PK9"),
      "application/zip", 8),
    Entry("riff", ascii("RIFF9"), "audio/x-wav", 5),
    Entry("rar", ascii("Rar!") ++ bytes(0x1a) ++ ascii("7"),
      "application/x-rar", 5),
    Entry("wave", ascii("WAVE5"), "audio/x-wav", 5),
    Entry("torrent", ascii("d8:announce3"), "application/x-bittorrent", 12),
    Entry("woff", ascii("wOFF7"), "application/font-woff", 5),
    Entry("woff2", ascii("wOF25"), "application/font-woff2", 5),
    Entry("png", bytes(0x89) ++ ascii("PNG13"), "image/png", 5),
    Entry("xz", bytes(0xfd) ++ ascii("7zXZ9"), "application/x-xz", 6),
    Entry("jpeg", bytes(0xff, 0xd8, 0xff) ++ ascii("88888888"),
      "image/jpeg", 11),
    Entry("rpm", bytes(0xed, 0xab, 0xee, 0xdb) ++ ascii("8888888"),
      "application/x-rpm", 11),
    Entry("tar", ascii("7" * 257) ++ ascii("ustar9"),
      "application/x-tar", 263),
    Entry("js-docwrite", ascii("3document.write"), "text/javascript", 15),
    Entry("js-strict", ascii("7'use strict'99"), "text/javascript", 13))

  test("every magic entry matches at its minimal length and not below") {
    entries.foreach { e =>
      withClue(s"${e.name} full: ") {
        assert(Magic.detect(e.body).contains(e.typ))
      }
      (0 to e.body.length).foreach { cut =>
        val got = Magic.detect(e.body.take(cut))
        val want =
          if (cut < 5) None
          else if (cut < e.matchLen) e.fallback
          else Some(e.typ)
        assert(got == want, s"${e.name} cut=$cut got=$got want=$want")
      }
    }
  }

  test("case-sensitive needles reject case variants; STRCASE accepts them") {
    assert(Magic.detect(ascii("%pdf-1.4")).isEmpty)
    assert(Magic.detect(ascii("gif89a77")).isEmpty) // lowercase 'g': no case
    assert(Magic.detect(ascii("rar!") ++ bytes(0x1a, 55)).isEmpty)
    assert(Magic.detect(ascii("otto5")).isEmpty)
    assert(Magic.detect(ascii("<!DOCTYPE HTML>")).contains("text/html"))
    assert(Magic.detect(ascii("<?xMl77777")).contains("text/xml"))
    assert(Magic.detect(ascii("<sVg555")).contains("image/svg"))
  }

  test("random bodies never throw and junk stays undetected") {
    var seed = 0x3a91cL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    (0 until 300).foreach { _ =>
      val b = Array.fill(nextInt(300))(nextInt(256).toByte)
      Magic.detect(b) // must not throw, any result
    }
    // digits-only bodies hit no entry (incl. the memstr fallbacks)
    (0 until 50).foreach { i =>
      val b = ascii("0123456789" * (1 + i % 30))
      assert(Magic.detect(b).isEmpty)
    }
  }
}
