package graft.etl

/** Body content-type detection — the reference's "basic" magic mode
  * (capture/parsers.c:51-320 moloch_parsers_magic_basic), re-derived
  * branch for branch so http.bodyMagic matches the goldens. Applied to
  * the head of each HTTP / HTTP2-DATA body.
  */
object Magic {

  private def at(b: Array[Byte], off: Int, needle: Array[Int]): Boolean = {
    if (b.length < off + needle.length) return false
    var i = 0
    while (i < needle.length) {
      if ((b(off + i) & 0xff) != needle(i)) return false
      i += 1
    }
    true
  }

  // needles are constant strings probed per HTTP body — converting them
  // per call allocated in the hottest classify loop
  private val needleCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private def s2a(s: String): Array[Int] =
    needleCache.computeIfAbsent(s, k => k.map(_.toInt & 0xff).toArray)

  /** MAGIC_MATCH — prefix at offset. */
  private def m(b: Array[Byte], off: Int, s: String): Boolean =
    at(b, off, s2a(s))

  /** MAGIC_MATCH_LEN — strict length guard (len > off + |needle|). */
  private def mLen(b: Array[Byte], off: Int, s: String): Boolean =
    b.length > off + s.length && m(b, off, s)

  /** MAGIC_STRCASE — case-insensitive ASCII prefix. */
  private def cas(b: Array[Byte], off: Int, s: String): Boolean = {
    if (b.length < off + s.length) return false
    var i = 0
    while (i < s.length) {
      if (Character.toLowerCase(b(off + i) & 0xff) !=
        Character.toLowerCase(s(i))) return false
      i += 1
    }
    true
  }

  private def casLen(b: Array[Byte], off: Int, s: String): Boolean =
    b.length > off + s.length && cas(b, off, s)

  /** MAGIC_MEMSTR_LEN — needle anywhere after offset, length-guarded. */
  private def memstrLen(b: Array[Byte], off: Int, s: String): Boolean = {
    if (b.length <= off + s.length) return false
    val needle = s2a(s)
    val first = needle(0)
    var i = off
    val last = b.length - needle.length
    while (i <= last) {
      // first-byte skip loop: the common miss costs one compare
      if ((b(i) & 0xff) == first && at(b, i, needle)) return true
      i += 1
    }
    false
  }

  def detect(b: Array[Byte]): Option[String] = {
    // dispatcher refuses tiny bodies before mode selection (parsers.c
    // moloch_parsers_magic: len < 5 → NULL)
    if (b == null || b.length < 5) return None
    val r: String = (b(0) & 0xff) match {
      case 0 =>
        if (b.length > 10 && m(b, 4, "ftyp")) {
          if (m(b, 8, "qt")) "video/quicktime"
          else if (m(b, 8, "3g")) "video/3gpp"
          else null
        } else if (at(b, 0, Array(0, 1, 0, 0, 0)))
          "application/x-font-ttf"
        else null
      case 0x1a =>
        if (at(b, 0, Array(0x1a, 0x45, 0xdf, 0xa3))) {
          if (memstrLen(b, 4, "webm")) "video/webm"
          else if (memstrLen(b, 4, "matroska")) "video/x-matroska"
          else null
        } else null
      case 0x1f =>
        if (b.length > 1 && (b(1) & 0xff) == 0x8b) "application/x-gzip"
        else if (b.length > 1 && (b(1) & 0xff) == 0x9d) "application/x-compress"
        else null
      case '#' =>
        if (b.length > 1 && b(1) == '!') {
          if (memstrLen(b, 3, "node")) "application/javascript"
          else if (memstrLen(b, 3, "perl")) "text/x-perl"
          else if (memstrLen(b, 3, "ruby")) "text/x-ruby"
          else if (memstrLen(b, 3, "python")) "text/x-python"
          else "text/x-shellscript"
        } else null
      case '%' => if (m(b, 0, "%PDF-")) "application/pdf" else null
      case '<' =>
        (if (b.length > 1) b(1).toChar else ' ') match {
          case '!' =>
            if (casLen(b, 0, "<!doctype html")) "text/html"
            else if (casLen(b, 0, "<!doctype svg")) "text/svg+xml"
            else null
          case '?' =>
            if (cas(b, 0, "<?xml")) {
              if (memstrLen(b, 5, "<svg")) "image/svg+xml" else "text/xml"
            } else if (casLen(b, 2, "php") || casLen(b, 2, " php"))
              "text/x-php"
            else null
          case 'B' | 'b' => if (cas(b, 0, "<body")) "text/html" else null
          case 'H' | 'h' =>
            if (cas(b, 0, "<head") || cas(b, 0, "<html")) "text/html" else null
          case 's' | 'S' => if (cas(b, 0, "<svg")) "image/svg" else null
          case _ => null
        }
      case '{' =>
        // isalpha() in the C locale: ASCII letters only (Latin-1 letters
        // like 0xB5/0xC0-0xFF must NOT match).
        if (b.length > 2 && b(1) == '"' &&
          ((b(2) >= 'a' && b(2) <= 'z') || (b(2) >= 'A' && b(2) <= 'Z')))
          "application/json"
        else null
      case '8' => if (m(b, 0, "8BPS")) "image/vnd.adobe.photoshop" else null
      case 'B' =>
        if (m(b, 0, "BM")) "application/x-ms-bmp"
        else if (m(b, 0, "BZh")) "application/x-bzip2"
        else null
      case 'C' => if (m(b, 0, "CWS")) "application/x-shockwave-flash" else null
      case 'F' =>
        if (m(b, 0, "FLV") && b.length >= 4 && b(3) == 1) "video/x-flv"
        else null
      case 'G' => if (m(b, 0, "GIF8")) "image/gif" else null
      case 'i' => if (m(b, 0, "icns")) "image/x-icns" else null
      case 'I' => if (m(b, 0, "ID3")) "audio/mpeg" else null
      case 'M' =>
        if (m(b, 0, "MZ")) "application/x-dosexec"
        else if (b.length > 6 && m(b, 0, "MSCF") && b(4) == 0 && b(5) == 0)
          "application/vnd.ms-cab-compressed"
        else null
      case 'O' =>
        if (b.length > 40 && m(b, 0, "OggS")) {
          if (m(b, 28, "Speex   ")) "audio/ogg"
          else if (m(b, 29, "FLAC")) "audio/ogg"
          else if (at(b, 28, Array(0x01)) && m(b, 29, "vorbis")) "audio/ogg"
          else if (at(b, 28, Array(0x80)) && m(b, 29, "theora")) "video/ogg"
          else null
        } else if (m(b, 0, "OTTO")) "application/vnd.ms-opentype"
        else null
      case 'P' =>
        // Split-zip: the reference's C needle "PK\007\008PK" actually
        // encodes 50 4B 07 00 38 50 4B ("\008" is "\0" + '8' — 8 is not
        // an octal digit), so golden fidelity means matching
        // PK\x07\x00 "8PK", NOT the spec's PK\x07\x08 data descriptor.
        if (at(b, 0, Array('P', 'K', 3, 4)) ||
          at(b, 0, Array('P', 'K', 5, 6)) ||
          (b.length > 7 && at(b, 0, Array('P', 'K', 7, 0)) && m(b, 4, "8PK")))
          "application/zip"
        else null
      case 'R' =>
        if (m(b, 0, "RIFF")) "audio/x-wav"
        else if (m(b, 0, "Rar!") && at(b, 4, Array(0x1a)))
          "application/x-rar"
        else null
      case 'W' => if (m(b, 0, "WAVE")) "audio/x-wav" else null
      case 'd' =>
        if (mLen(b, 0, "d8:announce")) "application/x-bittorrent" else null
      case 'w' =>
        if (m(b, 0, "wOFF")) "application/font-woff"
        else if (m(b, 0, "wOF2")) "application/font-woff2"
        else null
      case 0x89 => if (m(b, 1, "PNG")) "image/png" else null
      case 0xfd => if (mLen(b, 1, "7zXZ")) "application/x-xz" else null
      case 0xff =>
        if (b.length > 10 && at(b, 0, Array(0xff, 0xd8, 0xff))) "image/jpeg"
        else null
      case 0xed =>
        if (b.length > 10 && at(b, 0, Array(0xed, 0xab, 0xee, 0xdb)))
          "application/x-rpm"
        else null
      case _ => null
    }
    if (r != null) Some(r)
    else if (mLen(b, 257, "ustar")) Some("application/x-tar")
    else if (memstrLen(b, 0, "document.write") ||
      memstrLen(b, 0, "'use strict'")) Some("text/javascript")
    else None
  }
}
