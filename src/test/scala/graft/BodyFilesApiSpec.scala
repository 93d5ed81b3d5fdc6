package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.SessionBuilder
import graft.ops.{BodyHash, FilesTable}

/** E41 bodyhash (apiSessions.js:2878 + decode.js ITEM-HASH) and E42
  * /api/files (apiMisc.js:34-92).
  */
class BodyFilesApiSpec extends AnyFunSuite with SparkSpecBase {

  private val srcPcap = "/root/reference/tests/pcap/socks-http-example.pcap"

  test("bodyhash finds the HTTP body by md5 and sha256; miss is None") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val withBody = sessions.collect().filter(_.httpMd5.nonEmpty)
    assert(withBody.nonEmpty)
    val s = withBody.head
    val md5 = s.httpMd5.head
    val one = sessions.filter(_.sessionId == s.sessionId)
    val hit = BodyHash.find(one, md5)
    assert(hit.isDefined, s"md5 $md5 of ${s.sessionId} must resolve")
    val (name, body) = hit.get
    assert(graft.etl.HttpParser.bodyDigests(body)._1 == md5)
    assert(name.nonEmpty)
    // the same body resolves by its sha256 too (ITEM-HASH checks both)
    val sha = graft.etl.HttpParser.bodyDigests(body)._2
    assert(BodyHash.find(one, sha).map(_._2.toSeq).contains(body.toSeq))
    assert(BodyHash.find(one, "0" * 32).isEmpty)
    // over the full result set, the NEWEST matching session serves
    assert(BodyHash.find(sessions, md5).isDefined)
  }

  test("body-by-ordinal fetch returns the same bytes as the hash lookup") {
    // plain HTTP (no tunnel): the display pipeline and the hash path see
    // the same stream, so ordinal and digest must address the same body
    val sessions = SessionBuilder.sessionize(spark,
      "/root/reference/tests/pcap/http-post-upload.pcap")
    val s = sessions.collect().find(_.httpMd5.nonEmpty).get
    val one = sessions.filter(_.sessionId == s.sessionId)
    val md5 = s.httpMd5.head
    val (hashName, hashBytes) = BodyHash.find(one, md5).get

    // the packets pane stamps 1-based body ordinals; find the one whose
    // bytes carry the digest, then fetch it BY NUMBER like the download
    // link does (apiSessions.js:323-371 ITEM-RAWBODY)
    val pane = graft.ops.PacketsView.packets(one, s.sessionId)
    val bodies = pane.filter(_.bodyNum > 0)
    assert(bodies.nonEmpty, "pane must expose at least one body item")
    val matching = bodies.find { r =>
      val raw = graft.ops.PacketsView.body(one, s.sessionId, r.bodyNum)
      raw.exists(b => graft.etl.HttpParser.bodyDigests(b._2)._1 == md5)
    }
    assert(matching.isDefined, s"some pane ordinal must carry md5 $md5")
    val (name, bytes) = graft.ops.PacketsView
      .body(one, s.sessionId, matching.get.bodyNum).get
    assert(bytes.toSeq == hashBytes.toSeq)
    assert(name == hashName || name.nonEmpty)
    // out-of-range ordinal and ordinal 0 are the reference's 'No match'
    assert(graft.ops.PacketsView.body(one, s.sessionId, 0).isEmpty)
    assert(graft.ops.PacketsView.body(one, s.sessionId, 999).isEmpty)
    // bodypng renders the matched bytes, placeholder on miss
    assert(graft.ops.PacketsView.bodyPng(one, s.sessionId,
      matching.get.bodyNum).length > 8)
    assert(graft.ops.PacketsView.bodyPng(one, s.sessionId, 999).toSeq ==
      graft.ops.RawPackets.emptyPng.toSeq)
  }

  test("namedBodies serves response-only captures (srcResps parity with parse)") {
    // responses on the CLIENT stream, no requests — the same srcResps
    // path parse() digests into httpMd5 (single-packets golden class)
    val client = ("HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nhello")
      .getBytes("ISO-8859-1")
    val bodies = graft.etl.HttpParser.namedBodies(client, Array.emptyByteArray)
    assert(bodies.map(_._2.toSeq) == Seq("hello".getBytes("ISO-8859-1").toSeq))
    // and a content-disposition filename wins the name
    val named = ("HTTP/1.1 200 OK\r\nContent-Disposition: attachment; " +
      "filename=\"r.bin\"\r\nContent-Length: 2\r\n\r\nok").getBytes("ISO-8859-1")
    assert(graft.etl.HttpParser.namedBodies(named, Array.emptyByteArray)
      .map(_._1) == Seq("r.bin"))
  }

  test("files table lists the capture with size, ordinal and paging") {
    val sessions = SessionBuilder.sessionize(spark, srcPcap)
    val all = FilesTable.filesTable(sessions).collect()
    assert(all.length == 1)
    val r = all.head
    assert(r.getAs[String]("name").endsWith(srcPcap)) // file: URI or path
    assert(r.getAs[Long]("filesize") ==
      java.nio.file.Files.size(java.nio.file.Paths.get(srcPcap)))
    assert(r.getAs[Int]("num") == 1)
    assert(r.getAs[Long]("first") ==
      sessions.collect().map(_.firstPacket).min)
    assert(r.getAs[String]("packetPosEncoding") == "gap0")

    // the per-node ordinal point lookup answers the same size
    assert(FilesTable.fileSize(sessions, r.getAs[String]("node"), 1)
      .contains(r.getAs[Long]("filesize")))
    assert(FilesTable.fileSize(sessions, r.getAs[String]("node"), 99).isEmpty)

    val page = FilesTable.files(sessions, filter = Some("socks-http"))
    assert(page.recordsTotal == 1 && page.recordsFiltered == 1)
    assert(page.data.count() == 1)
    val miss = FilesTable.files(sessions, filter = Some("nope"))
    assert(miss.recordsTotal == 1 && miss.recordsFiltered == 0)
    val off = FilesTable.files(sessions, start = 1)
    assert(off.data.count() == 0, "offset past the single row")
  }
}
