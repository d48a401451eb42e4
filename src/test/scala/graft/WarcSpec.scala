package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** Pins the WARC codec beyond the q217 gate: byte-exact round trips
  * over adversarial payloads (empty, multibyte, CRLF-CRLF-bearing), and
  * every framing gate failing BY NAME — a crawl shard with a flipped
  * byte must kill the task, never yield a silently-short corpus.
  */
class WarcSpec extends AnyFunSuite {

  test("round trip: fields and payload bytes survive, incl. empty, multibyte, and CRLF-CRLF payloads") {
    val docs = Seq(
      (1L, ""),                       // empty payload: Content-Length 0
      (2L, "hello world"),
      (3L, "数据处理引擎 big data"),     // Content-Length is UTF-8 BYTES
      (10L, "a\r\nb\r\n\r\nc"),        // CRLF CRLF INSIDE the payload
      (11L, "tail\r\n\r\n"))           // payload ENDING in the trailer bytes
    val blob = Warc.buildShard(docs)
    val recs = Warc.parseShard(blob)
    assert(recs.size == docs.size)
    docs.zip(recs).foreach { case ((id, text), r) =>
      val bytes = text.getBytes("UTF-8")
      assert(r.url == Warc.recordUrl(id) && r.warcType == "response")
      assert(r.contentLength == bytes.length,
        s"doc $id: Content-Length must count UTF-8 bytes")
      assert(java.util.Arrays.equals(r.payload, bytes), s"doc $id payload mangled")
    }
    // member boundaries are real: each record parses from its own member,
    // so a prefix of the blob ending at a boundary parses cleanly
    val one = Warc.buildShard(docs.take(1))
    assert(Warc.parseShard(blob.take(one.length)).size == 1)
  }

  test("every framing gate fails by name") {
    val blob = Warc.buildShard(Seq(5L -> "some payload text here"))
    def mutated(i: Int, b: Byte): Array[Byte] = {
      val m = blob.clone(); m(i) = b; m
    }
    val eMagic = intercept[IllegalArgumentException](Warc.parseShard(mutated(0, 0)))
    assert(eMagic.getMessage.contains("not a gzip member"), eMagic.getMessage)
    val eFlg = intercept[IllegalArgumentException](Warc.parseShard(mutated(3, 0x20)))
    assert(eFlg.getMessage.contains("reserved FLG"), eFlg.getMessage)
    val eCrc = intercept[IllegalArgumentException](
      Warc.parseShard(mutated(blob.length - 6, (blob(blob.length - 6) ^ 1).toByte)))
    assert(eCrc.getMessage.contains("CRC32"), eCrc.getMessage)
    val eIsz = intercept[IllegalArgumentException](
      Warc.parseShard(mutated(blob.length - 1, (blob(blob.length - 1) ^ 1).toByte)))
    assert(eIsz.getMessage.contains("ISIZE"), eIsz.getMessage)
    val eTrunc = intercept[IllegalArgumentException](
      Warc.parseShard(blob.take(blob.length - 3)))
    assert(eTrunc.getMessage.toLowerCase.contains("trunc"), eTrunc.getMessage)
    // a deflate-body flip is either a CRC mismatch or a corrupt stream —
    // both loud
    val eBody = intercept[IllegalArgumentException](
      Warc.parseShard(mutated(14, (blob(14) ^ 0x40).toByte)))
    assert(eBody.getMessage.contains("CRC32") || eBody.getMessage.contains("corrupt")
      || eBody.getMessage.contains("truncated"), eBody.getMessage)
  }

  test("HTTP layer: round trip + every gate fails by name") {
    val html = "<p>body with 多字节 text</p>"
    val msg = Warc.httpMessage(html).getBytes("UTF-8")
    val r = Warc.parseHttp(msg)
    assert(r.status == 200 && r.body == html)
    def bytes(s: String) = s.getBytes("UTF-8")
    val eSep = intercept[IllegalArgumentException](
      Warc.parseHttp(bytes("HTTP/1.1 200 OK\r\nContent-Length: 0")))
    assert(eSep.getMessage.contains("separator"), eSep.getMessage)
    val eLine = intercept[IllegalArgumentException](
      Warc.parseHttp(bytes("ICY 200 OK\r\n\r\nx")))
    assert(eLine.getMessage.contains("HTTP/1.1"), eLine.getMessage)
    val eNoCl = intercept[IllegalArgumentException](
      Warc.parseHttp(bytes("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nx")))
    assert(eNoCl.getMessage.contains("Content-Length"), eNoCl.getMessage)
    // a truncated fetch: declared length exceeds the delivered body
    val eShort = intercept[IllegalArgumentException](
      Warc.parseHttp(msg.take(msg.length - 3)))
    assert(eShort.getMessage.contains("truncated fetch"), eShort.getMessage)
    // non-200 statuses parse (filtering them is a curation decision,
    // not a parse error)
    assert(Warc.parseHttp(bytes(
      "HTTP/1.1 404 Not Found\r\nContent-Length: 2\r\n\r\nno")).status == 404)
  }

  test("record-grammar gates fail by name (crafted members)") {
    def member(s: String): Array[Byte] = Warc.gzipMember(s.getBytes("UTF-8"))
    val eVer = intercept[IllegalArgumentException](
      Warc.parseShard(member("HTTP/1.1 200 OK\r\n\r\nbody\r\n\r\n")))
    assert(eVer.getMessage.contains("WARC/1.0"), eVer.getMessage)
    val eFill = intercept[IllegalArgumentException](Warc.parseShard(member(
      "WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 5\r\n\r\nabc\r\n\r\n")))
    assert(eFill.getMessage.contains("does not fill"), eFill.getMessage)
    val eTrailer = intercept[IllegalArgumentException](Warc.parseShard(member(
      "WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 3\r\n\r\nabcXXXX")))
    assert(eTrailer.getMessage.contains("CRLF CRLF"), eTrailer.getMessage)
    val eNoCl = intercept[IllegalArgumentException](Warc.parseShard(member(
      "WARC/1.0\r\nWARC-Target-URI: u\r\n\r\n\r\n\r\n")))
    assert(eNoCl.getMessage.contains("Content-Length"), eNoCl.getMessage)
    // a CRC-clean member whose Content-Length is garbage must fail BY
    // NAME, not with a bare NumberFormatException
    val eNan = intercept[IllegalArgumentException](Warc.parseShard(member(
      "WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: abc\r\n\r\n\r\n\r\n")))
    assert(eNan.getMessage.contains("non-numeric Content-Length"), eNan.getMessage)
  }

  test("real-crawl dialects: optional gzip header fields, WARC/1.1, HTTP/1.0, chunked") {
    // --- gzip members carrying FNAME / FEXTRA / FHCRC (RFC 1952 §2.3.1):
    // rebuild a bare member's header with optional fields and re-parse
    val rec = Warc.recordBytes(7L, "dialect payload".getBytes("UTF-8"))
    val bare = Warc.gzipMember(rec)
    val deflateAndTrailer = bare.drop(10)
    def withHeader(flg: Int, extra: Array[Byte]): Array[Byte] = {
      val header = Array[Byte](0x1f, 0x8b.toByte, 8, flg.toByte,
        0, 0, 0, 0, 0, 0xff.toByte) ++ extra
      header ++ deflateAndTrailer
    }
    val named = withHeader(8, "crawl-00.warc".getBytes("US-ASCII") :+ 0.toByte)
    assert(Warc.parseShard(named).head.url == Warc.recordUrl(7L),
      "FNAME member must parse")
    val fextra = Array[Byte](4, 0) ++ "SLza".getBytes("US-ASCII") // XLEN=4
    assert(Warc.parseShard(withHeader(4, fextra)).head.contentLength ==
      "dialect payload".length, "FEXTRA member must parse")
    // FHCRC: CRC-16 (low 16 bits of CRC32) over the header bytes so far
    val hdrNoCrc = Array[Byte](0x1f, 0x8b.toByte, 8, 2, 0, 0, 0, 0, 0, 0xff.toByte)
    val c = new java.util.zip.CRC32(); c.update(hdrNoCrc)
    val crc16 = (c.getValue & 0xffffL).toInt
    val good = hdrNoCrc ++ Array[Byte]((crc16 & 0xff).toByte,
      ((crc16 >> 8) & 0xff).toByte) ++ deflateAndTrailer
    assert(Warc.parseShard(good).head.warcType == "response",
      "FHCRC member must parse when the header CRC is correct")
    val bad = good.clone(); bad(5) = 1 // MTIME flip invalidates the FHCRC
    val eHcrc = intercept[IllegalArgumentException](Warc.parseShard(bad))
    assert(eHcrc.getMessage.contains("FHCRC"), eHcrc.getMessage)
    // --- WARC/1.1 version line
    val rec11 = new String(rec, "UTF-8").replaceFirst("WARC/1\\.0", "WARC/1.1")
    assert(Warc.parseShard(Warc.gzipMember(rec11.getBytes("UTF-8")))
      .head.contentLength == "dialect payload".length)
    // --- HTTP/1.0 response
    assert(Warc.parseHttp(
      "HTTP/1.0 200 OK\r\nContent-Length: 2\r\n\r\nok".getBytes("UTF-8"))
      .body == "ok")
    // --- a doubled SP in the status line must not crash or mis-parse
    assert(Warc.parseHttp(
      "HTTP/1.1  301 Moved\r\nContent-Length: 0\r\n\r\n".getBytes("UTF-8"))
      .status == 301)
    val eCode = intercept[IllegalArgumentException](Warc.parseHttp(
      "HTTP/1.1 abc OK\r\nContent-Length: 0\r\n\r\n".getBytes("UTF-8")))
    assert(eCode.getMessage.contains("non-numeric status code"), eCode.getMessage)
    val eClNan = intercept[IllegalArgumentException](Warc.parseHttp(
      "HTTP/1.1 200 OK\r\nContent-Length: abc\r\n\r\n".getBytes("UTF-8")))
    assert(eClNan.getMessage.contains("non-numeric Content-Length"), eClNan.getMessage)
    // --- chunked bodies: multibyte text split across chunks reassembles
    val text = "chunked 多字节 body"
    val bytes = text.getBytes("UTF-8")
    val (a, b) = bytes.splitAt(5)
    def hex(n: Int) = Integer.toHexString(n)
    val chunked = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      s"${hex(a.length)};ext=1\r\n").getBytes("UTF-8") ++ a ++
      s"\r\n${hex(b.length)}\r\n".getBytes("UTF-8") ++ b ++
      "\r\n0\r\n\r\n".getBytes("UTF-8")
    assert(Warc.parseHttp(chunked).body == text)
    // truncated mid-chunk and malformed sizes fail by name
    val eChTrunc = intercept[IllegalArgumentException](
      Warc.parseHttp(chunked.take(chunked.length - 12)))
    assert(eChTrunc.getMessage.contains("chunked body"), eChTrunc.getMessage)
    val eChSize = intercept[IllegalArgumentException](Warc.parseHttp(
      ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "xyz\r\nabc\r\n0\r\n\r\n").getBytes("UTF-8")))
    assert(eChSize.getMessage.contains("chunk-size"), eChSize.getMessage)
  }
}
