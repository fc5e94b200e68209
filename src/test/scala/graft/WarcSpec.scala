package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.WarcCodec
import graft.pipeline.WarcCodec.WarcRecord

/** P125 — the ISO 28500 WARC walker. Roundtrip plus the Y4M-style
 * rejection battery: every malformation must throw, never misparse. */
class WarcSpec extends AnyFunSuite {

  private val rec1 = WarcRecord("conversion", "<urn:uuid:doc-1>",
    "2022-01-01T00:00:00Z", Some("https://example.org/doc/1"),
    "hello warc world".getBytes("US-ASCII"))
  private val rec2 = WarcRecord("response", "<urn:uuid:doc-2>",
    "2022-01-02T00:00:00Z", None, Array[Byte]())

  test("build/parse roundtrip preserves fields, offsets, payloads") {
    val bytes = WarcCodec.build(Seq(rec1, rec2))
    val out = WarcCodec.parse(bytes)
    assert(out.size === 2)
    assert(out(0).warcType === "conversion")
    assert(out(0).recordId === "<urn:uuid:doc-1>")
    assert(out(0).date === "2022-01-01T00:00:00Z")
    assert(out(0).targetUri === Some("https://example.org/doc/1"))
    assert(out(0).contentLength === 16L)
    assert(new String(out(0).payload, "US-ASCII") === "hello warc world")
    assert(out(0).offset === 0L)
    // second record starts exactly where the first's serialization ends
    assert(out(1).offset === WarcCodec.buildRecord(rec1).length.toLong)
    assert(out(1).warcType === "response")
    assert(out(1).targetUri === None)
    assert(out(1).contentLength === 0L)
  }

  private def str(r: WarcRecord): String =
    new String(WarcCodec.buildRecord(r), "US-ASCII")

  private def reject(bytes: Array[Byte], hint: String): Unit = {
    val ex = intercept[IllegalArgumentException](WarcCodec.parse(bytes))
    assert(ex.getMessage.toLowerCase.contains(hint),
      s"message '${ex.getMessage}' lacks '$hint'")
  }

  test("rejects a bad version line") {
    reject(str(rec1).replaceFirst("WARC/1\\.0", "WARC/9.9")
      .getBytes("US-ASCII"), "version")
  }

  test("rejects bare-LF line endings") {
    reject(str(rec1).replaceFirst("WARC/1\\.0\r\n", "WARC/1.0\n")
      .getBytes("US-ASCII"), "crlf")
  }

  test("rejects a missing mandatory header") {
    reject(str(rec1).replaceFirst("Content-Length: 16\r\n", "")
      .getBytes("US-ASCII"), "content-length")
  }

  test("rejects a header line without the colon separator") {
    reject(str(rec1).replaceFirst("WARC-Date: ", "WARC-Date=")
      .getBytes("US-ASCII"), "malformed header")
  }

  test("rejects duplicate headers") {
    reject(str(rec1).replaceFirst("WARC-Date: 2022-01-01T00:00:00Z\r\n",
      "WARC-Date: 2022-01-01T00:00:00Z\r\nWARC-Date: x\r\n")
      .getBytes("US-ASCII"), "duplicate")
  }

  test("rejects a non-numeric or oversized Content-Length") {
    reject(str(rec1).replaceFirst("Content-Length: 16", "Content-Length: 16x")
      .getBytes("US-ASCII"), "content-length")
    reject(str(rec1).replaceFirst("Content-Length: 16",
      "Content-Length: 9999999999").getBytes("US-ASCII"), "content-length")
  }

  test("rejects a truncated payload") {
    val full = WarcCodec.buildRecord(rec1)
    reject(java.util.Arrays.copyOfRange(full, 0, full.length - 6),
      "truncated")
  }

  test("rejects a missing record terminator") {
    val full = WarcCodec.buildRecord(rec1)
    // overwrite the final CRLFCRLF with spaces: lengths line up, framing
    // does not
    val bad = full.clone()
    (full.length - 4 until full.length).foreach(i => bad(i) = ' '.toByte)
    reject(bad, "terminator")
  }

  test("rejects a block-digest mismatch") {
    val full = WarcCodec.buildRecord(rec1)
    val bad = full.clone()
    // flip one payload byte (payload sits just before the terminator)
    bad(full.length - 5) = 'X'.toByte
    reject(bad, "digest")
  }

  test("rejects trailing garbage after the last record") {
    // unterminated garbage dies in the line reader; a CRLF-terminated
    // garbage line dies on the version check
    reject((str(rec1) + "junk").getBytes("US-ASCII"), "unterminated")
    reject((str(rec1) + "junk\r\n").getBytes("US-ASCII"), "version")
  }

  // ------------------------------- HTTP block walker (p125b surface)

  private def http(startLine: String, headers: Seq[(String, String)],
      body: String): Array[Byte] =
    WarcCodec.buildHttp(startLine, headers, body.getBytes("US-ASCII"))

  private def rejectHttp(bytes: Array[Byte], isResponse: Boolean,
      hint: String): Unit = {
    val ex = intercept[IllegalArgumentException](
      WarcCodec.parseHttp(bytes, isResponse))
    assert(ex.getMessage.toLowerCase.contains(hint),
      s"message '${ex.getMessage}' lacks '$hint'")
  }

  test("http: response round-trips with status, headers, body") {
    val msg = WarcCodec.parseHttp(
      http("HTTP/1.1 200 OK", Seq("Content-Type" -> "text/plain"), "hello"),
      isResponse = true)
    assert(msg.status === Some(200))
    assert(msg.headers.take(1) === Vector("Content-Type" -> "text/plain"))
    assert(new String(msg.body, "US-ASCII") === "hello")
  }

  test("http: request round-trips with no status and empty body") {
    val msg = WarcCodec.parseHttp(
      http("GET /doc/7 HTTP/1.1", Seq("Host" -> "example.org"), ""),
      isResponse = false)
    assert(msg.status === None)
    assert(msg.body.isEmpty)
  }

  test("http: rejects a malformed status line") {
    rejectHttp(http("HTTP/1.1 20 OK", Nil, ""), isResponse = true, "status")
    rejectHttp(http("HTTP/1.1 OK", Nil, ""), isResponse = true, "status")
    rejectHttp(http("get /x HTTP/1.1", Nil, ""), isResponse = false,
      "request line")
  }

  test("http: rejects bare-LF line endings") {
    val ok = new String(http("HTTP/1.1 200 OK", Nil, "x"), "US-ASCII")
    rejectHttp(ok.replaceFirst("HTTP/1\\.1 200 OK\r\n", "HTTP/1.1 200 OK\n")
      .getBytes("US-ASCII"), isResponse = true, "crlf")
  }

  test("http: rejects duplicate headers and missing separator") {
    rejectHttp(http("HTTP/1.1 200 OK",
      Seq("X-A" -> "1", "X-A" -> "2"), ""), isResponse = true, "duplicate")
    val ok = new String(http("HTTP/1.1 200 OK", Seq("X-A" -> "1"), ""),
      "US-ASCII")
    rejectHttp(ok.replaceFirst("X-A: 1", "X-A=1").getBytes("US-ASCII"),
      isResponse = true, "header")
  }

  test("http: rejects a Content-Length that disagrees with the body") {
    val ok = new String(http("HTTP/1.1 200 OK", Nil, "hello"), "US-ASCII")
    rejectHttp(ok.replaceFirst("Content-Length: 5", "Content-Length: 4")
      .getBytes("US-ASCII"), isResponse = true, "content-length")
    // and a block with NO Content-Length at all (connection-close
    // framing) is outside the strict walker's contract
    val noLen = "HTTP/1.1 200 OK\r\n\r\nhello"
    rejectHttp(noLen.getBytes("US-ASCII"), isResponse = true,
      "content-length")
  }

  test("warc: Content-Type header round-trips through build and parse") {
    val r = WarcRecord("response", "<urn:uuid:doc-8>",
      "2022-01-01T00:00:00Z", Some("https://example.org/8"),
      http("HTTP/1.1 200 OK", Seq("Content-Type" -> "text/plain"), "hi"),
      Some("application/http; msgtype=response"))
    val out = WarcCodec.parse(WarcCodec.buildRecord(r))
    assert(out.size === 1)
    assert(out(0).contentType === Some("application/http; msgtype=response"))
    val inner = WarcCodec.parseHttp(out(0).payload, isResponse = true)
    assert(inner.status === Some(200) &&
      new String(inner.body, "US-ASCII") === "hi")
  }

  test("digest verification is skipped when no digest is stamped") {
    // hand-build a record without the optional headers
    val payload = "abc"
    val txt = "WARC/1.1\r\n" +
      "WARC-Type: conversion\r\n" +
      "WARC-Record-ID: <urn:uuid:doc-9>\r\n" +
      "WARC-Date: 2022-01-03T00:00:00Z\r\n" +
      s"Content-Length: ${payload.length}\r\n" +
      "\r\n" + payload + "\r\n\r\n"
    val out = WarcCodec.parse(txt.getBytes("US-ASCII"))
    assert(out.size === 1)
    assert(out(0).targetUri === None)
    assert(new String(out(0).payload, "US-ASCII") === payload)
  }

  // --- .warc.gz member framing (the Common Crawl wire shape) ---

  private def rejectGz(bytes: Array[Byte], hint: String): Unit = {
    val ex = intercept[IllegalArgumentException](WarcCodec.parseGz(bytes))
    assert(ex.getMessage.toLowerCase.contains(hint),
      s"message '${ex.getMessage}' lacks '$hint'")
  }

  test("gz: roundtrip census equals the plaintext walk, logical offsets") {
    val gz = WarcCodec.buildGz(Seq(rec1, rec2))
    val plain = WarcCodec.parse(WarcCodec.build(Seq(rec1, rec2)))
    val out = WarcCodec.parseGz(gz)
    // compression is transport, not content: every census field —
    // offsets included (logical stream) — matches the plaintext twin
    assert(out.map(r => (r.offset, r.warcType, r.recordId, r.date,
        r.targetUri, r.contentLength, r.payloadMd5)) ===
      plain.map(r => (r.offset, r.warcType, r.recordId, r.date,
        r.targetUri, r.contentLength, r.payloadMd5)))
    // and the wire form really is TWO independent members: the second
    // starts with its own gzip magic
    val tail = gz.drop(firstMemberLength(gz))
    assert((tail(0) & 0xff) === 0x1f && (tail(1) & 0xff) === 0x8b)
  }

  /** Compressed length of the first member = position where a re-parse
   * of the remainder still succeeds with one fewer record. */
  private def firstMemberLength(gz: Array[Byte]): Int = {
    val total = WarcCodec.parseGz(gz).size
    (1 until gz.length).find { cut =>
      try WarcCodec.parseGz(gz.drop(cut)).size == total - 1
      catch { case _: IllegalArgumentException => false }
    }.get
  }

  test("gz: rejects a truncated member") {
    val gz = WarcCodec.buildGz(Seq(rec1))
    rejectGz(gz.dropRight(1), "truncated")   // inside the trailer
    rejectGz(gz.take(gz.length - 12), "truncated") // inside deflate data
    rejectGz(gz.take(5), "truncated")        // inside the header
  }

  test("gz: rejects a corrupted member (CRC or deflate)") {
    val gz = WarcCodec.buildGz(Seq(rec1))
    val flipped = gz.clone()
    flipped(gz.length / 2) = (flipped(gz.length / 2) ^ 0x41).toByte
    val ex = intercept[IllegalArgumentException](WarcCodec.parseGz(flipped))
    assert(Seq("crc32", "corrupt", "isize", "crlf", "version", "truncated")
      .exists(ex.getMessage.toLowerCase.contains),
      s"unexpected message '${ex.getMessage}'")
  }

  test("gz: rejects garbage between members and non-gzip input") {
    val gz = WarcCodec.buildGz(Seq(rec1, rec2))
    val cut = firstMemberLength(gz)
    val withGarbage =
      gz.take(cut) ++ "XYZ".getBytes("US-ASCII") ++ gz.drop(cut)
    rejectGz(withGarbage, "magic")
    rejectGz(WarcCodec.build(Seq(rec1)), "magic") // plaintext is not .gz
  }

  test("gz: random-payload battery — census parity with the plaintext walk") {
    // pseudo-random BINARY payloads (zero-length, CRLF-heavy, full-byte
    // range, up to ~600 bytes): the gzip member framing must be
    // transparent for any payload the plaintext codec accepts
    val rng = new Lcg(31337L)
    val recs = (0 until 30).map { i =>
      val len = if (i % 7 == 0) 0 else rng.next(600)
      val payload = Array.fill(len)(rng.next(256).toByte)
      WarcRecord("conversion", s"<urn:uuid:doc-$i>",
        "2022-01-01T00:00:00Z",
        if (i % 3 == 0) Some(s"https://example.org/doc/$i") else None,
        payload)
    }
    def census(rs: Seq[WarcCodec.ParsedRecord]) =
      rs.map(r => (r.offset, r.recordId, r.contentLength, r.payloadMd5,
        r.targetUri))
    val plain = WarcCodec.parse(WarcCodec.build(recs))
    val gz = WarcCodec.parseGz(WarcCodec.buildGz(recs))
    assert(gz.size === 30)
    assert(census(gz) === census(plain))
  }

  /** Re-frame a gzip member (starting at byte 0 of `gz`, length
   * `memberLen`) with RFC 1952 §2.3.1 optional header fields, splicing
   * the original deflate body + trailer unchanged. */
  private def withHeaderFields(gz: Array[Byte],
      fextra: Option[Array[Byte]], fname: Option[String],
      fcomment: Option[String], fhcrc: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(gz, 0, 3)
    var flg = 0
    if (fhcrc) flg |= 2
    if (fextra.isDefined) flg |= 4
    if (fname.isDefined) flg |= 8
    if (fcomment.isDefined) flg |= 16
    out.write(flg)
    out.write(gz, 4, 6) // MTIME, XFL, OS
    fextra.foreach { x =>
      out.write(x.length & 0xff); out.write((x.length >> 8) & 0xff)
      out.write(x, 0, x.length)
    }
    fname.foreach { n => out.write(n.getBytes("US-ASCII")); out.write(0) }
    fcomment.foreach { c => out.write(c.getBytes("US-ASCII")); out.write(0) }
    if (fhcrc) {
      val hdr = out.toByteArray
      val crc = new java.util.zip.CRC32
      crc.update(hdr, 0, hdr.length)
      out.write((crc.getValue & 0xff).toInt)
      out.write(((crc.getValue >> 8) & 0xff).toInt)
    }
    out.write(gz, 10, gz.length - 10)
    out.toByteArray
  }

  test("gz: accepts standard optional header fields (FNAME/FEXTRA/FCOMMENT/FHCRC)") {
    // real Common Crawl members routinely carry FNAME/FEXTRA — decorate
    // the FIRST member of a two-member archive so the walker must also
    // advance past the fields to find the second member
    val gz = WarcCodec.buildGz(Seq(rec1, rec2))
    val cut = firstMemberLength(gz)
    val plain = WarcCodec.parseGz(gz)
    def census(rs: Seq[WarcCodec.ParsedRecord]) =
      rs.map(r => (r.offset, r.recordId, r.contentLength, r.payloadMd5))
    val named = withHeaderFields(gz.take(cut), None,
      Some("crawl-data/seg-00001.warc"), None, fhcrc = false) ++ gz.drop(cut)
    assert(census(WarcCodec.parseGz(named)) === census(plain))
    val full = withHeaderFields(gz.take(cut),
      Some(Array[Byte](0x41, 0x42, 0, 4, 1, 2, 3, 4)),
      Some("seg.warc"), Some("a comment"), fhcrc = true) ++ gz.drop(cut)
    assert(census(WarcCodec.parseGz(full)) === census(plain))
  }

  test("gz: rejects reserved FLG bits, bad FHCRC, unterminated FNAME") {
    val gz = WarcCodec.buildGz(Seq(rec1))
    val reserved = gz.clone()
    reserved(3) = 0x40.toByte
    rejectGz(reserved, "reserved")
    val badCrc = withHeaderFields(gz, None, Some("x"), None, fhcrc = true)
    badCrc(10) = (badCrc(10) ^ 0x07).toByte // the FNAME byte → CRC16 off
    rejectGz(badCrc, "fhcrc")
    // header claims FNAME but the member ends before any terminator
    val unterminated = gz.take(10) ++ "no-terminator".getBytes("US-ASCII")
    unterminated(3) = 0x08.toByte
    rejectGz(unterminated, "unterminated")
  }

  test("gz: rejects a multi-record member") {
    // one member holding TWO records — legal gzip, illegal .warc.gz
    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    g.write(WarcCodec.build(Seq(rec1, rec2)))
    g.finish()
    rejectGz(out.toByteArray, "one record per member")
  }
}
