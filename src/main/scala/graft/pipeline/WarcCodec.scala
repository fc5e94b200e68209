package graft.pipeline

/**
 * A REAL container-format codec for the CRAWL-ARCHIVE path — WARC
 * (ISO 28500, the format web crawls like Common Crawl arrive in; WET
 * text extracts are WARC files whose records carry
 * `WARC-Type: conversion`). Built and parsed in pure JVM bytes like
 * [[WavCodec]] (RIFF), [[BmpCodec]] (DIB), and [[Y4mCodec]] (YUV4MPEG2)
 * — no archive libraries. Completes the container-walker family with
 * the record-at-a-time, named-header, length-prefixed shape: each
 * record is a `WARC/1.0` version line, CRLF-terminated named headers
 * (the standard's four mandatory fields enforced), one empty line, then
 * exactly `Content-Length` payload bytes and a blank-line record
 * terminator (CRLF CRLF). [[buildGz]]/[[parseGz]] add the `.warc.gz`
 * wire framing real archives ship in — one gzip MEMBER per record,
 * validated member by member (header, CRC32, ISIZE), with record
 * offsets kept in the logical decompressed stream so a census is
 * invariant to the transport encoding.
 *
 * Digest note: ISO 28500's `WARC-Block-Digest` example algorithm is
 * sha1/base32; this codec stamps `md5:<hex>` instead so the digest is
 * replayable by any SQL engine (the repo's md5-everywhere convention) —
 * the FIELD semantics (a labeled digest of the record block, verified
 * on read) are the standard's.
 *
 * The parser is a validating walker in the Y4M-rejection-test mold: it
 * demands the version line, CRLF discipline on every line, the four
 * mandatory headers (Type / Record-ID / Date / Content-Length), a
 * numeric un-oversized length, no duplicate header names, exactly the
 * declared payload bytes, the two-CRLF terminator, a matching block
 * digest when one is stamped, and clean end-of-stream — WarcSpec
 * proves each malformation is rejected, never misparsed.
 *
 * Scope note: [[parse]] targets archives built by THIS codec (the
 * validating-walker convention of the container family) — it is
 * deliberately stricter than ISO 28500 general ingest: the header
 * separator must be exactly `": "` (no `name:value`, no RFC-822
 * continuation lines), versions are pinned to WARC/1.0|1.1, and a
 * stamped digest must use the repo's `md5:` label. Real-crawl ingest
 * would relax header tokenization; parity with the arithmetic oracle
 * depends on the strict byte layout, so the strictness is the point.
 */
object WarcCodec {

  final case class WarcRecord(warcType: String, recordId: String,
      date: String, targetUri: Option[String], payload: Array[Byte],
      contentType: Option[String] = None)

  final case class ParsedRecord(offset: Long, warcType: String,
      recordId: String, date: String, targetUri: Option[String],
      contentLength: Long, payloadMd5: String, payload: Array[Byte],
      contentType: Option[String] = None)

  /** One parsed HTTP/1.1 message block — the payload shape of WARC
   * `request`/`response` records (ISO 28500 §6.3/§6.4: the record
   * block is a full HTTP message, `Content-Type:
   * application/http; msgtype=request|response`). `startLine` is the
   * request line or status line verbatim; `status` is the parsed
   * 3-digit code for responses (None for requests). */
  final case class HttpMessage(startLine: String, status: Option[Int],
      headers: Vector[(String, String)], body: Array[Byte])

  private val Crlf = "\r\n"

  private def md5Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** Serialize one record, stamping Content-Length and the md5 block
   * digest. Header order is fixed so the byte layout is deterministic:
   * Type, Record-ID, Date, [Target-URI], [Content-Type],
   * Content-Length, Block-Digest — the p125/p125b oracles re-derive
   * offsets from exactly this order. */
  def buildRecord(r: WarcRecord): Array[Byte] = {
    require(r.warcType.nonEmpty && r.recordId.nonEmpty && r.date.nonEmpty)
    val sb = new StringBuilder
    sb ++= "WARC/1.0" ++= Crlf
    sb ++= s"WARC-Type: ${r.warcType}" ++= Crlf
    sb ++= s"WARC-Record-ID: ${r.recordId}" ++= Crlf
    sb ++= s"WARC-Date: ${r.date}" ++= Crlf
    r.targetUri.foreach(u => sb ++= s"WARC-Target-URI: $u" ++= Crlf)
    r.contentType.foreach(ct => sb ++= s"Content-Type: $ct" ++= Crlf)
    sb ++= s"Content-Length: ${r.payload.length}" ++= Crlf
    sb ++= s"WARC-Block-Digest: md5:${md5Hex(r.payload)}" ++= Crlf
    sb ++= Crlf
    val head = sb.result().getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      head.length + r.payload.length + 4)
    out.write(head)
    out.write(r.payload)
    out.write(Crlf.getBytes("US-ASCII"))
    out.write(Crlf.getBytes("US-ASCII"))
    out.toByteArray
  }

  /** Concatenate records into one WARC file. */
  def build(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach(r => out.write(buildRecord(r)))
    out.toByteArray
  }

  /** Build the `.warc.gz` wire shape real crawl archives ship in
   * (Common Crawl / WARC 1.1 Annex D): each record is its OWN gzip
   * member and the archive is the member concatenation — the framing
   * that lets an index seek to a record's compressed offset and
   * decompress it alone, which is why per-record members (not one
   * stream) are the standard. */
  def buildGz(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(buildRecord(r))
      gz.finish()
      // releases the Deflater's native memory NOW — finish() alone leaves
      // it to finalization, which a per-micro-batch writer accumulates
      // (closing the wrapper is safe: BAOS.close() is a no-op)
      gz.close()
    }
    out.toByteArray
  }

  /** Decompress ONE gzip member starting at `pos`: validated header
   * (magic, deflate CM, the four standard RFC 1952 §2.3.1 optional
   * fields — FEXTRA/FNAME/FCOMMENT skipped, FHCRC verified against the
   * header bytes, reserved FLG bits rejected; real Common Crawl members
   * routinely carry FNAME/FEXTRA, so a walker modeling the CC wire
   * shape must accept them even though [[buildGz]] never writes them),
   * raw-deflate body, and the 8-byte trailer checked against the
   * inflated bytes (CRC32 + ISIZE mod 2³²) — a truncated or bit-flipped
   * member is rejected, never misparsed. Returns the member's plaintext
   * and the offset just past its trailer. */
  private def gunzipMember(bytes: Array[Byte], pos: Int): (Array[Byte], Int) = {
    require(pos + 10 <= bytes.length, s"truncated gzip header at byte $pos")
    require((bytes(pos) & 0xff) == 0x1f && (bytes(pos + 1) & 0xff) == 0x8b,
      s"bad gzip magic at byte $pos")
    require(bytes(pos + 2) == 8, s"gzip CM must be 8 (deflate) at byte $pos")
    val flg = bytes(pos + 3) & 0xff
    require((flg & 0xe0) == 0,
      s"reserved gzip FLG bits set ($flg) at byte $pos")
    // FTEXT (bit 0) is a content hint with no header data; the other
    // four standard fields appear in RFC 1952 order after the fixed
    // 10-byte header: FEXTRA, FNAME, FCOMMENT, FHCRC
    var h = pos + 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      require(h + 2 <= bytes.length, s"truncated gzip FEXTRA at byte $pos")
      val xlen = (bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8)
      h += 2 + xlen
      require(h <= bytes.length, s"truncated gzip FEXTRA at byte $pos")
    }
    def skipZeroTerminated(field: String): Unit = {
      while (h < bytes.length && bytes(h) != 0) h += 1
      require(h < bytes.length, s"unterminated gzip $field at byte $pos")
      h += 1
    }
    if ((flg & 8) != 0) skipZeroTerminated("FNAME")
    if ((flg & 16) != 0) skipZeroTerminated("FCOMMENT")
    if ((flg & 2) != 0) { // FHCRC: CRC16 of all header bytes so far
      require(h + 2 <= bytes.length, s"truncated gzip FHCRC at byte $pos")
      val hc = new java.util.zip.CRC32
      hc.update(bytes, pos, h - pos)
      val stored = (bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8)
      require((hc.getValue & 0xffffL) == stored,
        s"gzip FHCRC mismatch at byte $pos")
      h += 2
    }
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(bytes, h, bytes.length - h)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    val crc = new java.util.zip.CRC32
    while (!inf.finished()) {
      val n =
        try inf.inflate(buf)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"corrupt deflate stream in member at byte $pos: ${e.getMessage}")
        }
      require(n > 0 || inf.finished(),
        s"truncated deflate stream in member at byte $pos")
      crc.update(buf, 0, n)
      out.write(buf, 0, n)
    }
    val consumed = inf.getBytesRead.toInt
    inf.end()
    val t = h + consumed
    require(t + 8 <= bytes.length, s"truncated gzip trailer at byte $pos")
    def le32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    require(le32(t) == crc.getValue,
      s"gzip CRC32 mismatch in member at byte $pos")
    require(le32(t + 4) == (out.size().toLong & 0xffffffffL),
      s"gzip ISIZE mismatch in member at byte $pos")
    (out.toByteArray, t + 8)
  }

  /** Walk a `.warc.gz` archive member by member — enforcing the
   * one-record-per-member convention [[buildGz]] writes (a multi-record
   * member breaks compressed-offset indexing and is rejected). Record
   * `offset`s are positions in the LOGICAL (decompressed) record
   * stream, so a census over a gzip archive equals the census over its
   * plaintext twin — compression is transport, not content. */
  def parseGz(bytes: Array[Byte]): Seq[ParsedRecord] = {
    val out = Seq.newBuilder[ParsedRecord]
    var pos = 0
    var logical = 0L
    while (pos < bytes.length) {
      val (plain, next) = gunzipMember(bytes, pos)
      val recs = parse(plain)
      require(recs.length == 1,
        s"gzip member at byte $pos holds ${recs.length} WARC records — " +
          ".warc.gz framing is ONE record per member")
      out += recs.head.copy(offset = logical)
      logical += plain.length
      pos = next
    }
    out.result()
  }

  /** Payload cap: a Content-Length past this is rejected before any
   * allocation, never overflow-misparsed. */
  private val MaxLen = 1 << 28

  /** Read one CRLF-terminated ASCII line starting at `pos`; returns
   * (text, next position). Bare LF or CR is malformed. */
  private def line(bytes: Array[Byte], pos: Int): (String, Int) = {
    var i = pos
    while (i + 1 < bytes.length &&
      !(bytes(i) == '\r'.toByte && bytes(i + 1) == '\n'.toByte)) {
      require(bytes(i) != '\n'.toByte && bytes(i) != '\r'.toByte,
        s"bare CR/LF at byte $i — WARC lines end in CRLF")
      i += 1
    }
    require(i + 1 < bytes.length, s"unterminated line at byte $pos")
    (new String(bytes, pos, i - pos, "US-ASCII"), i + 2)
  }

  /** Walk the whole file; throws IllegalArgumentException on ANY
   * malformed input. */
  def parse(bytes: Array[Byte]): Seq[ParsedRecord] = {
    val out = Seq.newBuilder[ParsedRecord]
    var pos = 0
    while (pos < bytes.length) {
      val start = pos
      val (version, p1) = line(bytes, pos)
      require(version == "WARC/1.0" || version == "WARC/1.1",
        s"bad version line '$version' at byte $start")
      pos = p1
      var headers = Vector.empty[(String, String)]
      var done = false
      while (!done) {
        val (l, p) = line(bytes, pos)
        pos = p
        if (l.isEmpty) done = true
        else {
          val ci = l.indexOf(": ")
          require(ci > 0, s"malformed header line '$l'")
          val name = l.substring(0, ci)
          require(!headers.exists(_._1 == name),
            s"duplicate header '$name'")
          headers :+= (name -> l.substring(ci + 2))
        }
      }
      val h = headers.toMap
      def mandatory(n: String): String = h.getOrElse(n,
        throw new IllegalArgumentException(s"missing mandatory $n"))
      val warcType = mandatory("WARC-Type")
      val recordId = mandatory("WARC-Record-ID")
      val date = mandatory("WARC-Date")
      val lenStr = mandatory("Content-Length")
      require(lenStr.nonEmpty && lenStr.forall(_.isDigit) &&
        lenStr.length <= 9, s"malformed Content-Length '$lenStr'")
      val n = lenStr.toInt
      require(n <= MaxLen, s"Content-Length $n exceeds the $MaxLen cap")
      require(pos + n + 4 <= bytes.length, s"truncated payload at byte $pos")
      val payload = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      require(bytes(pos) == '\r'.toByte && bytes(pos + 1) == '\n'.toByte &&
        bytes(pos + 2) == '\r'.toByte && bytes(pos + 3) == '\n'.toByte,
        s"missing CRLFCRLF record terminator at byte $pos")
      pos += 4
      val digest = md5Hex(payload)
      h.get("WARC-Block-Digest").foreach { d =>
        require(d == s"md5:$digest",
          s"block digest mismatch: stamped $d, computed md5:$digest")
      }
      out += ParsedRecord(start.toLong, warcType, recordId, date,
        h.get("WARC-Target-URI"), n.toLong, digest, payload,
        h.get("Content-Type"))
    }
    out.result()
  }

  /**
   * Validating walker for the HTTP/1.1 message block inside a
   * `request`/`response` record (ISO 28500 §6.3/§6.4) — same
   * rejection discipline as [[parse]]: CRLF line endings, `": "`
   * header separator, no duplicate header names, and — the framing
   * teeth — a mandatory `Content-Length` header that must equal the
   * actual body byte count, so a truncated or padded HTTP block can
   * never be silently misattributed. Responses must open with
   * `HTTP/1.1 <3-digit> <reason>`; requests with
   * `<METHOD> <uri> HTTP/1.1` (method all upper-alpha). As with the
   * container walker, this targets blocks built by THIS codec: real
   * crawl ingest tolerates LF-only lines, absent Content-Length
   * (connection-close framing) and chunked transfer coding — the
   * strict byte discipline is what makes the arithmetic oracle able
   * to re-derive every offset.
   */
  def parseHttp(payload: Array[Byte], isResponse: Boolean): HttpMessage = {
    val (start, p0) = line(payload, 0)
    val status: Option[Int] =
      if (isResponse) {
        val m = "^HTTP/1\\.1 ([0-9]{3}) (.+)$".r
        start match {
          case m(code, _) => Some(code.toInt)
          case _ => throw new IllegalArgumentException(
            s"malformed HTTP status line '$start'")
        }
      } else {
        val m = "^([A-Z]+) (\\S+) HTTP/1\\.1$".r
        require(m.matches(start), s"malformed HTTP request line '$start'")
        None
      }
    var pos = p0
    var headers = Vector.empty[(String, String)]
    var done = false
    while (!done) {
      val (l, p) = line(payload, pos)
      pos = p
      if (l.isEmpty) done = true
      else {
        val ci = l.indexOf(": ")
        require(ci > 0, s"malformed HTTP header line '$l'")
        val name = l.substring(0, ci)
        require(!headers.exists(_._1 == name),
          s"duplicate HTTP header '$name'")
        headers :+= (name -> l.substring(ci + 2))
      }
    }
    val body = java.util.Arrays.copyOfRange(payload, pos, payload.length)
    val lenStr = headers.collectFirst { case ("Content-Length", v) => v }
      .getOrElse(throw new IllegalArgumentException(
        "missing HTTP Content-Length"))
    require(lenStr.nonEmpty && lenStr.forall(_.isDigit) &&
      lenStr.length <= 9, s"malformed HTTP Content-Length '$lenStr'")
    require(lenStr.toInt == body.length,
      s"HTTP Content-Length ${lenStr.toInt} != body ${body.length}")
    HttpMessage(start, status, headers, body)
  }

  /** Build an HTTP/1.1 message block byte-exactly invertible by
   * [[parseHttp]]: start line, headers in given order, blank line,
   * body. Content-Length is stamped automatically as the LAST header. */
  def buildHttp(startLine: String, headers: Seq[(String, String)],
      body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= startLine ++= Crlf
    headers.foreach { case (n, v) => sb ++= s"$n: $v" ++= Crlf }
    sb ++= s"Content-Length: ${body.length}" ++= Crlf
    sb ++= Crlf
    val head = sb.result().getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(head.length + body.length)
    out.write(head)
    out.write(body)
    out.toByteArray
  }
}
