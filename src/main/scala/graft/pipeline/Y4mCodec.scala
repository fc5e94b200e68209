package graft.pipeline

/**
 * A REAL container-format codec for the VIDEO path — YUV4MPEG2 (the
 * `.y4m` format mjpegtools defined and ffmpeg/x264 consume): a plain
 * ASCII stream header `YUV4MPEG2 W<w> H<h> F<n>:<d> Ip A1:1 C<cs>\n`
 * followed by frames, each a literal `FRAME\n` marker plus the raw
 * plane bytes. Built and parsed in pure JVM bytes like [[WavCodec]]
 * (RIFF) and [[BmpCodec]] (DIB) — no media libraries; perceptual
 * decode stays stubbed in [[Multimodal]]. The `Cmono` colorspace
 * (luma-only, w·h bytes per frame) keeps the byte accounting exact
 * while remaining a format ffmpeg accepts verbatim.
 *
 * The parser is a validating walker: it tokenizes the stream header,
 * requires the mandatory W/H/F parameters and the Cmono colorspace,
 * then demands a `FRAME` marker (optionally carrying frame-level
 * parameters up to its newline, as the format permits) before every
 * payload and a clean end-of-stream — Y4mSpec proves it rejects
 * truncated frames, missing markers, and foreign colorspaces.
 */
object Y4mCodec {

  private val Magic = "YUV4MPEG2"

  /** Canonical Cmono Y4M: every frame must be exactly width·height
   * luma bytes. */
  def build(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fpsNum > 0 && fpsDen > 0)
    val fb = width * height
    require(frames.forall(_.length == fb),
      s"every Cmono frame must be $fb bytes")
    val header =
      s"$Magic W$width H$height F$fpsNum:$fpsDen Ip A1:1 Cmono\n"
        .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.size * (marker.length + fb))
    out.write(header)
    frames.foreach { f => out.write(marker); out.write(f) }
    out.toByteArray
  }

  final case class Y4mInfo(width: Int, height: Int, fpsNum: Int,
      fpsDen: Int, nFrames: Int, frameBytes: Int, fileBytes: Int,
      frames: Seq[Array[Byte]])

  /** Dimension cap: keeps width·height far inside Int (2^28) — a header
   * claiming a larger plane is rejected, never overflow-misparsed. */
  private val MaxDim = 16384

  private def num(s: String, what: String): Int = {
    require(s.nonEmpty && s.forall(_.isDigit) && s.length <= 9,
      s"malformed $what: '$s'")
    s.toInt
  }

  /** Parse by walking the stream; throws IllegalArgumentException on ANY
   * malformed input — bad magic, non-numeric or oversized geometry
   * (whose product could overflow), malformed F ratio, truncated or
   * unmarked frames. */
  def parse(bytes: Array[Byte]): Y4mInfo = {
    val nl = bytes.indexOf('\n'.toByte)
    require(nl > 0, "missing stream-header newline")
    val tokens = new String(bytes, 0, nl, "US-ASCII").split(" ").toSeq
    require(tokens.headOption.contains(Magic), "not a YUV4MPEG2 stream")
    def param(tag: Char): Option[String] =
      tokens.tail.find(_.headOption.contains(tag)).map(_.tail)
    val width = param('W').map(num(_, "width"))
      .getOrElse(throw new IllegalArgumentException("missing W"))
    val height = param('H').map(num(_, "height"))
      .getOrElse(throw new IllegalArgumentException("missing H"))
    val fps = param('F')
      .getOrElse(throw new IllegalArgumentException("missing F"))
    val fparts = fps.split(":")
    require(fparts.length == 2, s"malformed F ratio: '$fps'")
    val fn = num(fparts(0), "fps numerator")
    val fd = num(fparts(1), "fps denominator")
    val cs = param('C').getOrElse("420") // Y4M default is 4:2:0
    require(cs == "mono", s"only Cmono is modeled, got C$cs")
    require(width > 0 && height > 0 && fn > 0 && fd > 0, "bad geometry")
    require(width <= MaxDim && height <= MaxDim,
      s"plane ${width}x$height exceeds the $MaxDim cap")
    val fb = width * height
    val marker = "FRAME".getBytes("US-ASCII")
    val frames = Seq.newBuilder[Array[Byte]]
    var pos = nl + 1
    var n = 0
    while (pos < bytes.length) {
      require(pos + marker.length < bytes.length &&
        marker.indices.forall(i => bytes(pos + i) == marker(i)),
        s"expected FRAME marker at byte $pos")
      pos += marker.length
      // the format permits frame-level parameters after the marker
      // (`FRAME I…\n`, each introduced by a space) — accept them up to
      // the newline; anything else touching FRAME is malformed
      require(bytes(pos) == '\n'.toByte || bytes(pos) == ' '.toByte,
        s"malformed FRAME header at byte $pos")
      while (pos < bytes.length && bytes(pos) != '\n'.toByte) pos += 1
      require(pos < bytes.length, s"unterminated FRAME header at byte $pos")
      pos += 1
      require(pos + fb <= bytes.length, s"truncated frame at byte $pos")
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + fb)
      pos += fb
      n += 1
    }
    Y4mInfo(width, height, fn, fd, n, fb, bytes.length, frames.result())
  }

  /** Sum of absolute luma differences between two equal-length frames —
   * the classic shot-boundary signal, exact in integers. */
  def sad(a: Array[Byte], b: Array[Byte]): Long = {
    require(a.length == b.length)
    var s = 0L
    var i = 0
    while (i < a.length) {
      s += math.abs((a(i) & 0xff) - (b(i) & 0xff))
      i += 1
    }
    s
  }
}
