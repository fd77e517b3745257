package graft.multimodal

/** Pure-JVM YUV4MPEG2 (Y4M) codec — the real-decode video tier of the
  * multimodal column support. Y4M is the standard uncompressed video
  * interchange container (mjpegtools/ffmpeg lineage): an ASCII
  * parameter header line (`YUV4MPEG2 W.. H.. F..:.. Ip A..:.. C...`),
  * then one `FRAME` marker line per frame followed by raw planar YUV
  * bytes. Crucially the container carries NO frame count — the only
  * way to know `nFrames` is to WALK the stream, frame by frame, using
  * the plane sizes implied by the header's colorspace tag; that walk is
  * exactly what [[decode]] does, so a decoded frame count is proof of
  * a real parse, not an echo of a header field.
  *
  * Supported colorspaces: the C420 family (420jpeg/420mpeg2/420paldv —
  * identical plane layout, chroma subsampled 2×2), C444, and Cmono.
  * Frame statistics are computed over the LUMA plane only (the Y in
  * YUV) — chroma carries color, luma carries the picture.
  */
object Y4mCodec {

  final case class Decoded(
      width: Int,
      height: Int,
      fpsNum: Int,
      fpsDen: Int,
      colorspace: String,
      /** frame count discovered by walking the stream */
      nFrames: Int,
      /** mean luma of the FIRST frame (0.0 for a zero-frame stream) */
      firstFrameMean: Double,
      /** top-left luma of the LAST frame (-1 for a zero-frame stream) */
      lastTopLeft: Int)

  private val Magic = "YUV4MPEG2"

  /** Bytes of chroma per frame for a colorspace tag, given w×h luma. */
  private def chromaBytes(cs: String, w: Int, h: Int): Int = cs match {
    case s if s.startsWith("420") =>
      // 2×2 chroma subsampling is undefined for odd dimensions — a
      // crafted odd-width header would silently mis-stride the frame
      // walk (wrong frame count + garbage stats), so fail loudly
      require(w % 2 == 0 && h % 2 == 0,
        s"C$cs requires even dimensions, got ${w}x$h")
      (w / 2) * (h / 2) * 2
    case "444"                    => w * h * 2
    case "mono"                   => 0
    case other =>
      throw new IllegalArgumentException(s"unsupported colorspace C$other")
  }

  /** Encode a C420jpeg Y4M stream: `luma(f, i)` gives the luma level of
    * frame `f` at raster index `i` (= y·w + x); both chroma planes are
    * filled with the neutral 128. C420 requires even dimensions.
    */
  def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      nFrames: Int, luma: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(width % 2 == 0 && height % 2 == 0,
      s"C420 needs even dimensions, got ${width}x$height")
    require(fpsNum > 0 && fpsDen > 0 && nFrames >= 0,
      s"bad params F$fpsNum:$fpsDen nFrames=$nFrames")
    val header =
      s"$Magic W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420jpeg\n"
        .getBytes("US-ASCII")
    val lumaLen   = width * height
    val chromaLen = (width / 2) * (height / 2) * 2
    val frameLen  = 6 + lumaLen + chromaLen // "FRAME\n" + planes
    val out = new Array[Byte](header.length + nFrames.toLong.toInt * frameLen)
    System.arraycopy(header, 0, out, 0, header.length)
    var f = 0
    while (f < nFrames) {
      var off = header.length + f * frameLen
      "FRAME\n".getBytes("US-ASCII").copyToArray(out, off)
      off += 6
      var i = 0
      while (i < lumaLen) { out(off + i) = (luma(f, i) & 0xff).toByte; i += 1 }
      java.util.Arrays.fill(out, off + lumaLen, off + lumaLen + chromaLen,
        128.toByte)
      f += 1
    }
    out
  }

  /** Parse Y4M bytes: header parameter line, then walk `FRAME` chunks
    * to the end of the stream. Throws IllegalArgumentException on a bad
    * magic, missing W/H parameters, an unsupported colorspace, a
    * malformed frame marker, or a truncated frame — a corrupt blob must
    * fail loudly, not yield silent garbage.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    val headerEnd = bytes.indexOf('\n'.toByte)
    require(headerEnd > 0, "no header line")
    val header = new String(bytes, 0, headerEnd, "US-ASCII")
    val tokens = header.split(" ").filter(_.nonEmpty)
    require(tokens.nonEmpty && tokens.head == Magic,
      s"not a Y4M stream (bad magic '${tokens.headOption.getOrElse("")}')")
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420jpeg"
    tokens.tail.foreach { t =>
      (t.head, t.tail) match {
        case ('W', v) => w = v.toInt
        case ('H', v) => h = v.toInt
        case ('F', v) =>
          val Array(n, d) = v.split(":", 2); fn = n.toInt; fd = d.toInt
        case ('C', v) => cs = v
        case _        => // I (interlace), A (aspect), X (extension): skipped
      }
    }
    require(w > 0 && h > 0, s"missing/bad dimensions W$w H$h")
    require(fn > 0 && fd > 0, s"bad frame rate F$fn:$fd")
    val lumaLen  = w * h
    val frameLen = lumaLen + chromaBytes(cs, w, h)

    var pos = headerEnd + 1
    var nFrames = 0
    var firstSum = 0L
    var lastTopLeft = -1
    while (pos < bytes.length) {
      // FRAME marker line (optional per-frame params up to newline)
      var nl = pos
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      val marker = new String(bytes, pos, nl - pos, "US-ASCII")
      require(nl < bytes.length && marker.startsWith("FRAME"),
        s"malformed frame marker at byte $pos: '$marker'")
      pos = nl + 1
      require(pos + frameLen <= bytes.length,
        s"truncated frame $nFrames: need $frameLen bytes, have ${bytes.length - pos}")
      if (nFrames == 0) {
        var i = 0
        while (i < lumaLen) { firstSum += bytes(pos + i) & 0xff; i += 1 }
      }
      lastTopLeft = bytes(pos) & 0xff
      pos += frameLen
      nFrames += 1
    }
    Decoded(w, h, fn, fd, cs, nFrames,
      if (nFrames == 0) 0.0 else firstSum.toDouble / lumaLen, lastTopLeft)
  }

  /** Per-frame luma SUMS from the same frame walk as [[decode]] —
    * integer-exact (≤ 255·w·h per frame), the primitive the temporal
    * analyses (scene-cut detection) reduce over. Returns
    * (width, height, one sum per walked frame).
    */
  def frameLumaSums(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val headerEnd = bytes.indexOf('\n'.toByte)
    require(headerEnd > 0, "no header line")
    val header = new String(bytes, 0, headerEnd, "US-ASCII")
    val tokens = header.split(" ").filter(_.nonEmpty)
    require(tokens.nonEmpty && tokens.head == Magic,
      s"not a Y4M stream (bad magic '${tokens.headOption.getOrElse("")}')")
    var w = -1; var h = -1; var cs = "420jpeg"
    tokens.tail.foreach { t =>
      (t.head, t.tail) match {
        case ('W', v) => w = v.toInt
        case ('H', v) => h = v.toInt
        case ('C', v) => cs = v
        case _        => ()
      }
    }
    require(w > 0 && h > 0, s"missing/bad dimensions W$w H$h")
    val lumaLen  = w * h
    val frameLen = lumaLen + chromaBytes(cs, w, h)
    val sums = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = headerEnd + 1
    while (pos < bytes.length) {
      var nl = pos
      while (nl < bytes.length && bytes(nl) != '\n') nl += 1
      val marker = new String(bytes, pos, nl - pos, "US-ASCII")
      require(nl < bytes.length && marker.startsWith("FRAME"),
        s"malformed frame marker at byte $pos: '$marker'")
      pos = nl + 1
      require(pos + frameLen <= bytes.length,
        s"truncated frame ${sums.length}: need $frameLen bytes, " +
          s"have ${bytes.length - pos}")
      var s = 0L
      var i = 0
      while (i < lumaLen) { s += bytes(pos + i) & 0xff; i += 1 }
      sums += s
      pos += frameLen
    }
    (w, h, sums.toArray)
  }
}
