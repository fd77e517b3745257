package graft.multimodal

/** Minimal real BMP (Windows DIB) codec: 24-bit uncompressed
  * BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian fields, pixel
  * rows stored bottom-up and padded to 4-byte boundaries — the actual
  * on-disk format, parsed byte-for-byte (no image library involved).
  * The decoder must honor the declared pixel-array offset, the row
  * padding, and the bottom-up row order to reconstruct top-of-image
  * pixels correctly; MultimodalSpec covers those with handcrafted
  * fixtures.
  */
object BmpCodec {

  final case class Decoded(
      width: Int,
      height: Int,
      bitsPerPixel: Int,
      fileSize: Int,
      /** mean over pixels of (r+g+b)/3 */
      meanLevel: Double,
      /** (r+g+b)/3 of the TOP-LEFT image pixel (bottom-up file order
        * means this is the first pixel of the LAST stored row)
        */
      topLeft: Int)

  private def rowSize(width: Int): Int = (3 * width + 3) & ~3

  /** Encode a width×height 24bpp BMP; `pix(x, y)` gives the grey level
    * (written to all three channels) for image coordinates with y=0 at
    * the TOP.
    */
  def encode(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] =
    encodeRgb(width, height, (x, y) => { val v = pix(x, y); (v, v, v) })

  /** Full-color variant: `pix(x, y)` gives the (b, g, r) channel triple
    * for image coordinates with y=0 at the TOP.
    */
  def encodeRgb(width: Int, height: Int,
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    val rs    = rowSize(width)
    val size  = 54 + rs * height
    val out   = new Array[Byte](size)
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, size)       // file size
    le32(10, 54)        // pixel-array offset
    le32(14, 40)        // BITMAPINFOHEADER size
    le32(18, width)
    le32(22, height)    // positive → bottom-up
    le16(26, 1)         // planes
    le16(28, 24)        // bits per pixel
    le32(30, 0)         // BI_RGB, uncompressed
    le32(34, rs * height)
    le32(38, 2835); le32(42, 2835) // 72 DPI in px/m
    var fileRow = 0
    while (fileRow < height) {
      val y   = height - 1 - fileRow // bottom-up storage
      val off = 54 + fileRow * rs
      var x = 0
      while (x < width) {
        val (b, g, r) = pix(x, y)
        out(off + 3 * x) = (b & 0xff).toByte
        out(off + 3 * x + 1) = (g & 0xff).toByte
        out(off + 3 * x + 2) = (r & 0xff).toByte
        x += 1
      }
      fileRow += 1
    }
    out
  }

  /** Nearest-neighbor resample to newW×newH: decode the source pixel
    * array and re-encode a REAL 24bpp BMP (content, not metadata).
    * Target pixel (x, y) copies source pixel (⌊x·w/newW⌋, ⌊y·h/newH⌋)
    * — the integer floor mapping, exact in every engine — per channel,
    * honoring the source's pixel-array offset, row padding, and
    * bottom-up row order.
    */
  def resizeNearest(bytes: Array[Byte], newW: Int, newH: Int): Array[Byte] = {
    require(newW > 0 && newH > 0, s"bad target dimensions ${newW}x$newH")
    decode(bytes) // full container validation (magic, bpp, truncation)
    def u8(off: Int): Int = bytes(off) & 0xff
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    val offset = le32(10)
    val w      = le32(18)
    val h      = le32(22)
    val rs     = rowSize(w)
    encodeRgb(newW, newH, (x, y) => {
      val sx  = ((x.toLong * w) / newW).toInt
      val sy  = ((y.toLong * h) / newH).toInt
      val off = offset + (h - 1 - sy) * rs + 3 * sx // bottom-up source row
      (u8(off), u8(off + 1), u8(off + 2))
    })
  }

  /** Grey level of every image pixel, row-major TOP-DOWN (the storage
    * is bottom-up; this walks it in image order) — the pixel source
    * for perceptual hashing (mm_image_dhash). Full [[decode]]
    * validation first.
    */
  def decodeGrey(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    decode(bytes)
    def u8(off: Int): Int = bytes(off) & 0xff
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    val offset = le32(10)
    val w      = le32(18)
    val h      = le32(22)
    val rs     = rowSize(w)
    val out    = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val off = offset + (h - 1 - y) * rs
      var x = 0
      while (x < w) {
        out(y * w + x) =
          (u8(off + 3 * x) + u8(off + 3 * x + 1) + u8(off + 3 * x + 2)) / 3
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  /** Parse BMP bytes. Throws IllegalArgumentException on a bad magic,
    * unsupported bpp/compression, or truncated pixel array.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    def u8(off: Int): Int  = bytes(off) & 0xff
    def le16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    def le32(off: Int): Int =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    require(bytes.length >= 54, s"truncated header: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP (bad magic)")
    val fileSize = le32(2)
    val offset   = le32(10)
    val width    = le32(18)
    val height   = le32(22)
    val bpp      = le16(28)
    require(le32(30) == 0, s"unsupported compression ${le32(30)}")
    require(bpp == 24, s"unsupported bpp $bpp")
    require(height > 0, "top-down BMPs not supported")
    require(width > 0, s"bad width $width")
    require(offset >= 54 && offset <= bytes.length,
      s"pixel-array offset $offset outside file (${bytes.length} bytes)")
    val rs = rowSize(width)
    require(bytes.length >= offset + rs * height,
      s"truncated pixel array: ${bytes.length} < ${offset + rs * height}")
    var sum = 0L
    var fileRow = 0
    while (fileRow < height) {
      val off = offset + fileRow * rs
      var x = 0
      while (x < width) {
        sum += (u8(off + 3 * x) + u8(off + 3 * x + 1) + u8(off + 3 * x + 2)) / 3
        x += 1
      }
      fileRow += 1
    }
    // top-left image pixel = first pixel of the LAST stored row
    val tlOff = offset + (height - 1) * rs
    val topLeft = (u8(tlOff) + u8(tlOff + 1) + u8(tlOff + 2)) / 3
    Decoded(width, height, bpp, fileSize,
      sum.toDouble / (width.toLong * height), topLeft)
  }
}
