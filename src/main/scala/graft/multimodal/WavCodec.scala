package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM RIFF/WAVE codec for 16-bit PCM — the real-decode tier of
  * the multimodal column support (no codec libraries in this
  * environment, but WAV needs none). `decode` walks the RIFF chunk
  * list and parses the `fmt ` and `data` chunks byte-for-byte; it is
  * exercised per-partition inside the batched decode seam (see
  * [[Multimodal]]), and golden-tested in MultimodalSpec against
  * hand-written container bytes.
  */
object WavCodec {

  final case class WavInfo(
      sampleRate: Int,
      nChannels: Int,
      bitsPerSample: Int,
      nSamples: Int,
      /** arithmetic mean of the PCM samples (0.0 for an empty file) */
      meanSample: Double)

  /** Encode mono 16-bit PCM samples as a standard 44-byte-header WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII"))
    bb.putInt(16)               // PCM fmt chunk size
    bb.putShort(1)              // audio format: PCM
    bb.putShort(1)              // channels
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2)   // byte rate = rate * block align
    bb.putShort(2)              // block align = channels * bytes/sample
    bb.putShort(16)             // bits per sample
    bb.put("data".getBytes("US-ASCII"))
    bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Parse WAV bytes: RIFF/WAVE magic, then chunk-walk to `fmt ` and
    * `data`. Throws IllegalArgumentException on malformed input —
    * a corrupt blob must fail loudly, not yield silent garbage.
    */
  def decode(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12, s"truncated WAV: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(fourCC(bb) == "RIFF", "missing RIFF magic")
    bb.getInt // declared riff size; trust the actual buffer instead
    require(fourCC(bb) == "WAVE", "missing WAVE magic")

    var sampleRate = -1; var nChannels = -1; var bits = -1
    var nSamples = -1; var mean = 0.0
    while (bb.remaining() >= 8) {
      val id   = fourCC(bb)
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"chunk $id overruns buffer ($size > ${bb.remaining()})")
      val next = bb.position() + size + (size & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"not PCM: format $audioFormat")
          nChannels  = bb.getShort.toInt
          sampleRate = bb.getInt
          bb.getInt   // byte rate (derived)
          bb.getShort // block align (derived)
          bits = bb.getShort.toInt
        case "data" =>
          require(bits == 16, "data chunk before 16-bit fmt chunk")
          nSamples = size / 2
          var sum = 0L
          var i = 0
          while (i < nSamples) { sum += bb.getShort; i += 1 }
          mean = if (nSamples == 0) 0.0 else sum.toDouble / nSamples
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      bb.position(next)
    }
    require(sampleRate > 0, "no fmt chunk")
    require(nSamples >= 0, "no data chunk")
    WavInfo(sampleRate, nChannels, bits, nSamples, mean)
  }

  /** Parse WAV bytes and return the raw PCM samples — the decode path
    * for sample-level features (e.g. windowed RMS, mm_audio_rms); the
    * same RIFF chunk walk and validation as [[decode]], but the data
    * chunk is materialized instead of reduced.
    */
  def decodeSamples(bytes: Array[Byte]): Array[Short] = {
    require(bytes.length >= 12, s"truncated WAV: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(fourCC(bb) == "RIFF", "missing RIFF magic")
    bb.getInt
    require(fourCC(bb) == "WAVE", "missing WAVE magic")
    var bits = -1
    var out: Array[Short] = null
    while (bb.remaining() >= 8) {
      val id   = fourCC(bb)
      val size = bb.getInt
      require(size >= 0 && size <= bb.remaining(),
        s"chunk $id overruns buffer ($size > ${bb.remaining()})")
      val next = bb.position() + size + (size & 1)
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          require(bb.getShort == 1, "not PCM")
          bb.getShort; bb.getInt; bb.getInt; bb.getShort
          bits = bb.getShort.toInt
        case "data" =>
          require(bits == 16, "data chunk before 16-bit fmt chunk")
          out = Array.fill(size / 2)(bb.getShort)
        case _ => ()
      }
      bb.position(next)
    }
    require(out != null, "no data chunk")
    out
  }

  private def fourCC(bb: ByteBuffer): String = {
    val b = new Array[Byte](4)
    bb.get(b)
    new String(b, "US-ASCII")
  }
}
