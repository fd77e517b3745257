package graft.multimodal

import graft.{SparkSuite, Tables}
import graft.multimodal.Multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {

  private def media = mediaTable(Tables(spark, sf("sf0.001")))

  test("media table schema: opaque binary content + typed metadata") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(Seq("width", "height", "sample_rate", "n_frames")
      .forall(schema(_).dataType.typeName == "integer"))
  }

  test("typed mapPartitions decode pipeline == columnar mm_features twin") {
    import spark.implicits._
    val typed = extractFeatures(media.as[MediaRecord])
      .select(col("media_id"), col("n_bytes"), col("checksum"),
        round(col("mean_level"), 4).as("mean_level"))
    val columnar = graft.QueryRegistry.byName("mm_features")
      .run(spark, sf("sf0.001"))
      .select(col("media_id"), col("n_bytes"), col("checksum"), col("mean_level"))
    assert(typed.exceptAll(columnar).count() == 0)
    assert(columnar.exceptAll(typed).count() == 0)
  }

  test("resize clamps width to max and preserves aspect ratio direction") {
    val out = resize(media.filter(col("width") > 100), maxW = 100)
    assert(out.filter(col("width") > 100).count() == 0)
    assert(out.filter(col("height") < 0).count() == 0)
  }

  test("frame sampling emits every 7th frame, ids only (no byte blowup)") {
    val out = frameSample(media, step = 7)
    assert(!out.columns.contains("content"))
    val bad = out.filter(col("frame_no") % 7 =!= 0)
    assert(bad.count() == 0)
  }

  test("WavCodec.decode parses hand-written golden WAV bytes") {
    // 8000 Hz mono 16-bit PCM, samples [0, 1000, -1000, 32767] — bytes
    // written out field by field, independent of WavCodec.encode
    val bb = java.nio.ByteBuffer.allocate(52)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(44)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(8)
    Seq[Short](0, 1000, -1000, 32767).foreach(bb.putShort)
    val w = WavCodec.decode(bb.array())
    assert(w == WavCodec.WavInfo(8000, 1, 16, 4, (0 + 1000 - 1000 + 32767) / 4.0))
  }

  test("WavCodec decode inverts encode; unknown chunks are skipped") {
    val samples = Array.tabulate(301)(i => ((i * 977) % 65536 - 32768).toShort)
    val w = WavCodec.decode(WavCodec.encode(44100, samples))
    assert(w.sampleRate == 44100 && w.nChannels == 1 &&
      w.bitsPerSample == 16 && w.nSamples == 301)
    assert(math.abs(w.meanSample -
      samples.map(_.toLong).sum.toDouble / samples.length) < 1e-12)
    // splice a LIST chunk between fmt and data: parser must skip it
    val plain = WavCodec.encode(8000, Array[Short](5, 7))
    val extra = java.nio.ByteBuffer.allocate(plain.length + 10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    extra.put(plain, 0, 36) // up to end of fmt chunk
    extra.put("LIST".getBytes("US-ASCII")); extra.putInt(2)
    extra.put(Array[Byte](1, 2))
    extra.put(plain, 36, plain.length - 36)
    val spliced = extra.array()
    // fix the RIFF size field for the added 10 bytes
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    assert(WavCodec.decode(spliced) == WavCodec.decode(plain))
    // corrupt magic must fail loudly
    val bad = plain.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] { WavCodec.decode(bad) }
  }

  test("BmpCodec decode inverts encode incl. row padding and bottom-up order") {
    // 3×2: row stride = 12 (3·3=9 padded to 12) — padding bytes in play
    val levels = Map((0, 0) -> 10, (1, 0) -> 20, (2, 0) -> 30,
      (0, 1) -> 40, (1, 1) -> 50, (2, 1) -> 60)
    val bytes = BmpCodec.encode(3, 2, (x, y) => levels((x, y)))
    assert(bytes.length == 54 + 12 * 2)
    assert(bytes(0) == 'B' && bytes(1) == 'M')
    // bottom-up: FIRST stored row is image row y=1 → blue byte = 40
    assert((bytes(54) & 0xff) == 40)
    val d = BmpCodec.decode(bytes)
    assert(d.width == 3 && d.height == 2 && d.bitsPerPixel == 24)
    assert(d.fileSize == bytes.length)
    assert(d.topLeft == 10) // image (0,0), i.e. first pixel of LAST stored row
    assert(math.abs(d.meanLevel - levels.values.sum / 6.0) < 1e-12)
    // 1×1 (stride 4, minimal) roundtrip
    val one = BmpCodec.decode(BmpCodec.encode(1, 1, (_, _) => 255))
    assert(one.width == 1 && one.height == 1 && one.topLeft == 255)
    // corrupt magic and truncated pixel array must fail loudly
    val bad = bytes.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] { BmpCodec.decode(bad) }
    intercept[IllegalArgumentException] { BmpCodec.decode(bytes.take(60)) }
  }
}
