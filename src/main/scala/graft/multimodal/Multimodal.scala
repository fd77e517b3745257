package graft.multimodal

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video handled as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract
  * / resize / frame-sample stages.
  *
  * Two decode tiers:
  *  - AUDIO is decoded FOR REAL: [[WavCodec]] parses RIFF/WAVE PCM
  *    byte-for-byte inside the batched per-partition seam
  *    (`mm_wav_decode` below; golden-tested in MultimodalSpec).
  *  - image/video remain a clearly-marked STUB (`StubDecoder`) — this
  *    container has no image codecs — with the Spark-side plumbing
  *    (binary + metadata schema, batched UDF shape, partitioning)
  *    real and tested. Swapping `StubDecoder.decode` for a JNI/codec
  *    call changes no plan shape.
  *
  * Scale notes: media blobs are the widest column by far — every query
  * prunes to (id, meta) before any shuffle and touches `content` only
  * in the narrow per-partition decode pass; nothing ever shuffles raw
  * bytes. Feature extraction is mapPartitions-batched so a real decoder
  * can amortize model/codec init per partition (the JVM analog of a
  * pandas-batched UDF).
  */
object Multimodal {

  /** Typed metadata carried next to the opaque bytes. */
  case class MediaMeta(width: Int, height: Int, sampleRate: Int, nFrames: Int)

  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      content: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: String,
      mean_level: Double) // stub for luma/loudness

  /** STUB decoder — deterministic fake standing in for a codec.
    * Real implementation would parse the container format; the stub
    * computes byte statistics so tests have exact expectations.
    */
  object StubDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.content
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
      MediaFeatures(
        r.media_id, r.media_type, bytes.length.toLong,
        java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString,
        mean)
    }
  }

  /** Deterministic binary corpus derived from `documents` (the test
    * environment ships no binary table): content = UTF-8 bytes of the
    * text; media_type round-robins image/audio/video; metadata derived
    * from n_chars. Stands in for `spark.read.parquet` of a real media
    * table with the same schema.
    */
  def mediaTable(t: Tables): DataFrame =
    t.documents.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      (col("n_chars") % 1920).cast("int").as("width"),
      (col("n_chars") % 1080).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") % 240 + 1).cast("int").as("n_frames"))

  /** Batched per-partition decode — the real-decoder seam. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-partition init seam: a real decoder opens its codec here once
      batch.map(StubDecoder.decode)
    }
  }

  /** Resize: pure metadata transform (a real impl also re-encodes
    * `content`; the stub scales the declared dimensions only).
    */
  def resize(media: DataFrame, maxW: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxW) / greatest(col("width"), lit(1)))
    media
      .withColumn("width", (col("width") * scale).cast("int"))
      .withColumn("height", (col("height") * scale).cast("int"))
  }

  /** Frame sampling for video rows: one output row per kept frame,
    * every `step`-th frame. Explode happens on (id, frame_no) only —
    * content bytes are not duplicated per frame.
    */
  def frameSample(media: DataFrame, step: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
          .as("frame_no"))

  /** Feature extraction as a declared query (columnar twin of
    * [[extractFeatures]]; identical outputs, oracle-checkable).
    */
  val features = Query(
    "mm_features",
    (s, dir) => {
      mediaTable(Tables(s, dir))
        .select(
          col("media_id"), col("media_type"),
          length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("checksum"),
          round(graft.functions.BinaryFunctions.byteMean(col("content")), 4)
            .as("mean_level"))
        .orderBy(col("media_id"))
    },
    // text is ASCII, so bytes == codepoints and md5(blob) == md5(text)
    oracle = Some("""
      SELECT doc_id AS media_id,
        ['image','audio','video'][(doc_id % 3 + 1)::INT] AS media_type,
        octet_length(encode(text)) AS n_bytes,
        md5(text) AS checksum,
        round(list_sum(list_transform(string_split_regex(text, ''),
          c -> ord(c)))::DOUBLE / octet_length(encode(text)), 4) AS mean_level
      FROM documents ORDER BY media_id
    """),
  )

  /** Frame sampling as a declared query: every 7th frame of each video. */
  val frames = Query(
    "mm_frame_sample",
    (s, dir) => {
      frameSample(mediaTable(Tables(s, dir)), step = 7)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_sampled"), max(col("frame_no")).as("last_frame"))
        .orderBy(col("media_id"))
    },
    oracle = Some("""
      SELECT doc_id AS media_id,
        len(range(0, (n_chars % 240 + 1)::INT, 7)) AS n_sampled,
        list_max(range(0, (n_chars % 240 + 1)::INT, 7)) AS last_frame
      FROM documents
      WHERE doc_id % 3 = 2  -- ['image','audio','video'][3] = 'video'
      ORDER BY media_id
    """),
  )

  /** Real audio decode: a deterministic WAV corpus is synthesized from
    * `documents` parameters (rate, sample count, and a PCM waveform are
    * all pure functions of doc_id/n_chars), encoded to real RIFF bytes,
    * and then every output field is read back by PARSING those bytes
    * with [[WavCodec.decode]] in the batched per-partition seam. The
    * oracle recomputes the parameters directly — if either the encoder
    * or the byte-walking parser is wrong, the values diverge.
    *
    * Scale shape: generation+decode are one narrow mapPartitions pass;
    * blobs never shuffle (the only exchange is the final sort).
    */
  val wavDecode = Query(
    "mm_wav_decode",
    (s, dir) => {
      import s.implicits._
      val params = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      val decoded = params.mapPartitions { it =>
        it.map { case (id, nChars) =>
          val rate    = 8000 + (id % 5).toInt * 2000
          val n       = (nChars % 240 + 1).toInt
          val samples = Array.tabulate(n)(i =>
            (((id * 31 + i * 7) % 65536) - 32768).toShort)
          val w = WavCodec.decode(WavCodec.encode(rate, samples))
          (id, w.sampleRate, w.nChannels, w.bitsPerSample, w.nSamples,
            w.nSamples * 1000L / w.sampleRate, w.meanSample)
        }
      }.toDF("media_id", "sample_rate", "n_channels", "bits_per_sample",
        "n_samples", "duration_ms", "mean_sample")
      decoded
        .withColumn("mean_sample", round(col("mean_sample"), 4))
        .orderBy(col("media_id"))
    },
    oracle = Some("""
      SELECT doc_id AS media_id,
        (8000 + (doc_id % 5) * 2000)::INT AS sample_rate,
        1 AS n_channels,
        16 AS bits_per_sample,
        (n_chars % 240 + 1)::INT AS n_samples,
        (n_chars % 240 + 1) * 1000 // (8000 + (doc_id % 5) * 2000)
          AS duration_ms,
        round(list_sum(list_transform(range(0, (n_chars % 240 + 1)::INT),
          i -> (doc_id * 31 + i * 7) % 65536 - 32768))::DOUBLE
          / (n_chars % 240 + 1), 4) AS mean_sample
      FROM documents ORDER BY media_id
    """),
  )

  /** Real image decode, same contract as [[wavDecode]]: a deterministic
    * 24bpp BMP corpus is synthesized (dimensions and grey levels are
    * pure functions of doc_id), encoded to real DIB bytes, and every
    * output field is read back by PARSING those bytes with
    * [[BmpCodec.decode]] — including the row padding and bottom-up row
    * order (top_left only comes out right if the parser walks the pixel
    * array correctly). The oracle recomputes the parameters directly.
    *
    * Grey level at image-linear index i (= y·w + x) is
    * (doc_id·7 + i·3) mod 256.
    */
  val bmpDecode = Query(
    "mm_bmp_decode",
    (s, dir) => {
      import s.implicits._
      val params = Tables(s, dir).documents.select(col("doc_id")).as[Long]
      val decoded = params.mapPartitions { it =>
        it.map { id =>
          val w = (id % 31 + 1).toInt
          val h = (id % 17 + 1).toInt
          val bytes = BmpCodec.encode(w, h,
            (x, y) => ((id * 7 + (y.toLong * w + x) * 3) % 256).toInt)
          val b = BmpCodec.decode(bytes)
          (id, b.width, b.height, b.bitsPerPixel, b.fileSize, b.meanLevel,
            b.topLeft)
        }
      }.toDF("media_id", "width", "height", "bits_per_pixel", "file_size",
        "mean_level", "top_left")
      decoded
        .withColumn("mean_level", round(col("mean_level"), 4))
        .orderBy(col("media_id"))
    },
    oracle = Some("""
      SELECT doc_id AS media_id,
        (doc_id % 31 + 1)::INT AS width,
        (doc_id % 17 + 1)::INT AS height,
        24 AS bits_per_pixel,
        (54 + ((3 * (doc_id % 31 + 1) + 3) // 4 * 4) * (doc_id % 17 + 1))::INT
          AS file_size,
        round(list_sum(list_transform(
          range(0, ((doc_id % 31 + 1) * (doc_id % 17 + 1))::INT),
          i -> (doc_id * 7 + i * 3) % 256))::DOUBLE
          / ((doc_id % 31 + 1) * (doc_id % 17 + 1)), 4) AS mean_level,
        ((doc_id * 7) % 256)::INT AS top_left
      FROM documents ORDER BY media_id
    """),
  )

  def all: Seq[Query] = Seq(features, frames, wavDecode, bmpDecode)
}
