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

  test("every media blob decodes with its format's real parser") {
    import spark.implicits._
    val rows = extractFeatures(media.as[MediaRecord]).collect()
    assert(rows.nonEmpty)
    // a decoded mean is only produced after a successful parse; image
    // and video means are byte levels in [0, 256), audio means are PCM
    assert(rows.filter(r => r.media_type != "audio")
      .forall(r => r.mean_level >= 0 && r.mean_level < 256))
    assert(rows.forall(_.n_bytes > 0))
    // spot-check one image row against the closed-form synthesis params
    val img = rows.filter(_.media_type == "image").minBy(_.media_id)
    val id  = img.media_id
    val (w, h) = ((id % 31 + 1).toInt, (id % 17 + 1).toInt)
    assert(img.n_bytes == 54L + ((3 * w + 3) / 4 * 4) * h)
    val expMean = (0 until w * h).map(i => (id * 7 + i * 3) % 256).sum.toDouble / (w * h)
    assert(math.abs(img.mean_level - expMean) < 1e-9)
  }

  test("resize clamps width to max and preserves aspect ratio direction") {
    val out = resize(media.filter(col("width") > 16), maxW = 16)
    assert(out.filter(col("width") > 16).count() == 0)
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

  test("Y4mCodec.decode parses hand-written golden Y4M bytes") {
    // 2×2 C420jpeg at 30 fps, 2 frames — bytes written field by field,
    // independent of Y4mCodec.encode. Frame = 4 luma + 2 chroma bytes.
    val header = "YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val f0 = "FRAME\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40) ++ Array[Byte](99, 99)
    // second frame marker carries per-frame params — must still parse
    val f1 = "FRAME Xtest\n".getBytes("US-ASCII") ++
      Array[Byte](50, 60, 70, 80) ++ Array[Byte](1, 2)
    val d = Y4mCodec.decode(header ++ f0 ++ f1)
    assert(d.width == 2 && d.height == 2 && d.fpsNum == 30 && d.fpsDen == 1)
    assert(d.colorspace == "420jpeg" && d.nFrames == 2)
    assert(math.abs(d.firstFrameMean - (10 + 20 + 30 + 40) / 4.0) < 1e-12)
    assert(d.lastTopLeft == 50) // first luma byte of the LAST frame
    // mono: frame = w*h bytes, no chroma
    val mono = "YUV4MPEG2 W2 H1 Cmono\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ Array[Byte](7, 9)
    val m = Y4mCodec.decode(mono)
    assert(m.nFrames == 1 && m.firstFrameMean == 8.0 && m.fpsNum == 25)
  }

  test("Y4mCodec decode inverts encode; corrupt streams fail loudly") {
    val bytes = Y4mCodec.encode(4, 2, 24, 1, 5, (f, i) => f * 10 + i)
    val d = Y4mCodec.decode(bytes)
    assert(d.width == 4 && d.height == 2 && d.fpsNum == 24 && d.nFrames == 5)
    assert(math.abs(d.firstFrameMean - (0 until 8).sum / 8.0) < 1e-12)
    assert(d.lastTopLeft == 40)
    // zero-frame stream: header only, valid, walks to zero
    val empty = Y4mCodec.decode(Y4mCodec.encode(2, 2, 25, 1, 0, (_, _) => 0))
    assert(empty.nFrames == 0 && empty.firstFrameMean == 0.0)
    // bad magic, truncated frame, and garbage marker must all throw
    val bad = bytes.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] { Y4mCodec.decode(bad) }
    intercept[IllegalArgumentException] { Y4mCodec.decode(bytes.dropRight(3)) }
    val garbage = "YUV4MPEG2 W2 H2 C420jpeg\n".getBytes("US-ASCII") ++
      "NOTAFRAME\n".getBytes("US-ASCII") ++ new Array[Byte](6)
    intercept[IllegalArgumentException] { Y4mCodec.decode(garbage) }
    // crafted odd-width C420 header would mis-stride the frame walk
    val oddC420 = "YUV4MPEG2 W3 H2 C420jpeg\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ new Array[Byte](9)
    intercept[IllegalArgumentException] { Y4mCodec.decode(oddC420) }
  }

  test("frameSample's decoded frame count agrees with declared metadata") {
    import spark.implicits._
    val decoded = media.filter(col("media_type") === "video")
      .select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .map { case (id, bytes) => (id, Y4mCodec.decode(bytes).nFrames) }
      .toDF("media_id", "decoded")
    val declared = media.filter(col("media_type") === "video")
      .select(col("media_id"), col("n_frames").as("declared"))
    val joined = decoded.join(declared, "media_id")
    assert(joined.filter(col("decoded") =!= col("declared")).count() == 0)
    assert(joined.count() > 0)
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
    // crafted non-positive width and out-of-file pixel offset must fail
    // loudly too (not NaN means / arbitrary-offset reads)
    val zeroW = bytes.clone()
    zeroW(18) = 0; zeroW(19) = 0; zeroW(20) = 0; zeroW(21) = 0
    intercept[IllegalArgumentException] { BmpCodec.decode(zeroW) }
    val badOff = bytes.clone()
    badOff(10) = 0xff.toByte; badOff(11) = 0xff.toByte
    intercept[IllegalArgumentException] { BmpCodec.decode(badOff) }
  }

  test("BmpCodec.resizeNearest resamples pixel content with floor mapping") {
    // 4×2 source, grey(x, y) = 10·(y·4 + x) — distinct per pixel
    val src = BmpCodec.encode(4, 2, (x, y) => 10 * (y * 4 + x))
    // → 2×1: target (x, 0) samples source (⌊x·4/2⌋, ⌊0·2/1⌋) = (2x, 0)
    val down = BmpCodec.decode(BmpCodec.resizeNearest(src, 2, 1))
    assert(down.width == 2 && down.height == 1)
    assert(down.topLeft == 0) // source (0,0)
    assert(math.abs(down.meanLevel - (0 + 20) / 2.0) < 1e-12,
      s"2×1 resample must pick source pixels (0,0) and (2,0): $down")
    // upscale 4×2 → 8×2: each source pixel doubles horizontally
    val up = BmpCodec.decode(BmpCodec.resizeNearest(src, 8, 2))
    assert(up.width == 8 && up.height == 2)
    assert(math.abs(up.meanLevel - (0 to 7).map(i => 10 * i).sum / 8.0) < 1e-12)
    // identity resample reproduces the source stats byte-for-byte
    val same = BmpCodec.decode(BmpCodec.resizeNearest(src, 4, 2))
    val orig = BmpCodec.decode(src)
    assert(same.meanLevel == orig.meanLevel && same.topLeft == orig.topLeft)
    // invalid targets and malformed sources fail loudly
    intercept[IllegalArgumentException] { BmpCodec.resizeNearest(src, 0, 1) }
    val bad = src.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException] { BmpCodec.resizeNearest(bad, 2, 1) }
  }

  test("mm_audio_rms: windows tile every blob's sample count; decodeSamples round-trips") {
    val rows = graft.QueryRegistry.byName("mm_audio_rms")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("media_id")).foreach { case (_, ws) =>
      val sorted = ws.sortBy(_.getAs[Int]("window_no"))
      // contiguous window numbers; all full except possibly the last
      assert(sorted.map(_.getAs[Int]("window_no")).toSeq ==
        sorted.indices.map(identity))
      sorted.init.foreach(w => assert(w.getAs[Int]("n_samples") == 64))
      assert(sorted.last.getAs[Int]("n_samples") > 0)
      ws.foreach(w => assert(w.getAs[Double]("rms") >= 0.0))
    }
    // decodeSamples inverts encode exactly
    val samples = Array.tabulate(100)(i => (i * 321 - 16000).toShort)
    assert(graft.multimodal.WavCodec.decodeSamples(
      graft.multimodal.WavCodec.encode(8000, samples)).sameElements(samples))
  }

  test("mm_image_dhash: locality — a tiny perturbation moves few bits, a different image many") {
    import graft.multimodal.{BmpCodec, Multimodal}
    def img(step: Long, tweakAt: Int = -1): Array[Byte] =
      BmpCodec.encode(22, 12, (x, y) => {
        val i = y * 22 + x
        val g = ((35 + i * step) % 256).toInt
        if (i == tweakAt) ((g + 40) % 256) else g
      })
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base  = Multimodal.dhash60(img(3))
    // pixel 98 = (y=4, x=10) IS on the 11×6 sample grid — the
    // perturbation can touch at most the two comparisons that read it
    val tweak = Multimodal.dhash60(img(3, tweakAt = 98))
    val other = Multimodal.dhash60(img(97)) // different gradient structure
    assert(ham(base, tweak) <= 2, s"near-dup moved ${ham(base, tweak)} bits")
    assert(ham(base, other) >= 8, s"distinct image only ${ham(base, other)} bits apart")
  }

  test("mm_scenecut: frame walk, formula parity, and cut rule") {
    import graft.multimodal.Y4mCodec
    // golden: handcrafted 2-frame 2x2 mono-diff stream
    val bytes = Y4mCodec.encode(2, 2, 24, 1, 3, (f, i) => f * 100 + i)
    val (w, h, sums) = Y4mCodec.frameLumaSums(bytes)
    assert((w, h) == (2, 2))
    // frame f luma = {f*100+0 .. f*100+3} → sum = 4*100f + 6
    assert(sums.toSeq == Seq(6L, 406L, 806L))
    // per-frame sums from the REAL byte walk equal the synthesis
    // formula for a corpus row (the decode-vs-formula parity the
    // oracle relies on)
    val id = 7L; val nf = 5; val vw = ((id % 8) + 1).toInt * 2
    val vh = ((id % 4) + 1).toInt * 2
    val enc = Y4mCodec.encode(vw, vh, 24, 1, nf,
      (f, i) => ((id * 11 + f * 5L + i * 3L) % 256).toInt)
    val (_, _, s2) = Y4mCodec.frameLumaSums(enc)
    val expect = (0 until nf).map { f =>
      (0 until vw * vh).map(i => (id * 11 + f * 5L + i * 3L) % 256).sum
    }
    assert(s2.toSeq == expect)
    // the gated query: cut rule holds against a recompute on one row
    val rows = graft.QueryRegistry.byName("mm_scenecut")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cuts = r.getInt(2); val first = r.getLong(3)
      assert(cuts >= 0 && cuts < r.getInt(1))
      assert((cuts == 0) == (first == -1L))
      if (first >= 0) assert(first >= 1 && first < r.getInt(1))
    }
    // at least one video in the corpus shows a wrap-induced cut —
    // the +5/frame mod-256 ramp must wrap within 240 frames
    assert(rows.exists(_.getInt(2) > 0))
  }

  test("mm_audio_vad: segments are maximal active runs with exact energy") {
    val thrSS = 64L * 16384 * 16384
    val rows = graft.QueryRegistry.byName("mm_audio_vad")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    // recompute the window energies for every media id in the output
    // and check each segment is a MAXIMAL run of active full windows
    val byMedia = rows.groupBy(_.getLong(0))
    byMedia.foreach { case (id, segs) =>
      val nChars = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
        .where(col("doc_id") === id).select("n_chars").head().getLong(0)
      val n = (nChars % 240 + 1).toInt
      val ss = (0 until n / 64).map { w =>
        (w * 64 until w * 64 + 64).map { i =>
          val v = (id * 31 + i * 7) % 65536 - 32768
          v * v
        }.sum
      }
      val activeSet = ss.zipWithIndex.collect {
        case (e, w) if e > thrSS => w
      }.toSet
      val covered = segs.flatMap(r =>
        r.getInt(2) to r.getInt(3)).toSet
      assert(covered == activeSet,
        s"media $id: segments cover $covered, active windows $activeSet")
      segs.foreach { r =>
        val (first, last) = (r.getInt(2), r.getInt(3))
        assert(r.getLong(4) == last - first + 1)
        // maximality: the windows just outside the segment are inactive
        assert(!activeSet(first - 1) && !activeSet(last + 1))
        val energy = (first to last).map(ss).sum
        assert(r.getLong(5) == energy)
      }
    }
  }

  test("Hadamard kernel: full 64-bin transform satisfies Parseval") {
    // Σ_k c_k² = N·Σ_i x_i² for the complete (all-k) Walsh–Hadamard
    // transform — an exact integer identity that pins the kernel's
    // sign pattern (any popcount/index slip breaks it)
    val rnd = new scala.util.Random(7)
    val x = Array.fill(64)((rnd.nextInt(65536) - 32768).toLong)
    val coefs = (0 until 64).map { k =>
      (0 until 64).map { i =>
        x(i) * (if (java.lang.Integer.bitCount(k & i) % 2 == 0) 1 else -1)
      }.sum
    }
    val lhs = coefs.map(c => BigInt(c) * c).sum
    val rhs = BigInt(64) * x.map(v => BigInt(v) * v).sum
    assert(lhs == rhs, s"Parseval violated: $lhs vs $rhs")
  }

  test("mm_spectrogram: Hadamard coefficients match a direct recompute from decoded PCM") {
    val rows = graft.QueryRegistry.byName("mm_spectrogram")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    // six bins per window, windows contiguous from 0 per media id
    val byWin = rows.groupBy(r => (r.getLong(0), r.getInt(1)))
    byWin.values.foreach(ws =>
      assert(ws.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 4, 8, 16, 32)))
    // brute-force one media id end-to-end through the REAL decode path
    val id = rows.head.getLong(0)
    val nChars = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .where(col("doc_id") === id).select("n_chars").head().getLong(0)
    val n = (nChars % 240 + 1).toInt
    val synth = Array.tabulate(n)(i =>
      (((id * 31 + i * 7) % 65536) - 32768).toShort)
    val pcm = graft.multimodal.WavCodec.decodeSamples(
      graft.multimodal.WavCodec.encode(8000 + (id % 5).toInt * 2000, synth))
    val expect = pcm.grouped(64).zipWithIndex.flatMap { case (w, wi) =>
      Seq(1, 2, 4, 8, 16, 32).map { k =>
        (wi, k, w.zipWithIndex.map { case (x, i) =>
          x.toLong * (if (java.lang.Integer.bitCount(k & i) % 2 == 0) 1 else -1)
        }.sum)
      }
    }.toSeq
    val got = rows.filter(_.getLong(0) == id)
      .map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSeq.sorted
    assert(got == expect.sorted)
  }

  test("dd_image_dups: banded join equals an independent brute-force over closed-form hashes") {
    // Independent path: hashes from the SYNTHESIS FORMULA directly
    // (no BmpCodec encode→decode round-trip), pairs by brute-force
    // all-pairs with the band/cap semantics replayed list-at-a-time.
    val ids = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def hashOf(id: Long): Long = {
      val g = id - (id % 3); val v = id % 3
      val w = (g % 31 + 1).toInt; val h = (g % 17 + 1).toInt
      def grey(x: Int, y: Int): Long = (g * 7 + (y.toLong * w + x) * 3 + v) % 256
      (0 until 60).foldLeft(0L) { (acc, b) =>
        val gx = b % 10; val gy = b / 10
        val sy = gy * h / 6
        if (grey(gx * w / 11, sy) < grey((gx + 1) * w / 11, sy))
          acc | (1L << b)
        else acc
      }
    }
    val hs = ids.map(id => id -> hashOf(id)).toMap
    // band/cap replay
    val bandRows = for { id <- ids; b <- 0 until 6 }
      yield (b, (hs(id) >> (b * 10)) & 1023L, id)
    val counts = bandRows.groupBy(r => (r._1, r._2)).view.mapValues(_.length)
    val surviving = bandRows.filter(r => counts((r._1, r._2)) <= 50)
    val byBand = surviving.groupBy(r => (r._1, r._2))
    val expect = byBand.values.flatMap { rows =>
      val ms = rows.map(_._3).sorted
      for { i <- ms.indices; j <- (i + 1) until ms.length
            if java.lang.Long.bitCount(hs(ms(i)) ^ hs(ms(j))) <= 5 }
        yield (ms(i), ms(j), java.lang.Long.bitCount(hs(ms(i)) ^ hs(ms(j))))
    }.toSet
    val got = graft.QueryRegistry.byName("dd_image_dups")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(got.nonEmpty, "near-dup corpus produced zero pairs")
    // the planted brightness-shift near-dups are found: at least one
    // within-triple pair (same base image g, different shift) survives
    assert(got.exists { case (a, b, _) => a - (a % 3) == b - (b % 3) },
      "no within-triple brightness-shift pair found")
  }

  test("dd_image_clusters: labels are the exact components of dd_image_dups' pairs") {
    val pairs = graft.QueryRegistry.byName("dd_image_dups")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent union-find over the (already brute-verified) pairs
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map { id =>
      val members = parent.keys.filter(k => find(k) == find(id))
      id -> members.min
    }.toMap
    val got = graft.QueryRegistry.byName("dd_image_clusters")
      .run(spark, sf("sf0.001")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // canonical representative: each label is a member of its cluster
    got.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keySet.contains(lbl), s"label $lbl not in its cluster")
    }
  }

  test("dd_audio_dups: banded join equals an independent brute-force " +
      "over closed-form fingerprints, and finds every re-leveling") {
    // Independent path: WHT-sign fingerprints from the synthesis
    // formula directly (no WavCodec round-trip), brute-force pairs
    // with the band/cap semantics replayed.
    val ids = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val bins = Array(1, 2, 4, 8, 16, 32)
    def hashOf(id: Long): Long = {
      val g = id - (id % 3); val gain = 1L << (id % 3).toInt
      var h = 0L
      for (win <- 0 until 10; bi <- 0 until 6) {
        var c = 0L
        for (j <- 0 until 64) {
          val i = win * 64 + j
          val s0 = (g * 2654435761L + i.toLong * 7 +
            (g % 13 + 1) * i.toLong * i +
            (g % 29 + 1) * i.toLong * 11) % 65536 - 32768
          val sign = if (java.lang.Integer.bitCount(bins(bi) & j) % 2 == 0) 1 else -1
          c += (s0 / gain) * sign
        }
        if (c < 0) h |= 1L << (win * 6 + bi)
      }
      h
    }
    val hs = ids.map(id => id -> hashOf(id)).toMap
    val bandRows = for { id <- ids; b <- 0 until 6 }
      yield (b, (hs(id) >> (b * 10)) & 1023L, id)
    val counts = bandRows.groupBy(r => (r._1, r._2)).view.mapValues(_.length)
    val surviving = bandRows.filter(r => counts((r._1, r._2)) <= 50)
    val expect = surviving.groupBy(r => (r._1, r._2)).values.flatMap { rows =>
      val ms = rows.map(_._3).sorted
      for { i <- ms.indices; j <- (i + 1) until ms.length
            if java.lang.Long.bitCount(hs(ms(i)) ^ hs(ms(j))) <= 5 }
        yield (ms(i), ms(j), java.lang.Long.bitCount(hs(ms(i)) ^ hs(ms(j))))
    }.toSet
    val got = graft.QueryRegistry.byName("dd_audio_dups")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    // every gain-shifted re-leveling of every complete triple is found
    val groups = ids.groupBy(id => id - (id % 3))
    groups.foreach { case (g, members) =>
      for (a <- members; b <- members if a < b)
        assert(got.exists(p => p._1 == a && p._2 == b),
          s"re-leveling pair ($a, $b) of clip $g missed")
    }
  }

  test("dd_video_dups: contour hash is brightness-shift INVARIANT and " +
      "matches an independent closed-form recomputation") {
    val ids = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    // independent truth: fingerprints from the per-frame BASE walk
    // (the uniform shift and constant ramp cancel out of consecutive
    // comparisons — the invariance under test)
    def hashOf(id: Long): Long = {
      val g = id - (id % 3)
      def base(f: Long): Long =
        ((g * 2654435761L + f * f * ((g % 97) + 1) * 31 +
          f * ((g % 89) + 1) * 7) % 65521) % 200
      (0 until 60).foldLeft(0L) { (acc, b) =>
        if (base(b + 1) < base(b)) acc | (1L << b) else acc
      }
    }
    val hs = ids.map(id => id -> hashOf(id)).toMap
    // shift invariance: all three variants of a group hash identically
    ids.groupBy(id => id - (id % 3)).values.foreach { ms =>
      assert(ms.map(hs).toSet.size == 1, s"variants of ${ms.min} diverge")
    }
    val bandRows = for { id <- ids; b <- 0 until 6 }
      yield (b, (hs(id) >> (b * 10)) & 1023L, id)
    val counts = bandRows.groupBy(r => (r._1, r._2)).view.mapValues(_.length)
    val surviving = bandRows.filter(r => counts((r._1, r._2)) <= 50)
    val expect = surviving.groupBy(r => (r._1, r._2)).values.flatMap { rows =>
      val ms = rows.map(_._3).sorted
      for { i <- ms.indices; j <- (i + 1) until ms.length
            if java.lang.Long.bitCount(hs(ms(i)) ^ hs(ms(j))) <= 5 }
        yield (ms(i), ms(j), java.lang.Long.bitCount(hs(ms(i)) ^ hs(ms(j))))
    }.toSet
    val got = graft.QueryRegistry.byName("dd_video_dups")
      .run(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
    assert(got.nonEmpty)
  }

  test("mm_av_sync: flags exactly the planted truncated tracks; in-sync " +
      "drift is bounded by one audio sample period") {
    val rows = graft.QueryRegistry.byName("mm_av_sync")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id    = r.getAs[Long]("media_id")
      val drift = r.getAs[Long]("drift_us")
      val sync  = r.getAs[Boolean]("out_of_sync")
      assert(sync == (id % 7 == 0),
        s"media $id: out_of_sync=$sync but planted=${id % 7 == 0}")
      if (id % 7 != 0) {
        // an untruncated track differs from the video duration only by
        // the truncation of samples = nf*rate/fps: at most one sample
        // period (1e6/rate ≤ 125 µs at the slowest rate)
        assert(math.abs(drift) <= 125, s"media $id: in-sync drift $drift µs")
      }
    }
    val flagged = rows.count(_.getAs[Boolean]("out_of_sync"))
    assert(flagged > 0 && flagged < rows.length, "flag must split the corpus")
  }
}
