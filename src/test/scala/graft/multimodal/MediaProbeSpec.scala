package graft.multimodal

import graft.{QueryRegistry, SparkSuite, Tables}

/** Pins the audio/video admission screens' channel separation — each
  * fixture must exercise BOTH verdicts (re-encode wave caught dup,
  * fresh wave admitted new), the video re-export wave must screen at
  * Hamming 0 (the contour fingerprint's brightness invariance is the
  * channel's reason to exist), and both channels must share the ONE
  * media-index kernel (probe-after-upsert == rebuild carries over from
  * ImageIndexSpec because the kernel is the same code; here the pin is
  * that each channel's fingerprint actually feeds it sensibly).
  */
class MediaProbeSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def rows(q: String) =
    QueryRegistry.byName(q).run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))

  test("audio screen: re-levelings dup, fresh clips new") {
    val vs = rows("dd_audio_probe")
    val (reenc, fresh) = vs.partition(_._1 < 600000)
    assert(reenc.nonEmpty && fresh.nonEmpty)
    assert(reenc.count(_._2 == "dup") * 10 >= reenc.length * 9,
      "gain-8 re-levelings are not screening dup — the WHT fingerprint " +
        "lost its gain robustness")
    assert(fresh.count(_._2 == "new") * 10 >= fresh.length * 9,
      "fresh clips are not screening new — the fingerprint space " +
        "collapsed (the image-channel dimension degeneracy)")
  }

  test("video screen: brightness re-exports dup at Hamming 0, fresh new") {
    val vs = rows("dd_video_probe")
    val (reenc, fresh) = vs.partition(_._1 < 600000)
    assert(reenc.nonEmpty && fresh.nonEmpty)
    // the v=3 re-export is hash-identical by construction — every one
    // must screen dup with best_hamming == 0
    assert(reenc.forall(r => r._2 == "dup" && r._3 == 0),
      "a brightness re-export did not screen dup at Hamming 0 — the " +
        "contour fingerprint lost its brightness invariance")
    assert(fresh.count(_._2 == "new") * 10 >= fresh.length * 9,
      "fresh clips are not screening new")
  }

  test("the shared kernel serves all three channels (replay stable)") {
    Seq("dd_audio_probe", "dd_video_probe").foreach { q =>
      val a = rows(q); val b = rows(q)
      assert(a.nonEmpty && a.sameElements(b), s"$q replay diverged")
    }
    // the three corpora are the same ids through three fingerprints —
    // the indexes must not alias each other's families
    val img = Multimodal.buildImageIndex(spark, dir)
    val aud = Multimodal.buildAudioIndex(spark, dir)
    val vid = Multimodal.buildVideoIndex(spark, dir)
    assert(Set(img, aud, vid).size == 3, "media index families collide")
  }
}
