package graft.streaming

import graft.{QueryRegistry, SparkSuite, Tables}
import graft.multimodal.{Multimodal => MM}

/** Pins dd_video_stream_ingest's screen-then-ingest contract with the
  * planted cross-batch re-export wave: night 2 brightness-re-exports
  * (v = 1, same base g) night 1's FRESH clips — hash-IDENTICAL by the
  * contour fingerprint's invariance, so each admitted twin must
  * screen 'dup' AT HAMMING 0 in the loop's log while the frozen
  * counterfactual (the build-time index, never upserted) screens it
  * 'new'. The video twin of AudioStreamIngestSpec, completing the
  * ingest-loop scaffold's channel matrix.
  */
class VideoStreamIngestSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def logRows() =
    QueryRegistry.byName("dd_video_stream_ingest").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))

  test("night 2 catches night 1's admissions at Hamming 0; a frozen index cannot") {
    val rows = logRows()
    val d = Tables(spark, dir).documents

    // point-in-time: night 1's logged verdicts equal the stateless
    // screen against the build-time index
    val night1 = rows.filter(_._1 < 700000)
    val frozenIdx = MM.buildVideoIndex(spark, dir)
    val screen1 = MM.probeMediaIndex(spark, frozenIdx,
        MM.videoHashesOfParams(MM.videoIncoming(d)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(night1.sameElements(screen1),
      "night 1's log != the stateless screen — the log is not " +
        "point-in-time")

    // the cross-batch pin: night-2 re-exports (700000 ≤ id < 800000)
    // of ADMITTED night-1 fresh clips are 'dup' in the log but 'new'
    // against the frozen index — and at Hamming 0 exactly, because
    // the brightness shift cancels out of the contour hash
    val night2 = rows.filter(_._1 >= 700000).map(t => t._1 -> t).toMap
    val frozen2 = MM.probeMediaIndex(spark, frozenIdx,
        MM.videoHashesOfParams(MM.videoIncoming2(d)))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    val flips = night2.keys.filter(m => m < 800000 &&
      night2(m)._2 == "dup" && frozen2(m)._1 == "new").toSeq
    assert(flips.nonEmpty,
      "no night-2 re-export is caught ONLY because of night-1 ingest — " +
        "the fixture no longer distinguishes the ingest loop from a " +
        "stateless screen")
    flips.foreach { m =>
      assert(night2(m)._3 == 0,
        s"re-export $m screened dup at Hamming ${night2(m)._3}, not 0 — " +
          "the contour fingerprint lost its brightness invariance")
      val twin = night1.find(_._1 == m - 100000)
      assert(twin.exists(_._2 == "new"),
        s"flip $m has no admitted night-1 twin — the pin is vacuous")
    }
  }

  test("replay is deterministic (applied once per generation)") {
    val a = logRows()
    val b = logRows()
    assert(a.nonEmpty && a.sameElements(b), "replay diverged")
  }
}
