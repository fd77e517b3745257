package graft.streaming

import graft.{QueryRegistry, SparkSuite, Tables}
import graft.multimodal.{Multimodal => MM}

/** Pins dd_audio_stream_ingest's screen-then-ingest contract with the
  * planted cross-batch re-level wave: night 2 re-levels (gain 2, same
  * base g) night 1's FRESH clips — at least one must screen 'dup' in
  * the loop's log while the frozen counterfactual (the build-time
  * index, never upserted) screens it 'new', which is possible ONLY
  * because night 1's admissions were ingested between the batches.
  * The audio twin of ImageStreamIngestSpec, driving the ONE
  * ingest-loop scaffold through its second media channel.
  */
class AudioStreamIngestSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def logRows() =
    QueryRegistry.byName("dd_audio_stream_ingest").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))

  test("night 2 catches night 1's admissions; a frozen index cannot") {
    val rows = logRows()
    val d = Tables(spark, dir).documents

    // point-in-time: night 1's logged verdicts equal the stateless
    // screen against the build-time index (nothing had been ingested
    // yet when night 1 ran)
    val night1 = rows.filter(_._1 < 700000)
    val frozenIdx = MM.buildAudioIndex(spark, dir)
    val screen1 = MM.probeMediaIndex(spark, frozenIdx,
        MM.audioHashesOfParams(MM.audioIncoming(d)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(night1.sameElements(screen1),
      "night 1's log != the stateless screen — the log is not " +
        "point-in-time")

    // the cross-batch pin: some night-2 re-level (700000 ≤ id <
    // 800000) of an ADMITTED night-1 fresh clip is 'dup' in the log
    // but 'new' against the frozen index
    val night2 = rows.filter(_._1 >= 700000).map(t => t._1 -> t).toMap
    val frozen2 = MM.probeMediaIndex(spark, frozenIdx,
        MM.audioHashesOfParams(MM.audioIncoming2(d)))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    val flips = night2.keys.filter(m => m < 800000 &&
      night2(m)._2 == "dup" && frozen2(m)._1 == "new")
    assert(flips.nonEmpty,
      "no night-2 re-level is caught ONLY because of night-1 ingest — " +
        "the fixture no longer distinguishes the ingest loop from a " +
        "stateless screen")
    // and the admitted originals really were fresh: each flip's twin
    // (id − 100000) screened 'new' in night 1
    flips.foreach { m =>
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
