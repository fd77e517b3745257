package graft.streaming

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins dd_stream_ingest's admit-AND-ingest contract with the planted
  * cross-batch near-dup pair: batch 2 re-submits batch 1's fresh texts
  * verbatim under new ids, and they flag 'dup' at 1.0 ONLY because the
  * composed loop ingested batch 1's admissions between the batches — a
  * stateless screen of the same batch against the un-extended index
  * provably admits them a second time. Replay is deterministic (the
  * demo rebuilds its private index per run).
  */
class StreamIngestSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("batch 2 catches batch 1's near-dups; a stateless screen misses them") {
    val rows = QueryRegistry.byName("dd_stream_ingest").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val resubmits = rows.filter(r => r._1 >= 700000 && r._1 < 800000)
    assert(resubmits.nonEmpty, "fixture lost its cross-batch pairs")
    assert(resubmits.forall(r => r._2 == "dup" && r._3 == 1.0),
      s"cross-batch near-dups not caught: ${resubmits.filterNot(_._2 == "dup").take(3).toSeq}")
    val wave = rows.filter(_._1 >= 800000)
    assert(wave.nonEmpty && wave.forall(_._2 == "new"),
      "the genuinely-new second wave was rejected")
    // batch 1's own verdicts are untouched by the composition: the
    // src0 re-submissions are dups against the corpus, the fresh docs
    // admitted
    assert(rows.filter(r => r._1 >= 500000 && r._1 < 600000)
      .forall(_._2 == "dup"))
    assert(rows.filter(r => r._1 >= 600000 && r._1 < 700000)
      .forall(_._2 == "new"))

    // the counterfactual: the SAME batch 2 screened statelessly against
    // the un-extended corpus index admits every re-submit — the ingest
    // step is what catches them
    import graft.dedup.{DedupQueries => DQ}
    val stateless = DQ.probeBandIndex(spark, DQ.buildBandIndex(spark, dir),
        DQ.ingestBatch2(graft.Tables(spark, dir).documents))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val statelessResubmits =
      stateless.filter(r => r._1 >= 700000 && r._1 < 800000)
    assert(statelessResubmits.nonEmpty &&
      statelessResubmits.forall(_._2 == "new"),
      "the stateless counterfactual unexpectedly caught the cross-batch " +
        "pairs — the fixture no longer distinguishes the composed loop")
  }

  test("replay is deterministic") {
    val a = QueryRegistry.byName("dd_stream_ingest").run(spark, dir).collect()
    val b = QueryRegistry.byName("dd_stream_ingest").run(spark, dir).collect()
    assert(a.sameElements(b), "replay diverged")
  }
}
