package graft.streaming

import graft.{QueryRegistry, SparkSuite, Tables}
import graft.text.{TextQueries => TQ}
import org.apache.spark.sql.functions._

/** Pins tx_stream_ingest's ingest-then-serve contract on the sparse
  * channel: each night's logged probe must equal a FROM-SCRATCH index
  * over exactly the documents that had arrived by that night (base ∪
  * batch 1 for night 1; the full corpus for night 2) — so batch 2's
  * probe sees batch 1's documents AND the corpus-wide stats they
  * shifted, while batch 1's log stays point-in-time (no % 10 == 5 doc
  * can appear in it). The frozen counterfactual (the base index, never
  * upserted) provably contains no holdout doc at all.
  */
class TextStreamIngestSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def logRows() =
    QueryRegistry.byName("tx_stream_ingest").run(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

  private def freshProbe(docs: org.apache.spark.sql.DataFrame) = {
    val idx = java.nio.file.Files
      .createTempDirectory("txsi_fresh").toString
    TQ.writeTextIndex(spark, docs, idx)
    TQ.probeTextIndex(spark, idx).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
  }

  test("each night's log equals a from-scratch index over that " +
      "night's corpus; a frozen index cannot serve the holdout") {
    val rows = logRows()
    val d = Tables(spark, dir).documents.select(col("doc_id"), col("text"))

    // night 1: point-in-time rebuild equality over base ∪ batch 1
    val night1 = rows.filter(_._1 == 1).map(t => (t._2, t._3, t._4))
    assert(night1.sameElements(freshProbe(
      d.filter(col("doc_id") % 5 =!= 0 || col("doc_id") % 10 === 0))),
      "night-1 log != fresh build over base ∪ batch 1")
    // ...and it is point-in-time: batch 2's slice hadn't arrived
    assert(night1.forall(_._2 % 10 != 5),
      "a % 10 == 5 doc appears in night 1's log — the log is not " +
        "point-in-time")
    // the same-night half of the freshness contract: batch 1's own
    // docs are already servable in batch 1's probe
    assert(night1.exists(_._2 % 10 == 0),
      "no batch-1 doc in night 1's top-25 — the fixture no longer " +
        "exercises same-batch visibility")

    // night 2: cross-batch visibility + stats refresh — the final
    // index state is the full corpus, so the logged probe must equal
    // the index-less pipeline's index built from scratch over it
    val night2 = rows.filter(_._1 == 2).map(t => (t._2, t._3, t._4))
    assert(night2.sameElements(freshProbe(d)),
      "night-2 log != fresh build over the full corpus")
    assert(night2.exists(_._2 % 10 == 5),
      "no batch-2 doc in night 2's top-25 — the fixture no longer " +
        "exercises cross-batch-visible ingest")
    assert(!night1.sameElements(night2),
      "the two nights' probes are identical — the holdout no longer " +
        "moves the scores and the per-batch stats refresh is unpinned")

    // frozen counterfactual: the never-upserted base index has no
    // holdout postings to serve
    val frozen = freshProbe(d.filter(col("doc_id") % 5 =!= 0))
    assert(frozen.nonEmpty && frozen.forall(_._2 % 5 != 0),
      "the frozen counterfactual served a holdout doc — the fixture " +
        "no longer distinguishes the ingest loop")
    assert(!frozen.sameElements(night2),
      "frozen == night 2 — ingest changed nothing observable")
  }

  test("replay is deterministic (applied once per generation)") {
    val a = logRows()
    val b = logRows()
    assert(a.nonEmpty && a.sameElements(b), "replay diverged")
  }
}
