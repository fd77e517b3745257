package graft.streaming

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins ss_stream_ingest's ingest-then-serve contract with the planted
  * cross-batch twin pair: batch 2 re-submits batch 1's vectors verbatim
  * under new ids, and each must get its batch-1 twin back at rank 1 /
  * cos = 1.0 — possible ONLY because the loop upserted batch 1 into the
  * served index between the batches. The frozen counterfactual (the
  * build-time index, never upserted) provably cannot return them.
  */
class StreamVecIngestSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("batch 2's queries see batch 1's vectors; a frozen index cannot") {
    val rows = QueryRegistry.byName("ss_stream_ingest").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // batch 2's queries (+400000) each rank their batch-1 twin
    // (+300000, the identical vector) first at cos 1.0
    val b2rank1 = rows.filter(r => r._1 >= 400000 && r._2 == 1)
    assert(b2rank1.length == 8, s"expected 8 batch-2 queries: ${b2rank1.length}")
    b2rank1.foreach { case (qid, _, nid, cos) =>
      assert(nid == qid - 100000 && cos == 1.0,
        s"query $qid rank-1 is ($nid, $cos), not its ingested twin")
    }
    // batch 1's queries never see batch 2 (it hadn't arrived yet) —
    // the log is point-in-time, not a post-hoc recomputation
    assert(rows.filter(r => r._1 >= 300000 && r._1 < 400000)
      .forall(_._3 < 400000),
      "a batch-1 probe returned a batch-2 vector — the log is not " +
        "point-in-time")

    // frozen counterfactual: the never-upserted build-time index has
    // no +300000 vectors to return for batch 2's queries
    import graft.similarity.{SimilarityQueries => SQ}
    val idx   = SQ.buildIvfIndex(spark, dir)
    val cents = SQ.loadCentroids(spark, idx)
    val e     = graft.Tables(spark, dir).embeddings
    val batch2 = e.filter(col("vec_id") < 8)
      .select((col("vec_id") + 400000).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val probes = SQ.probesOfAll(batch2, cents)
    val assigned = spark.read.parquet(s"$idx/cells")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val frozen = SQ.rankTail(assigned, probes).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(frozen.nonEmpty)
    assert(frozen.forall(_._3 < 300000),
      "the frozen counterfactual returned an ingested id — the fixture " +
        "no longer distinguishes the ingest loop")
    assert(frozen.filter(_._2 == 1).forall(_._4 < 1.0),
      "a frozen rank-1 hit cos 1.0 — the reversed batch vectors " +
        "collide with the corpus and the twin pin is vacuous")
  }

  test("replay is deterministic (applied once per generation)") {
    val a = QueryRegistry.byName("ss_stream_ingest").run(spark, dir).collect()
    val b = QueryRegistry.byName("ss_stream_ingest").run(spark, dir).collect()
    assert(a.nonEmpty && a.sameElements(b), "replay diverged")
  }
}
