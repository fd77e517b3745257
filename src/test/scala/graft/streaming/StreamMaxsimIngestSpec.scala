package graft.streaming

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins ss_maxsim_stream_ingest's ingest-then-serve contract on the
  * MULTI-VECTOR channel with the planted cross-batch twin pair: batch
  * 2 re-submits batch 1's documents verbatim under new ids — identical
  * token vectors encode to identical PQ codes under the frozen models,
  * so each batch-2 query document must see its batch-1 twin in its
  * top-3 at the maximum achievable MaxSim score — possible ONLY
  * because the loop MERGEd batch 1's tokens into BOTH persisted copies
  * between the batches. The frozen counterfactual (the build-time
  * index, never upserted) provably cannot return them.
  */
class StreamMaxsimIngestSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("batch 2's documents see batch 1's twins; a frozen index cannot") {
    val rows = QueryRegistry.byName("ss_maxsim_stream_ingest")
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // each batch-2 query doc (30000+d) has TWO verbatim twins — the
    // original (d) and the batch-1 clone (20000+d) — and both carry
    // the identical (maximal) reconstructed MaxSim score, so both must
    // sit in the top-3, the clone ONLY because the loop ingested it
    val byQ = rows.filter(_._1 >= 30000).groupBy(_._1)
    assert(byQ.size == 5, s"expected 5 batch-2 query docs: ${byQ.size}")
    byQ.foreach { case (qdoc, rs) =>
      val d = qdoc - 30000
      assert(rs.exists(_._3 == 20000 + d),
        s"query doc $qdoc's top-3 is missing its ingested twin ${20000 + d}")
      assert(rs.exists(_._3 == d),
        s"query doc $qdoc's top-3 is missing the original $d")
      val best = rs.map(_._4).max
      assert(rs.find(_._3 == 20000 + d).get._4 == best,
        s"query doc $qdoc's ingested twin is not at the maximum score")
    }
    // batch 1's queries never see batch 2 (point-in-time log)
    assert(rows.filter(r => r._1 >= 20000 && r._1 < 30000)
      .forall(_._3 < 30000),
      "a batch-1 probe returned a batch-2 document — the log is not " +
        "point-in-time")

    // frozen counterfactual: the never-upserted build-time index has
    // no clone documents to return for batch 2's queries
    import graft.similarity.{SimilarityQueries => SQ}
    val idx = SQ.buildMaxsimIndex(spark, dir)
    val b2 = graft.Tables(spark, dir).embeddings
      .filter(col("vec_id") < 50)
      .select((col("vec_id") + 300000).as("vec_id"), col("embedding"))
    val frozen = SQ.maxsimProbeFor(spark, idx, b2).collect()
    assert(frozen.nonEmpty && frozen.forall(_.getLong(2) < 20000),
      "the frozen index returned an ingested document — the " +
        "counterfactual is vacuous")
  }

  test("replay is deterministic (applied once per generation)") {
    def run() = QueryRegistry.byName("ss_maxsim_stream_ingest")
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(run().sameElements(run()), "replay diverged")
  }
}
