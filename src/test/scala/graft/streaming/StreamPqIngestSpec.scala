package graft.streaming

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins ss_pq_stream_ingest's ingest-then-serve contract on the
  * COMPRESSED channel with the planted cross-batch twin pair: batch 2
  * re-submits batch 1's vectors verbatim under new ids — identical
  * vectors encode to identical PQ codes under the frozen models, so
  * each batch-2 query must see its batch-1 twin at the minimum ADC
  * distance in its top-5 — possible ONLY because the loop MERGEd
  * batch 1's codes into the served index between the batches. The
  * frozen counterfactual (the build-time index, never upserted)
  * provably cannot return them.
  */
class StreamPqIngestSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("batch 2's queries see batch 1's codes; a frozen index cannot") {
    val rows = QueryRegistry.byName("ss_pq_stream_ingest").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // each batch-2 query (+400000) has its batch-1 twin (+300000, the
    // identical vector ⇒ identical codes ⇒ the minimum achievable ADC
    // distance) inside its top-5, at that query's minimum adist
    val byQ = rows.filter(_._1 >= 400000).groupBy(_._1)
    assert(byQ.size == 8, s"expected 8 batch-2 queries: ${byQ.size}")
    byQ.foreach { case (qid, rs) =>
      val twin = rs.find(_._3 == qid - 100000)
      assert(twin.nonEmpty,
        s"query $qid's top-5 is missing its ingested twin ${qid - 100000}")
      assert(twin.get._4 == rs.map(_._4).min,
        s"query $qid's twin is not at the minimum ADC distance")
    }
    // batch 1's queries never see batch 2 (it hadn't arrived yet) —
    // the log is point-in-time, not a post-hoc recomputation
    assert(rows.filter(r => r._1 >= 300000 && r._1 < 400000)
      .forall(_._3 < 400000),
      "a batch-1 probe returned a batch-2 vector — the log is not " +
        "point-in-time")

    // frozen counterfactual: the never-upserted build-time index has
    // no +300000 codes to return for batch 2's queries
    import graft.similarity.{SimilarityQueries => SQ}
    val idx = SQ.buildIvfPqIndex(spark, dir)
    val b2 = graft.Tables(spark, dir).embeddings
      .filter(col("vec_id") < 8)
      .select((col("vec_id") + 400000).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val frozen = SQ.ivfPqProbeBatch(spark, idx, b2).collect()
    assert(frozen.nonEmpty && frozen.forall(_.getLong(2) < 300000),
      "the frozen index returned an ingested id — the counterfactual " +
        "is vacuous")
  }

  test("replay is deterministic (applied once per generation)") {
    def run() = QueryRegistry.byName("ss_pq_stream_ingest")
      .run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val a = run(); val b = run()
    assert(a.nonEmpty && a.sameElements(b), "replay diverged")
  }
}
