package graft.similarity

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins ss_ivfpq_probe's persisted-compressed-index contract: the probe
  * answers row-for-row what the in-job IVF-PQ pipeline computes, from
  * an index whose corpus-sized table carries ONLY the 4 one-byte PQ
  * codes (the 64× compression claim — no embedding column persists in
  * cells/), partition-pruned to the probed cells, with no train pass
  * in the probe plan.
  */
class IvfPqProbeSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("probe == the in-job IVF-PQ pipeline, row for row") {
    val probe = QueryRegistry.byName("ss_ivfpq_probe").run(spark, dir)
    val topk  = QueryRegistry.byName("ss_ivfpq_topk").run(spark, dir)
    assert(probe.count() > 0)
    assert(probe.exceptAll(topk).count() == 0)
    assert(topk.exceptAll(probe).count() == 0)
  }

  test("the persisted cells table is code-only (compressed), codes are bytes") {
    val idx = SimilarityQueries.buildIvfPqIndex(spark, dir)
    val cells = spark.read.parquet(s"$idx/cells")
    val fields = cells.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(!fields.contains("embedding"),
      "the compressed index persists raw embeddings — the whole point " +
        "of the PQ family is that it must not")
    (0 until 4).foreach { sub =>
      assert(fields(s"c$sub") ==
        org.apache.spark.sql.types.ByteType,
        s"c$sub is not a one-byte code: ${fields(s"c$sub")}")
    }
    // the model tables are the bounded collects the probe loads
    assert(spark.read.parquet(s"$idx/centroids").count() <= 16)
    assert(spark.read.parquet(s"$idx/codebooks").count() <= 4 * 16)
  }

  test("the probe plan prunes to the probed cells and never trains") {
    val probe = QueryRegistry.byName("ss_ivfpq_probe").run(spark, dir)
    val plan  = probe.queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivfpq_index"), s"no index scan in:\n$plan")
    assert(plan.contains("PartitionFilters: [cell"),
      s"index scan not partition-pruned:\n$plan")
    assert(!plan.contains("m_1") && !plan.contains("avg("),
      s"train pass leaked into the probe plan:\n$plan")
    // the full-width vector never leaves the QUERY side: the index
    // scan reads codes only (raw embeddings are scanned solely to
    // route the bounded probe batch)
    val idxScanLines = plan.linesIterator
      .filter(_.contains("graft_ivfpq_index")).toSeq
    assert(idxScanLines.nonEmpty, s"no ivfpq index scan line in:\n$plan")
    assert(idxScanLines.forall(!_.contains("embedding")),
      s"the compressed index scan reads an embedding column:\n" +
        idxScanLines.mkString("\n"))
  }

  test("probe == fixed-model rebuild after the corpus shrinks (model seam)") {
    // writeIvfPqIndex with a FIXED model over a subset must equal the
    // encode of exactly that subset — the seam the maintenance paths
    // (upsert/delete, if extended to this family) would rely on
    val e = graft.Tables(spark, dir).embeddings
    val cents    = SimilarityQueries.trainIvfCentroids(e, 16)
    val codebook = SimilarityQueries.trainPqCodebooks(e)
    def tmp(tag: String): String = {
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_ivfpq_spec_$tag").toFile
      d.deleteOnExit()
      d.getAbsolutePath + "/idx"
    }
    val full = tmp("f"); val part = tmp("p")
    SimilarityQueries.writeIvfPqIndex(spark, e, cents, codebook, full)
    val survivors = e.filter(col("vec_id") % 7 =!= 3)
    SimilarityQueries.writeIvfPqIndex(spark, survivors, cents, codebook, part)
    val fullRows = spark.read.parquet(s"$full/cells")
      .filter(col("vec_id") % 7 =!= 3)
    val partRows = spark.read.parquet(s"$part/cells")
    assert(fullRows.exceptAll(partRows).count() == 0)
    assert(partRows.exceptAll(fullRows).count() == 0)
  }
}
