package graft.similarity

import graft.{QueryRegistry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Pins the REAL retrain gate (r14 verdict asks #2+#3): the corpus
  * fit profiles persist INSIDE the index at build time, the drift
  * monitor and the gate read them instead of re-scanning the corpus,
  * and the gate actually gates — a drift-free batch upserts, the
  * retrain is DECLINED, generation 1 keeps serving and no generation-2
  * directory ever exists; the drifting demo batch trips it.
  */
class DriftGateSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def e = Tables(spark, dir).embeddings
    .select(col("vec_id"), col("embedding"))

  /** Corpus vectors re-submitted under fresh ids: every subvector (and
    * every full vector) is something the models were trained ON, so
    * its reconstruction error / coherence can never be strictly worse
    * than the training worst — n_worse = 0 by construction.
    */
  private def driftFreeBatch = e.filter(col("vec_id").between(200, 299))
    .select((col("vec_id") + 300000).as("vec_id"), col("embedding"))

  private def driftingBatch = e.filter(col("vec_id") < 100)
    .select((col("vec_id") + 200000).as("vec_id"),
      reverse(col("embedding")).as("embedding"))

  test("both builds persist their fit profile; values match a recomputation") {
    val pqIdx = SimilarityQueries.buildIvfPqIndex(spark, dir)
    val prof = spark.read.parquet(s"$pqIdx/profile")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(prof.keySet == Set(0, 1, 2, 3), s"bad profile subspaces: $prof")
    assert(prof.values.forall(_ > 0d))
    val ivfIdx = SimilarityQueries.buildIvfIndex(spark, dir)
    val iprof = spark.read.parquet(s"$ivfIdx/profile")
    assert(iprof.columns.toSeq == Seq("cell", "corpus_min", "n"))
    assert(iprof.count() > 0 && iprof.count() <= 16)
    // the r16 cell-size column sums to the training corpus
    assert(iprof.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0) == e.count())
  }

  test("ss_pq_drift reads the persisted profile — no corpus pass in its plan") {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val df = QueryRegistry.byName("ss_pq_drift").run(spark, dir)
    val scans = df.queryExecution.optimizedPlan.collect {
      case rel: LogicalRelation
          if rel.relation.isInstanceOf[HadoopFsRelation] =>
        rel.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("/profile")),
      s"no profile scan among: $scans")
    // the only embeddings scan is the bounded batch, filter pushed down
    assert(scans.count(_.contains("embeddings.parquet")) == 1,
      s"expected exactly the batch scan of embeddings among: $scans")
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("vec_id#") && planStr.contains("< 100"),
      s"batch filter missing from the plan:\n$planStr")
  }

  test("gate signals: drifting batch trips, corpus-resample batch does not") {
    val pqIdx  = SimilarityQueries.buildIvfPqIndex(spark, dir)
    val ivfIdx = SimilarityQueries.buildIvfIndex(spark, dir)
    assert(SimilarityQueries.pqDriftWorse(spark, pqIdx, driftingBatch) > 0)
    assert(SimilarityQueries.pqDriftWorse(spark, pqIdx, driftFreeBatch) == 0)
    assert(SimilarityQueries.ivfDriftWorse(spark, ivfIdx, driftingBatch) > 0)
    assert(SimilarityQueries.ivfDriftWorse(spark, ivfIdx, driftFreeBatch) == 0)
  }

  test("declined PQ retrain: batch upserts, gen-1 serves, no gen-2 exists") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft-drift-declined").toString + "/fam_fp1"
    val served = SimilarityQueries.pqRetrainArc(spark, root,
      "fam_", e, driftFreeBatch)
    assert(served == s"${root}_g1", s"declined gate served $served")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"${root}_g2")),
      "a generation-2 directory exists although the gate declined")
    // generation 1 serves the MERGED corpus: the batch ids are probe-able
    val n = spark.read.parquet(s"$served/cells")
      .filter(col("vec_id") >= 300000).count()
    assert(n == 100, s"merged batch rows missing from gen-1: $n")
    // re-entry stays declined and idempotent
    assert(SimilarityQueries.pqRetrainArc(spark, root,
      "fam_", e, driftFreeBatch) == served)
  }

  test("declined raw retrain: gen-1 serves the merged corpus, no gen-2") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft-drift-declined-raw").toString + "/fam_fp1"
    val served = SimilarityQueries.ivfRetrainArc(spark, root,
      "fam_", e, driftFreeBatch)
    assert(served == s"${root}_g1")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"${root}_g2")))
    assert(spark.read.parquet(s"$served/cells")
      .filter(col("vec_id") >= 300000).count() == 100)
  }

  test("tripped arc still publishes generation 2 (the demo batch drifts)") {
    val gen2 = SimilarityQueries.retrainDemoIvfPqIndex(spark, dir)
    assert(gen2.endsWith("_g2"),
      s"the reversed demo batch no longer trips the gate: served $gen2")
  }

  test("declined MaxSim retrain: batch merges into BOTH copies, gen-1 serves, no gen-2") {
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files
      .createTempDirectory("graft-drift-declined-ms").toString + "/fam_fp1"
    val served = SimilarityQueries.maxsimRetrainArc(spark, root,
      "fam_", e, driftFreeBatch)
    assert(served == s"${root}_g1", s"declined gate served $served")
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"${root}_g2")),
      "a generation-2 directory exists although the gate declined")
    Seq("cells", "docs").foreach { t =>
      assert(spark.read.parquet(s"$served/$t")
        .filter(col("vec_id") >= 300000).count() == 100,
        s"merged batch token rows missing from gen-1 $t")
    }
    // re-entry stays declined and idempotent
    assert(SimilarityQueries.maxsimRetrainArc(spark, root,
      "fam_", e, driftFreeBatch) == served)
  }

  test("tripped MaxSim arc publishes generation 2 (the demo batch drifts)") {
    val gen2 = SimilarityQueries.retrainDemoMaxsimIndex(spark, dir)
    assert(gen2.endsWith("_g2"),
      s"the reversed demo batch no longer trips the MaxSim gate: $gen2")
  }

  test("a batch vector whose argmax cell has no profile row counts as drifting") {
    // the r15 advice: an inner join silently DROPPED batch vectors
    // landing in a cell that attracted no training vector — the
    // strongest possible drift evidence could never trip the gate
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft-drift-nullcell").toString
    def basis(i: Int): Seq[Float] =
      Seq.tabulate(64)(j => if (j == i) 1f else 0f)
    Seq((0, basis(0)), (1, basis(1)), (2, basis(2))).toDF("cid", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/centroids")
    // the profile covers only cells 0 and 1 — cell 2 trained on nothing
    Seq((0, 0.9, 5L), (1, 0.9, 5L)).toDF("cell", "corpus_min", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/profile")
    val batch = Seq((1L, basis(2))).toDF("vec_id", "embedding")
    assert(SimilarityQueries.ivfDriftWorse(spark, idx, batch) == 1L,
      "an unprofiled-cell batch vector was dropped by the drift gate")
  }
}
