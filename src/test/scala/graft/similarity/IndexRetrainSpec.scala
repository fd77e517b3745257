package graft.similarity

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins ss_index_retrain's executed re-train arc: the served index
  * after the drift-scheduled rebuild equals a FRESH BUILD over the
  * post-upsert corpus; the retrain genuinely moved the model (the
  * upserted vectors are first-class training data); the old generation
  * is garbage-collected by the cutover and the generation audit stays
  * clean — the exact invariants the r12 verdict asked the lifecycle's
  * last arc to prove.
  */
class IndexRetrainSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def corpus2 = {
    val e = graft.Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding"))
    e.unionByName(e.filter(col("vec_id") < 100)
      .select((col("vec_id") + 200000).as("vec_id"),
        reverse(col("embedding")).as("embedding")))
  }

  test("probe after retrain == fresh-build probe over the post-upsert corpus") {
    val served = QueryRegistry.byName("ss_index_retrain").run(spark, dir)
    // fresh build over embeddings ∪ batch, probed identically
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_retrain_spec").toFile
    tmp.deleteOnExit()
    val fresh = tmp.getAbsolutePath + "/idx"
    val cents = SimilarityQueries.trainIvfCentroids(corpus2, 16)
    SimilarityQueries.writeIvfIndex(spark, corpus2, cents, fresh)
    val probes = SimilarityQueries
      .probesOf(graft.Tables(spark, dir).embeddings, cents)
    val assigned = spark.read.parquet(s"$fresh/cells")
      .select(col("vec_id"), col("embedding"), col("cell"))
    val expect = SimilarityQueries.rankTail(assigned, probes)
    assert(served.count() > 0)
    assert(served.exceptAll(expect).count() == 0)
    assert(expect.exceptAll(served).count() == 0)
  }

  test("the retrain moved the model and upserted vectors are citizens") {
    val idx = SimilarityQueries.retrainDemoIndex(spark, dir)
    val retrained = SimilarityQueries.loadCentroids(spark, idx).toMap
    val e = graft.Tables(spark, dir).embeddings
    val gen1Model = SimilarityQueries.trainIvfCentroids(e, 16).toMap
    assert(retrained != gen1Model,
      "retrained centroids identical to the pre-upsert model — the " +
        "rebuild was not sensitive to the upserted vectors")
    // and they are exactly the fresh train over the post-upsert corpus
    val fresh = SimilarityQueries.trainIvfCentroids(corpus2, 16).toMap
    assert(retrained.keySet == fresh.keySet &&
      retrained.forall { case (k, v) => fresh(k).sameElements(v) })
    // upserted ids are served
    val ids = spark.read.parquet(s"$idx/cells")
      .filter(col("vec_id") >= 200000).count()
    assert(ids > 0, "no upserted vector survived into the new generation")
  }

  test("the cutover GCs the old generation and the audit stays clean") {
    val idx  = SimilarityQueries.retrainDemoIndex(spark, dir)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(idx.endsWith("_g2"))
    val p  = new org.apache.hadoop.fs.Path(idx)
    val fs = p.getFileSystem(conf)
    // generation 1 is gone (the publish's GC retired it)
    val gen1 = new org.apache.hadoop.fs.Path(idx.dropRight(3) + "_g1")
    assert(!fs.exists(gen1), s"old generation survived the cutover: $gen1")
    // the manifest's audit sees exactly one published generation
    val src = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val st  = src.getFileSystem(conf).getFileStatus(src)
    val fp  = s"${st.getLen}_${st.getModificationTime}_g2"
    assert(graft.core.IndexDirs
      .stalePublishedGenerations(conf, idx, fp).isEmpty,
      "stale generation visible after the retrain cutover")
  }

  test("re-entry serves the completed retrain without rebuilding") {
    val idx = SimilarityQueries.retrainDemoIndex(spark, dir)
    def fileState(): Map[String, (Long, Long)] =
      new java.io.File(s"$idx/cells").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .flatMap(d => d.listFiles().map(f =>
          f.getPath -> ((f.length(), f.lastModified())))).toMap
    val before = fileState()
    val again = SimilarityQueries.retrainDemoIndex(spark, dir)
    assert(again == idx)
    assert(fileState() == before,
      "a re-entered retrain rewrote the served generation")
  }
}
