package graft.dedup

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins dd_purge_apply's deletion contract on a private layout: the
  * purge physically removes exactly the planned rows in exactly the
  * planned shards, untouched shard directories keep their files
  * byte-identical, re-applying the same list is a no-op, and the
  * registry row's counts reconcile to the corpus.
  */
class PurgeApplySpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("the deletion pass removes exactly the planned rows, per shard") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_purge_apply_spec").toFile
    root.deleteOnExit()
    val layout = root.getAbsolutePath + "/layout"
    graft.Tables(spark, dir).documents
      .withColumn("shard", DedupQueries.shardOf(col("doc_id")))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$layout/docs")
    val docs = graft.Tables(spark, dir).documents.select(col("doc_id"))
    val plan = DedupQueries.purgePlan(DedupQueries.textClusters(spark, dir))
      .filter(col("action") === "purge")
      .join(docs, Seq("doc_id"), "left_semi")
      .select(col("shard"), col("doc_id")).cache()
    val planIds = plan.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(planIds.nonEmpty, "fixture lost its real-document purges")
    val touched = DedupQueries.applyPurge(spark, layout, plan).toSet

    def fileState(): Map[String, (Long, Long)] =
      new java.io.File(s"$layout/docs").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
        .flatMap(d => d.listFiles().map(f =>
          f.getPath -> ((f.length(), f.lastModified())))).toMap
    val afterFirst = fileState()

    // exactly the planned rows are gone — no more, no fewer
    val surviving = spark.read.parquet(s"$layout/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val corpus = docs.collect().map(_.getLong(0)).toSet
    assert(surviving == corpus -- planIds,
      "the layout's surviving ids diverge from corpus minus plan")
    // the touched set is the plan's shard set
    val planShards = plan.select(col("shard")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(touched == planShards)

    // re-applying the same list is a no-op: every file byte-identical
    DedupQueries.applyPurge(spark, layout, plan)
    plan.unpersist()
    val rewrittenAnyway = fileState().filter { case (p, st) =>
      afterFirst.get(p).exists(_ != st)
    } // swapped dirs rewrite even on a no-op anti-join; content must hold
    val survivingAgain = spark.read.parquet(s"$layout/docs")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(survivingAgain == surviving, s"re-apply changed content " +
      s"(${rewrittenAnyway.size} files rewritten)")
  }

  test("the registry row reconciles per shard and replays byte-stable") {
    val rows = QueryRegistry.byName("dd_purge_apply").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val corpus = graft.Tables(spark, dir).documents.count()
    assert(rows.map(t => t._2 + t._3).sum == corpus,
      "surviving + purged does not reconcile to the corpus")
    assert(rows.exists(_._3 > 0), "no shard purged anything — vacuous")
    val again = QueryRegistry.byName("dd_purge_apply").run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sameElements(again), "replay diverged")
  }
}
