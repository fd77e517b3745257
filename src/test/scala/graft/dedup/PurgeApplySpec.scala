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

  test("a fully-purged shard still reports, with n_docs = 0") {
    // r11 advice: the report used to LEFT-join purged onto survived, so
    // a shard whose documents were ALL purged (no surviving row to
    // group) silently vanished from the report while the oracle's
    // GROUP BY over documents still emits it. Unreachable at the
    // tested SFs — force it on a private 1-shard-heavy layout.
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_purge_fullshard_spec").toFile
    root.deleteOnExit()
    val layout = root.getAbsolutePath + "/layout"
    // two docs; compute their real shards, purge EVERYTHING in one
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    docs.withColumn("shard", DedupQueries.shardOf(col("doc_id")))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$layout/docs")
    val shards = docs.select(DedupQueries.shardOf(col("doc_id")).as("s"),
        col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val victimShard = shards.head._1
    val plan = shards.filter(_._1 == victimShard)
      .toSeq.toDF("shard", "doc_id")
    DedupQueries.applyPurge(spark, layout, plan)
    val survivedByShard = spark.read.parquet(s"$layout/docs")
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!survivedByShard.contains(victimShard),
      "fixture did not fully purge the victim shard")
    // the registry row's FULL-outer report shape over this layout
    val purged = plan.groupBy(col("shard")).agg(count(lit(1)).as("n_purged"))
    val survived = spark.read.parquet(s"$layout/docs")
      .groupBy(col("shard")).agg(count(lit(1)).as("n_docs"))
      .select(col("shard").cast("long").as("shard"), col("n_docs"))
    val report = survived.join(purged, Seq("shard"), "full")
      .select(col("shard"), coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_purged"), lit(0L)).as("n_purged"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(report.exists(t => t._1 == victimShard && t._2 == 0L),
      s"fully-purged shard $victimShard missing from the report: $report")
  }

  test("the image chain executes against the blob lake: exact removal, " +
      "blobs intact") {
    // r12: dd_image_purge_apply — the media (blob) lake leg of the
    // generic applyPurge. Private layout; surviving blob BYTES must be
    // untouched (content equality against a pre-purge snapshot), and
    // exactly the planned media removed.
    val mmRows = graft.QueryRegistry.byName("dd_image_purge_apply")
      .run(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val corpus = graft.Tables(spark, dir).documents.count()
    assert(mmRows.map(t => t._2 + t._3).sum == corpus,
      "surviving + purged media do not reconcile to the corpus")
    assert(mmRows.exists(_._3 > 0), "no shard purged any media — vacuous")

    // direct applyPurge on a private lake with content verification
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_media_purge_spec").toFile
    root.deleteOnExit()
    val layout = root.getAbsolutePath + "/lake"
    val media = (0L until 60L).map(i =>
      (i, Array.fill((i % 7).toInt + 1)((i % 251).toByte)))
      .toDF("media_id", "content")
    media.withColumn("shard", DedupQueries.shardOf(col("media_id")))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$layout/media")
    val before = spark.read.parquet(s"$layout/media")
      .select(col("media_id"), col("content")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val planDf = (0L until 60L).filter(_ % 5 == 2).toDF("media_id")
      .select(DedupQueries.shardOf(col("media_id")).as("shard"),
        col("media_id"))
    val purgedIds = (0L until 60L).filter(_ % 5 == 2).toSet
    DedupQueries.applyPurge(spark, layout, planDf,
      sub = "media", key = "media_id")
    val after = spark.read.parquet(s"$layout/media")
      .select(col("media_id"), col("content")).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(after.keySet == before.keySet -- purgedIds,
      "surviving media ids diverge from corpus minus plan")
    assert(after.forall { case (id, bytes) => before(id) == bytes },
      "a surviving blob's bytes changed during the purge rewrite")
  }

  test("the audio and video chains execute against their blob lakes") {
    // r13: the last two modality legs — every near-dup closure now has
    // an executed, reconciled deletion path against its own lake.
    // Per-leg: counts reconcile to the corpus, at least one shard
    // purged (non-vacuous), replay byte-stable (applied once per
    // generation), and purged ids are exactly the non-representatives
    // of the modality's own cluster frame.
    Seq("dd_audio_purge_apply", "dd_video_purge_apply").foreach { name =>
      val rows = QueryRegistry.byName(name).run(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val corpus = graft.Tables(spark, dir).documents.count()
      assert(rows.map(t => t._2 + t._3).sum == corpus,
        s"$name: surviving + purged do not reconcile to the corpus")
      assert(rows.exists(_._3 > 0), s"$name: no shard purged — vacuous")
      val again = QueryRegistry.byName(name).run(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.sameElements(again), s"$name: replay diverged")
    }
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
