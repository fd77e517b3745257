package graft.similarity

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins deleteFromIvfIndex's purge-propagation contract: with the
  * centroid model FIXED (the upsert's own contract), a rebuild over
  * the surviving vectors assigns every survivor to the same cell, so
  * the post-delete cells must equal the pre-delete cells minus exactly
  * the purged ids; untouched cell directories keep their files
  * byte-identical; a purged vec_id is unreachable through the index;
  * re-applying is a no-op.
  */
class IvfDeleteSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def tmpIdx(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_ivfdel_spec_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/idx"
  }

  private def cellRows(idx: String): Set[(Long, Int)] =
    spark.read.parquet(s"$idx/cells")
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("delete equals the fixed-model rebuild over the survivors") {
    val e = graft.Tables(spark, dir).embeddings
    val idx = tmpIdx("d")
    val cents = SimilarityQueries.trainIvfCentroids(e, 16)
    SimilarityQueries.writeIvfIndex(spark, e, cents, idx)
    val before = cellRows(idx)
    val purge = e.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
    val purgedIds = purge.collect().map(_.getLong(0)).toSet
    assert(purgedIds.nonEmpty)

    def fileState(): Map[String, (Long, Long)] =
      new java.io.File(s"$idx/cells").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .flatMap(d => d.listFiles().map(f =>
          f.getPath -> ((f.length(), f.lastModified())))).toMap
    val filesBefore = fileState()

    val touched = SimilarityQueries
      .deleteFromIvfIndex(spark, idx, purge).toSet
    assert(touched.nonEmpty)

    // fixed model ⇒ rebuild-over-survivors = before minus purged
    assert(cellRows(idx) == before.filterNot(r => purgedIds.contains(r._1)),
      "post-delete cells diverge from the fixed-model rebuild")
    // unreachability
    assert(cellRows(idx).forall(r => !purgedIds.contains(r._1)))
    // untouched cell directories keep their files byte-identical
    val untouchedChanged = fileState().filter { case (p, st) =>
      val cell = p.split("cell=")(1).split("/")(0).toInt
      !touched.contains(cell) && filesBefore.get(p).exists(_ != st)
    }
    assert(untouchedChanged.isEmpty,
      s"untouched cells rewritten: ${untouchedChanged.keys.take(3)}")
    // re-applying a completed delete is the documented no-op
    assert(SimilarityQueries.deleteFromIvfIndex(spark, idx, purge).isEmpty)
  }

  test("chain: upsert → delete → re-upsert equals the fixed-model rebuild") {
    val e = graft.Tables(spark, dir).embeddings
    val idx = tmpIdx("c")
    val cents = SimilarityQueries.trainIvfCentroids(e, 16)
    val base  = e.filter(col("vec_id") % 3 =!= 0)
    val night = e.filter(col("vec_id") % 3 === 0)
    SimilarityQueries.writeIvfIndex(spark, base, cents, idx)
    SimilarityQueries.upsertIvfIndex(spark, idx, night)
    val purge = e.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
    SimilarityQueries.deleteFromIvfIndex(spark, idx, purge)
    // a purged id re-ingests (MERGE semantics — new vector, same id)
    val reborn = e.filter(col("vec_id") % 7 === 3 && col("vec_id") % 2 === 0)
    SimilarityQueries.upsertIvfIndex(spark, idx, reborn)
    val rebuilt = tmpIdx("c_r")
    SimilarityQueries.writeIvfIndex(spark,
      e.filter(col("vec_id") % 7 =!= 3).unionByName(reborn), cents, rebuilt)
    assert(cellRows(idx) == cellRows(rebuilt),
      "chained cells diverge from the fixed-model rebuild")
  }

  test("a purged vector can never be returned by the probe tail") {
    val e = graft.Tables(spark, dir).embeddings
    val idx = tmpIdx("p")
    val cents = SimilarityQueries.trainIvfCentroids(e, 16)
    SimilarityQueries.writeIvfIndex(spark, e, cents, idx)
    val purge = e.filter(col("vec_id") % 7 === 3).select(col("vec_id"))
    SimilarityQueries.deleteFromIvfIndex(spark, idx, purge)
    val probes = SimilarityQueries.probesOf(e, cents)
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val assigned = spark.read.parquet(s"$idx/cells")
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("vec_id"), col("embedding"), col("cell"))
    val nids = SimilarityQueries.rankTail(assigned, probes)
      .select(col("nid")).collect().map(_.getLong(0))
    assert(nids.nonEmpty && nids.forall(_ % 7 != 3),
      "a purged vec_id surfaced as a neighbor")
  }
}
