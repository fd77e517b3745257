package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the routing-table protocol ([[KeyRouting]]): lookup reads only
  * the keys' buckets, the upsert protocol's crash windows only ever
  * leave the route OVER-reporting (including the changed-content
  * crashed-attempt case — the one state a from-sigs/from-data hint
  * could not cover), deletes drop pairs after the data, bootstrap
  * covers pre-route generations, and a mismatched bucket marker
  * rebuilds instead of mis-pruning.
  */
class KeyRoutingSpec extends SparkSuite {

  import spark.implicits._

  private def hp(p: String) = new org.apache.hadoop.fs.Path(p)
  private def fsOf(p: String) =
    hp(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A tiny cell index (the ANN shape): (id, cell, payload), cells
    * assigned by the test, NOT derivable from the id.
    */
  private def freshCells(rows: Seq[(Long, Int, String)]): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-keyrouting").toString + "/idx"
    rows.toDF("id", "cell", "payload")
      .write.partitionBy("cell").parquet(s"$root/cells")
    root
  }

  private def route(root: String) = KeyRouting.byKey(root, "id", 4)

  private def cellRows(root: String): Set[(Long, Int, String)] =
    spark.read.parquet(s"$root/cells")
      .select(col("id"), col("cell"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private def routePairs(root: String): Set[(Long, Int)] =
    spark.read.parquet(route(root).routeDir)
      .select(col("id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private val base = Seq(
    (1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"), (4L, 2, "d"))

  test("mergeThrough: inserts fast-path, updates clean the moved key's old cell, route settles, re-apply converges") {
    val root = freshCells(base)
    val r = route(root)
    r.ensure(spark, s"$root/cells")
    assert(routePairs(root) === Set(
      (1L, 0), (2L, 0), (3L, 1), (4L, 2)), "bootstrap missed pairs")
    // pure-insert fast path: no prior pairs
    r.mergeThrough(spark, s"$root/cells",
      Seq((9L, 3, "z")).toDF("id", "cell", "payload"))
    assert(cellRows(root).contains((9L, 3, "z")))
    assert(routePairs(root).contains((9L, 3)))
    // update: id=4 moves cell 2 -> 0; cell 2 (its only row) clears,
    // located through the route, and the route settles to the new cell
    r.mergeThrough(spark, s"$root/cells",
      Seq((4L, 0, "D")).toDF("id", "cell", "payload"))
    assert(cellRows(root) === Set(
      (1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"), (4L, 0, "D"),
      (9L, 3, "z")))
    assert(!fsOf(root).exists(hp(s"$root/cells/cell=2")),
      "moved key's vacated cell directory survived")
    assert(routePairs(root) === Set(
      (1L, 0), (2L, 0), (3L, 1), (4L, 0), (9L, 3)),
      "route did not settle to the final locations")
    // re-apply converges (no duplicate rows, same route)
    r.mergeThrough(spark, s"$root/cells",
      Seq((4L, 0, "D")).toDF("id", "cell", "payload"))
    assert(cellRows(root).count(_._1 == 4L) == 1)
  }

  test("a crashed CHANGED-CONTENT attempt stays covered: addLocations-first makes the re-applied merge find the orphan rows") {
    // THE hazard a from-data hint cannot cover: attempt 1 commits its
    // data under cells derived from content that later changed, then
    // dies before settling. Attempt 2's own targets don't include
    // attempt 1's cells — only the route's add-first discipline does.
    val root = freshCells(base)
    val r = route(root)
    r.ensure(spark, s"$root/cells")
    // attempt 1 (id=7 assigned cell 3), replayed EXACTLY as
    // mergeThrough's first two steps, then "crash" before settle
    val batch1 = Seq((7L, 3, "v1")).toDF("id", "cell", "payload")
    r.addLocations(spark, batch1.select(col("id"), col("cell")))
    IndexMerge.merge(spark, s"$root/cells", "cell", "id", batch1,
      hint = Some(StoredAt(r.lookup(spark, batch1.select(col("id"))))))
    assert(cellRows(root).contains((7L, 3, "v1")))
    // attempt 2: same id, different content -> different cell (1)
    val batch2 = Seq((7L, 1, "v2")).toDF("id", "cell", "payload")
    r.mergeThrough(spark, s"$root/cells", batch2)
    val rows = cellRows(root)
    assert(rows.contains((7L, 1, "v2")))
    assert(!rows.exists(t => t._1 == 7L && t._3 == "v1"),
      "attempt 1's orphan row survived — the route add did not cover " +
        "the crashed attempt's cells")
    assert(routePairs(root).filter(_._1 == 7L) === Set((7L, 1)),
      "route kept the crashed attempt's pair after settle")
  }

  test("deleteThrough purges data then pairs; a crash between re-applies to a clean drop") {
    val root = freshCells(base)
    val r = route(root)
    r.ensure(spark, s"$root/cells")
    // simulate the crash window: data deleted, route drop never ran
    val keys = Seq(4L).toDF("id")
    IndexMerge.delete(spark, s"$root/cells", "cell", "id", keys,
      hint = Some(StoredAt(r.lookup(spark, keys))))
    assert(!cellRows(root).exists(_._1 == 4L))
    assert(routePairs(root).contains((4L, 2)),
      "precondition: the stale over-reporting pair should survive")
    // re-applied delete converges: no data to purge, pair dropped
    assert(r.deleteThrough(spark, s"$root/cells", keys).isEmpty)
    assert(!routePairs(root).exists(_._1 == 4L))
    // and a full deleteThrough from scratch does both halves
    r.deleteThrough(spark, s"$root/cells", Seq(3L).toDF("id"))
    assert(!cellRows(root).exists(_._1 == 3L))
    assert(!routePairs(root).exists(_._1 == 3L))
    assert(!fsOf(root).exists(hp(s"$root/cells/cell=1")),
      "fully-purged cell survived")
  }

  test("lookup reads only the keys' buckets; dataOf narrows to exact stored rows") {
    val root = freshCells(base)
    val r = route(root)
    r.ensure(spark, s"$root/cells")
    // every key's pairs come back, keys in the same bucket or not
    assert(r.lookup(spark, Seq(1L, 4L).toDF("id"))
      .select(col("id"), col("cell")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSet === Set((1L, 0), (4L, 2)))
    // dataOf returns stored rows even when the route over-reports
    r.addLocations(spark, Seq((1L, 3)).toDF("id", "cell"))
    val got = r.dataOf(spark, s"$root/cells", Seq(1L).toDF("id"))
      .select(col("id"), col("cell"), col("payload")).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSet
    assert(got === Set((1L, 0, "a")),
      "dataOf fabricated or missed rows under an over-reporting route")
  }

  test("two-key routes (the MaxSim shape): merges key on the token id, drops key on the document id") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-keyrouting-2k").toString + "/idx"
    // vec_id = did * 10 + t; rb derives from did under BOTH keys
    def didOf(v: org.apache.spark.sql.Column) =
      floor(v / lit(10)).cast("long")
    val r = KeyRouting(root, Seq("vec_id", "did"), 4,
      Map("vec_id" -> (v => pmod(hash(didOf(v)), lit(4))),
          "did"    -> (d => pmod(hash(d), lit(4)))))
    Seq((10L, 1L, 0), (11L, 1L, 2), (20L, 2L, 1))
      .toDF("vec_id", "did", "cell")
      .write.partitionBy("cell").parquet(s"$root/cells")
    r.ensure(spark, s"$root/cells")
    // lookup by document id finds every token pair of the doc
    assert(r.lookup(spark, Seq(1L).toDF("did"))
      .select(col("vec_id"), col("cell")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSet
      === Set((10L, 0), (11L, 2)))
    // document-level deleteThrough drops all the doc's cells and pairs
    r.deleteThrough(spark, s"$root/cells", Seq(1L).toDF("did"))
    assert(spark.read.parquet(s"$root/cells")
      .filter(col("did") === 1L).count() == 0)
    assert(spark.read.parquet(r.routeDir)
      .filter(col("did") === 1L).count() == 0)
  }

  test("bucket marker: a torn or differently-bucketed route rebuilds instead of mis-pruning") {
    val root = freshCells(base)
    val r = route(root)
    r.ensure(spark, s"$root/cells")
    assert(r.live(spark))
    // a route written under ANOTHER bucket count reads as not-live
    assert(!KeyRouting.byKey(root, "id", 8).live(spark))
    // torn bootstrap (marker missing) reads as not-live and rebuilds
    fsOf(root).delete(hp(s"${r.routeDir}/_buckets"), false)
    assert(!r.live(spark))
    r.ensure(spark, s"$root/cells")
    assert(r.live(spark))
    assert(routePairs(root) === Set((1L, 0), (2L, 0), (3L, 1), (4L, 2)))
  }
}
