package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the ONE-job partitioned-merge kernel's contract (r14 verdict
  * tasks 1+4): MERGE/DELETE equal a from-scratch rebuild, untouched
  * partition directories keep their files byte-identical, a partition
  * fully vacated by a moved/purged key is CLEARED (dynamic overwrite
  * alone would leave its stale directory), re-application converges,
  * and the whole batch lands through one dynamic-partition-overwrite
  * commit (no per-partition `__upserting` swap litter).
  */
class IndexMergeSpec extends SparkSuite {

  import spark.implicits._

  private def freshIdx(rows: Seq[(Long, Int, String)]): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-indexmerge").toString + "/idx"
    rows.toDF("id", "part", "payload")
      .write.partitionBy("part").parquet(root)
    root
  }

  private def fileState(root: String): Map[Int, Set[(String, Long, Long)]] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(root))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("part="))
      .map { d =>
        d.getPath.getName.stripPrefix("part=").toInt ->
          fs.listStatus(d.getPath).map(f =>
            (f.getPath.getName, f.getLen, f.getModificationTime)).toSet
      }.toMap
  }

  private def rowsOf(root: String): Set[(Long, Int, String)] =
    spark.read.parquet(root).select(col("id"), col("part"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private val base = Seq(
    (1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"), (4L, 1, "d"), (5L, 2, "e"))

  test("merge == rebuild; untouched partitions byte-identical; moved key clears its old partition") {
    val root = freshIdx(base)
    // id=5 MOVES from part 2 (its only row) to part 0; id=6 is new in
    // part 3 (previously absent); part 1 is untouched
    val batch = Seq((5L, 0, "E"), (6L, 3, "f")).toDF("id", "part", "payload")
    val before  = fileState(root)
    val touched = IndexMerge.merge(spark, root, "part", "id", batch)
    assert(touched == Seq(0, 2, 3))
    assert(fileState(root)(1) === before(1),
      "untouched partition 1 was rewritten")
    assert(!fileState(root).contains(2),
      "part=2 lost its only row to the move but its directory survived " +
        "— a probe would serve the stale pre-move row")
    assert(rowsOf(root) === Set(
      (1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"), (4L, 1, "d"),
      (5L, 0, "E"), (6L, 3, "f")))
    // no per-partition swap litter, no staging leftovers
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).toSeq
    assert(!names.exists(n => n.contains("__upserting") ||
      n.contains("__backup") || n.contains("staging")), names.toString)
    // re-application (the crashed-commit repair) converges
    IndexMerge.merge(spark, root, "part", "id", batch)
    assert(rowsOf(root) === Set(
      (1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"), (4L, 1, "d"),
      (5L, 0, "E"), (6L, 3, "f")))
  }

  test("delete clears purged rows and fully-purged partitions; idempotent") {
    val root   = freshIdx(base)
    val before = fileState(root)
    // purges part 2 entirely (its only row) and one row of part 0
    val purge = Seq(5L, 2L).toDF("id")
    val touched = IndexMerge.delete(spark, root, "part", "id", purge)
    assert(touched == Seq(0, 2))
    assert(fileState(root)(1) === before(1),
      "untouched partition 1 was rewritten by the delete")
    assert(!fileState(root).contains(2), "fully-purged part=2 survived")
    assert(rowsOf(root) === Set((1L, 0, "a"), (3L, 1, "c"), (4L, 1, "d")))
    assert(IndexMerge.delete(spark, root, "part", "id", purge).isEmpty,
      "re-applied purge list touched partitions")
  }

  test("custom mergeFn: keep-newest combine sees stored rows; vacating guard is loud") {
    val root = freshIdx(base)
    // keep-newest on payload (lexicographic): the stored "b" must BEAT
    // the incoming "B" — proving the custom combine really sees the
    // stored side rather than anti-joining it away
    val batch = Seq((2L, 0, "B"), (6L, 0, "f")).toDF("id", "part", "payload")
    def newest(stored: DataFrame, b: DataFrame): DataFrame =
      stored.unionByName(b).groupBy(col("id"))
        .agg(max_by(struct(col("id"), col("part"), col("payload")),
          col("payload")).as("w"))
        .select(col("w.id").as("id"), col("w.part").as("part"),
          col("w.payload").as("payload"))
    IndexMerge.merge(spark, root, "part", "id", batch,
      mergeFn = Some(newest))
    assert(rowsOf(root) === Set(
      (1L, 0, "a"), (2L, 0, "b"), (3L, 1, "c"), (4L, 1, "d"),
      (5L, 2, "e"), (6L, 0, "f")))
    // a custom combine may not vacate a partition (the kernel cannot
    // know the final content): id=5 replaced, nothing lands in part 2
    val vacating = Seq((5L, 0, "z")).toDF("id", "part", "payload")
    intercept[IllegalArgumentException] {
      IndexMerge.merge(spark, root, "part", "id", vacating,
        mergeFn = Some(newest))
    }
  }

  test("publishStaged commits exactly the staged partitions and clears vacated ones") {
    val root = freshIdx(base)
    // caller-computed final content for touched = {0, 2}: part 0 keeps
    // one row plus a new one, part 2 ends empty (vacated)
    val merged = Seq((1L, 0, "a"), (9L, 0, "x")).toDF("id", "part", "payload")
    val before = fileState(root)
    IndexMerge.publishStaged(spark, root, "part", Seq(0, 2), merged)
    assert(fileState(root)(1) === before(1))
    assert(!fileState(root).contains(2), "vacated part=2 survived")
    assert(rowsOf(root) === Set(
      (1L, 0, "a"), (9L, 0, "x"), (3L, 1, "c"), (4L, 1, "d")))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "__staging")),
      "staging directory survived the publish")
  }
}
