package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, count, lit}

/** The ONE partitioned-index merge kernel (r14 verdict tasks 1+4).
  *
  * Every persisted index in this repo is a hive-partitioned parquet
  * directory (`root/part=N/`) maintained by key-based MERGE/DELETE:
  * IVF cells, IVF-PQ code cells, media band/sig buckets, text postings
  * buckets, key-bucketed lakes. Through round 14 each of them carried
  * its own copy of the same per-partition loop — locate touched
  * partitions, then ONE Spark job + ONE crash-safe directory swap PER
  * touched partition, serially. Correct, and cheap while `touched` is
  * bounded by a 16-cell demo index — but at a production partition
  * count (√N cells for 10⁹+ vectors) that loop is O(thousands) of
  * driver-orchestrated jobs per nightly batch, and the multi-swap
  * sequence opens the partial-commit crash window all the presence-
  * check repair branches existed to paper over.
  *
  * This kernel replaces the loop with ONE dynamic-partition-overwrite
  * job and ONE commit point:
  *
  *  1. ONE narrow locating pass over the index's (key, partition)
  *     columns — parquet column pruning reads a few percent of index
  *     bytes — computes, per partition holding a batch key, the total
  *     row count and the batch-key row count (the batch keys ride in
  *     as a broadcast). Touched = those partitions ∪ the batch's own
  *     target partitions; bounded collects.
  *  2. Partitions whose EVERY stored row carries a batch key and that
  *     gain no batch rows end up empty after the merge; Spark's
  *     dynamic overwrite replaces only partitions present in the
  *     written data, so these are cleared explicitly first. The only
  *     rows that deletion can lose are rows the batch is replacing
  *     (or the purge is deleting) — a crash here re-applies cleanly.
  *  3. ONE job: the touched partitions' stored rows (read via
  *     `basePath`, so the output root is never an input root path),
  *     anti-joined on the batch keys, unioned with the batch, written
  *     `mode=overwrite` with `partitionOverwriteMode=dynamic` and
  *     `partitionBy(part)`. Spark stages the files under the root and
  *     swaps exactly the written partitions at JOB COMMIT — the single
  *     commit point. Untouched partition directories keep their files
  *     byte-identical (the reads all complete before the commit's
  *     deletes, so reading the partitions being replaced is safe).
  *
  * The merge itself is idempotent (anti-join on key + union), so the
  * residual crash window — inside the filesystem commit — converges on
  * re-application; callers' "some batch keys present" repair branches
  * are no longer reachable through the code's own sequencing.
  *
  * Compaction: `repartition(partCol)` routes each partition value to
  * one task, so each touched directory rewrites to one file — the
  * per-partition compaction the old loops bought with per-cell
  * coalesce. At a scale where one partition outgrows one output file,
  * set `spark.sql.files.maxRecordsPerFile` or repartition by
  * (part, key-range); the commit semantics are unchanged.
  */
object IndexMerge {

  private def hPath(p: String) = new org.apache.hadoop.fs.Path(p)

  /** Key-based MERGE of `batch` into the partitioned directory `root`:
    * stored rows carrying a batch key are replaced by the batch's rows
    * for that key (wherever they currently live — an update whose
    * partition assignment moved must not survive in its old
    * partition), new keys append. `batch` must carry `partCol` (each
    * row's target partition), `keyCol`, and the payload columns; the
    * KEY is the replacement unit — several rows per key (postings,
    * band entries) are fine, but two conflicting VERSIONS of a key in
    * one batch are the caller's loud-duplicate check to make (MERGE
    * semantics). Returns touched partition ids (sorted).
    *
    * `mergeFn` overrides the default anti-join+union combine (e.g.
    * keep-newest CDC merges). Custom merges must never empty a
    * partition that holds non-batch keys — asserted via the stats
    * pass (the default combine can't, by construction).
    */
  def merge(s: SparkSession, root: String, partCol: String, keyCol: String,
      batch0: DataFrame, readSchema: Option[String] = None,
      mergeFn: Option[(DataFrame, DataFrame) => DataFrame] = None): Seq[Int] = {
    val fs = hPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(hPath(root)), s"no partitioned index at $root")
    // the batch feeds the locating pass, the partition probe, and the
    // commit job — cache it once (bounded: the nightly batch)
    val batch = batch0.persist()
    try mergeCached(s, root, partCol, keyCol, batch, readSchema, mergeFn)
    finally batch.unpersist()
  }

  private def mergeCached(s: SparkSession, root: String, partCol: String,
      keyCol: String, batch: DataFrame, readSchema: Option[String],
      mergeFn: Option[(DataFrame, DataFrame) => DataFrame]): Seq[Int] = {
    val fs = hPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val keys = batch.select(col(keyCol))
    val stats = partStats(s, root, partCol, keyCol, keys, readSchema)
    val newParts = batch.select(col(partCol)).distinct()
      .collect().map(_.getInt(0)).toSet // bounded: batch partitions
    val touched = (newParts ++ stats.map(_._1)).toSeq.sorted
    if (touched.isEmpty) return Nil
    // partitions left EMPTY by the merge: all stored rows replaced,
    // no batch rows land (the moved-key old home)
    val empties = stats.collect {
      case (p, total, nb) if total == nb && !newParts(p) => p
    }
    require(empties.isEmpty || mergeFn.isEmpty,
      s"custom mergeFn with fully-replaced partitions ${empties.sorted} — " +
        "the kernel cannot clear partitions whose final content it " +
        "cannot derive from the batch alone")
    empties.foreach(p => fs.delete(hPath(s"$root/$partCol=$p"), true))
    val readable = touched.filterNot(empties.toSet)
      .filter(p => fs.exists(hPath(s"$root/$partCol=$p")))
    val stored = readParts(s, root, partCol, readable, readSchema)
      .getOrElse(batch.limit(0))
    val merged = mergeFn match {
      case Some(f) => f(stored, batch)
      case None =>
        stored.join(broadcast(keys), Seq(keyCol), "left_anti")
          .unionByName(batch)
    }
    overwriteParts(s, root, partCol, merged)
    s.catalog.refreshByPath(root)
    touched
  }

  /** Key-based DELETE from the partitioned directory `root`: every row
    * carrying a purge key leaves the index, in ONE dynamic-overwrite
    * commit over exactly the partitions that hold purged keys (located
    * by the same narrow stats pass). Partitions purged to zero rows
    * are cleared. Idempotent: a re-applied list touches nothing.
    * Returns touched partition ids (sorted).
    */
  def delete(s: SparkSession, root: String, partCol: String, keyCol: String,
      purge0: DataFrame, readSchema: Option[String] = None): Seq[Int] = {
    val fs = hPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(hPath(root)), s"no partitioned index at $root")
    val purge = purge0.select(col(keyCol)).distinct().persist()
    try {
      val stats = partStats(s, root, partCol, keyCol, purge, readSchema)
      val touched = stats.map(_._1).sorted
      if (touched.isEmpty) return Nil
      val empties = stats.collect { case (p, total, nb) if total == nb => p }
      empties.foreach(p => fs.delete(hPath(s"$root/$partCol=$p"), true))
      val readable = touched.filterNot(empties.toSet)
      readParts(s, root, partCol, readable, readSchema).foreach { stored =>
        val survivors = stored.join(broadcast(purge), Seq(keyCol), "left_anti")
        overwriteParts(s, root, partCol, survivors)
      }
      s.catalog.refreshByPath(root)
      touched
    } finally purge.unpersist()
  }

  /** The custom-merge escape hatch (band index: hot-band suppression
    * derives a partition's final rows from a window over stored ∪
    * batch, so emptiness is not computable from key counts): `merged`
    * — carrying `partCol` and covering exactly the final content of
    * the `touched` partitions — is STAGED to a sibling directory in
    * one job, partitions absent from the staged output are cleared,
    * and the staged rows commit to `root` in one dynamic-overwrite
    * job that reads only the staging copy. Two jobs, still one commit
    * point; a crash anywhere leaves stored rows at most missing the
    * batch's effect, which the caller's idempotent re-apply restores.
    */
  private[graft] def publishStaged(s: SparkSession, root: String,
      partCol: String, touched: Seq[Int], merged: DataFrame): Unit =
    commitStaged(s, root, partCol, touched,
      stageParts(s, root, partCol, merged))

  /** Stage `merged` to the `root`__staging sibling in one job and
    * return the staging path — the MATERIALIZATION half of
    * [[publishStaged]], split out so a caller can durably publish an
    * ordering-constrained side artifact (the band index's hot
    * tombstones, which must land before any bands change is durable)
    * between the staging write and [[commitStaged]]. Nothing under
    * `root` changes.
    */
  private[graft] def stageParts(s: SparkSession, root: String,
      partCol: String, merged: DataFrame): String = {
    val fs = hPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = root + "__staging"
    fs.delete(hPath(staging), true) // crash leftovers
    merged.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(staging)
    staging
  }

  /** The COMMIT half of [[publishStaged]]: clear the `touched`
    * partitions absent from the staged output (vacated), then commit
    * the staged rows to `root` in one dynamic-overwrite job that reads
    * only the staging copy, and drop the staging directory.
    */
  private[graft] def commitStaged(s: SparkSession, root: String,
      partCol: String, touched: Seq[Int], staging: String): Unit = {
    val fs = hPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val stagedParts = fs.listStatus(hPath(staging)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$partCol=") =>
        n.stripPrefix(s"$partCol=").toInt }
      .toSet
    touched.filterNot(stagedParts)
      .foreach(p => fs.delete(hPath(s"$root/$partCol=$p"), true))
    if (stagedParts.nonEmpty) {
      // no repartition: the staging job already compacted per partition
      s.read.parquet(staging)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(root)
    }
    fs.delete(hPath(staging), true)
    s.catalog.refreshByPath(root)
  }

  /** ONE narrow locating pass: per partition holding a key from
    * `keys`, (partition, total stored rows, stored rows with a key).
    * Column-pruned to (key, part); the keys broadcast. Bounded output:
    * ≤ |partitions holding keys| rows collected.
    */
  private def partStats(s: SparkSession, root: String, partCol: String,
      keyCol: String, keys: DataFrame,
      readSchema: Option[String]): Seq[(Int, Long, Long)] = {
    // a freshly-initialized table may hold no partition directory at
    // all (only a _SUCCESS marker) — nothing stored, nothing touched
    val fs = hPath(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val hasParts = fs.listStatus(hPath(root)).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
    if (!hasParts) return Nil
    val base = readSchema.fold(s.read)(s.read.schema).parquet(root)
    base.select(col(keyCol), col(partCol))
      .join(broadcast(keys.distinct().withColumn("__inb", lit(1))),
        Seq(keyCol), "left")
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("__total"), count(col("__inb")).as("__nb"))
      .filter(col("__nb") > 0)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  /** The stored rows of `parts` under `root`, read via `basePath` so
    * the partition column is recovered but the OUTPUT root is never an
    * input root path (Spark refuses to overwrite a path it reads
    * from; the per-directory roots sidestep the check, and the actual
    * file reads all complete before the dynamic commit's deletes).
    */
  private def readParts(s: SparkSession, root: String, partCol: String,
      parts: Seq[Int], readSchema: Option[String]): Option[DataFrame] =
    if (parts.isEmpty) None
    else {
      val reader = readSchema.fold(s.read)(s.read.schema)
        .option("basePath", root)
      Some(reader.parquet(parts.map(p => s"$root/$partCol=$p"): _*))
    }

  /** The single commit: dynamic partition overwrite of exactly the
    * partitions present in `df`, compacted one-task-per-partition.
    */
  private def overwriteParts(s: SparkSession, root: String,
      partCol: String, df: DataFrame): Unit =
    df.repartition(col(partCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(root)
}
