package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-maintenance operators a long-lived 100 TB lake needs. */
object Maintenance {

  /** Compact a fragmented parquet directory into ~`targetBytes` files.
    * Small-files pathology is the classic failure of streaming/append
    * pipelines (every file costs a task + footer read + namenode
    * entry); compaction rewrites the directory with a partition count
    * derived from actual data size. Returns the compacted frame count.
    *
    * At scale this runs per partition-directory (bounded unit of work)
    * and swaps directories atomically at the metastore layer; the
    * rewrite itself — read, repartition by size, write — is what this
    * implements.
    */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Int = {
    val df    = spark.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1, (bytes.toDouble / targetBytes.toDouble).ceil.toInt)
    val tmp   = dir + "__compacting"
    df.repartition(parts).write.mode("overwrite").parquet(tmp)
    swapDirs(spark, tmp, dir)
    parts
  }

  /** Write `df` as a bucketed (and bucket-sorted) external table —
    * the standing answer to "this join shuffles 100 TB every night":
    * both fact tables hash-partition into `nBuckets` files by the join
    * key AT WRITE TIME, so every future equi-join or aggregation on
    * that key reads co-located buckets and plans NO exchange (proved in
    * MaintenanceSpec by asserting the joined plan is exchange-free).
    * The bucket count is a capacity decision (≈ cluster cores × small
    * multiple at the target scale), made once at layout time.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Key-based upsert (MERGE) into a parquet directory: incoming rows
    * replace existing rows with the same key, new keys append — the
    * nightly-ingest primitive for a lake without a table format. The
    * rewrite is an anti join (existing minus updated keys) + union,
    * swapped in crash-safely via [[swapDirs]]. At scale this runs per
    * partition-directory so only partitions containing updated keys
    * rewrite; with a table format (Delta/Iceberg) the same logic is a
    * metadata MERGE — this implements the storage-level semantics.
    */
  def upsertParquet(spark: SparkSession, dir: String, updates: DataFrame,
      key: String): Unit = {
    val existing = spark.read.parquet(dir)
    val merged = existing
      .join(updates.select(updates(key)), Seq(key), "left_anti")
      .unionByName(updates)
    val tmp = dir + "__upserting"
    merged.write.mode("overwrite").parquet(tmp)
    swapDirs(spark, tmp, dir)
  }

  /** Directory swap that never leaves a window without the data: the
    * original moves aside to a backup, the new directory renames into
    * place, then the backup is dropped. A crash at any point leaves
    * either the original (as `dir` or recoverable at `dir__backup`) or
    * the completed swap — never neither. The FS is resolved from the
    * path itself, not the default FS, so scheme-qualified dirs work.
    */
  private[operators] def swapDirs(spark: SparkSession, tmp: String,
      dir: String): Unit = {
    val conf   = spark.sparkContext.hadoopConfiguration
    val src    = new org.apache.hadoop.fs.Path(tmp)
    val dst    = new org.apache.hadoop.fs.Path(dir)
    val backup = new org.apache.hadoop.fs.Path(dir + "__backup")
    val fs     = dst.getFileSystem(conf)
    if (fs.exists(backup)) fs.delete(backup, true) // stale from a crash
    if (!fs.rename(dst, backup))
      throw new java.io.IOException(s"rename $dst -> $backup failed")
    // Hadoop FileSystems variously return false OR throw for a bad
    // source — treat both as "swap-in failed" so the rollback runs
    val swappedIn =
      try fs.rename(src, dst)
      catch { case _: java.io.IOException => false }
    if (!swappedIn) {
      fs.rename(backup, dst) // roll back; original untouched
      throw new java.io.IOException(s"rename $src -> $dst failed")
    }
    fs.delete(backup, true)
  }
}
