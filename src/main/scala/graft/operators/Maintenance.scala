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
    // local-FS directory swap (the metastore/commit-protocol seam)
    val fs  = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(tmp)
    val dst = new org.apache.hadoop.fs.Path(dir)
    fs.delete(dst, true)
    fs.rename(src, dst)
    parts
  }
}
