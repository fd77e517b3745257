package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism-shaping helpers for heavy narrow compute.
  *
  * A local parquet table is typically one split, so a per-row kernel
  * (shingle md5, char n-grams, HLL updates) that precedes the first
  * shuffle runs on a single core. These helpers fan such inputs out to
  * cluster width — but ONLY when the scan actually yields fewer
  * partitions than the configured shuffle width. On a real 100 TB
  * corpus the scan already produces thousands of splits, the guard
  * fails, and no repartition of the payload ever happens.
  */
object Par {

  private def width(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Round-robin fan-out to shuffle width, skipped when the input is
    * already at least that wide.
    */
  def spread(df: DataFrame): DataFrame =
    if (df.rdd.getNumPartitions >= width(df)) df else df.repartition(width(df))

  /** Hash repartition on `c` with the partition count PINNED
    * (REPARTITION_BY_NUM) so AQE does not coalesce the stage down to
    * its input byte size: intended for exchanges whose downstream
    * stage EXPANDS the data (band explode, pair generation), where
    * sizing parallelism by the exchange's input bytes starves the
    * consumer to a handful of cores.
    */
  def spreadBy(df: DataFrame, c: Column): DataFrame =
    df.repartition(width(df), c)
}
