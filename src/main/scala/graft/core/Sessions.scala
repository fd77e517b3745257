package graft.core

import org.apache.spark.sql.SparkSession

/** Per-read SQL-conf isolation. Some scan knobs
  * (`spark.sql.files.maxPartitionBytes`,
  * `spark.sql.legacy.parquet.nanosAsLong`) exist only as session confs,
  * not reader options — setting them on the shared session leaks into
  * every concurrent query. A child `newSession()` shares the
  * SparkContext, catalog, and cached data but owns its SQL conf, and a
  * file relation resolved through it keeps reading that conf at
  * execution time (`FileSourceScanExec` plans splits via
  * `relation.sparkSession`), so the setting scopes to exactly the reads
  * made through the child.
  */
object Sessions {

  /** A child session of `spark` with `kv` applied on top of the
    * parent's current runtime conf. Static/core entries that can't be
    * set at runtime are skipped (they're inherited via the shared
    * SparkConf anyway).
    */
  def withConf(spark: SparkSession, kv: (String, String)*): SparkSession = {
    val child = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try child.conf.set(k, v)
      catch { case _: Exception => () }
    }
    kv.foreach { case (k, v) => child.conf.set(k, v) }
    child
  }
}
