package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under `dir` (= `/root/testdata/sf*`).
  * Loaders are plain `spark.read.parquet` scans so Catalyst can push
  * filters and prune columns all the way into the parquet reader —
  * at 100 TB the scan IS the query cost, so nothing here materializes,
  * caches, or collects.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark has no native
    * type for — read the raw INT64 nanos and truncate to microseconds
    * (exactly what DuckDB's µs timestamps do), via integer division so
    * no precision is lost through doubles. `nanosAsLong` is a session
    * conf with no reader-option twin, so the read goes through a child
    * session (graft.core.Sessions) instead of mutating the shared one.
    */
  def events: DataFrame = {
    val reader = graft.core.Sessions.withConf(spark,
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
    reader.read.parquet(s"$dir/events.parquet").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}
