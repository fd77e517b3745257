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
  private def load(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    spark.read.schema(Tables.fileSchema(spark, path)).parquet(path)
  }

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** events.ts has shipped in two physical layouts — INT64
    * TIMESTAMP(NANOS) (rounds ≤5) and plain timestamp[us] (the driver
    * regenerated the fixtures mid-round-6) — so the loader probes the
    * file's footer schema instead of assuming either. Both layouts
    * normalize to a session-TZ TimestampType at microsecond precision
    * (what DuckDB's µs timestamps hold, and what downstream
    * `unix_micros` calls require):
    *   - INT64 nanos: Spark has no nanos type, so read the raw longs
    *     via `nanosAsLong` and truncate with integer division — no
    *     precision loss through doubles. The conf has no reader-option
    *     twin, so the read goes through a child session
    *     (graft.core.Sessions) instead of mutating the shared one.
    *     (The probe reads through the same child: without the conf a
    *     nanos footer fails schema conversion outright.)
    *   - timestamp[us]: arrives as TIMESTAMP_NTZ (no UTC adjustment in
    *     the footer); cast to TimestampType — instant-preserving under
    *     the UTC session timezone every entrypoint pins.
    * EventsSchemaSpec pins both layouts with committed fixture files.
    */
  def events: DataFrame = {
    val reader = graft.core.Sessions.withConf(spark,
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
    val path = s"$dir/events.parquet"
    Tables.normalizeEventsTs(
      reader.read.schema(Tables.fileSchema(reader, path)).parquet(path))
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}

object Tables {
  /** Footer-schema cache for the fixed test tables, keyed by the
    * file's (path, length, mtime) identity — the same fingerprint the
    * index layer keys generations by. Every schema-less
    * `read.parquet` runs a footer-inference Spark job (~30 ms + a
    * ~50 ms planning gap); with most queries loading 1-4 tables and
    * the bench running 235 × 4 passes, inference was a measurable
    * constant tax on EVERY query (r16, guide §1.1). A metastore holds
    * exactly this metadata in production; the identity key re-probes
    * if the driver regenerates a fixture mid-process. Results are
    * never cached — only the footer's StructType.
    */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  /** `spark.read.parquet(path)` with the footer/partition schema
    * served from [[fileSchema]]'s identity-keyed cache — the serving
    * paths' per-pass footer-inference job becomes a first-touch-only
    * cost. For a partitioned index directory the identity is the
    * directory's mtime (adding/removing a partition re-probes); a
    * family's schema never changes within a published generation path.
    */
  private[graft] def readPq(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(fileSchema(spark, path)).parquet(path)

  private[graft] def fileSchema(spark: SparkSession, path: String)
      : org.apache.spark.sql.types.StructType = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    // the events layout probe needs the caller's session confs
    // (nanosAsLong), so the conf fingerprint joins the key
    val conf = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .getOrElse("")
    val key = s"$path@${st.getLen}_${st.getModificationTime}_$conf"
    schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
  }

  /** Normalize a probed `events` frame's `ts` column to session-TZ
    * TimestampType at microsecond precision, whatever physical layout
    * the file carries. Shared by the batch loader above and the
    * streaming source (graft.streaming.StreamingQueries) so a third
    * parquet layout is handled in exactly ONE place — the two copies
    * had already started to diverge once (ADVICE r7).
    */
  private[graft] def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected INT64 nanos or timestamp)")
    }
  }
}
