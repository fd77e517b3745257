package graft.streaming

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-facing streaming entries: the Structured-Streaming pipelines
  * in [[EventStreams]] executed end-to-end (file source →
  * `Trigger.AvailableNow` → memory sink) and verified against the SAME
  * DuckDB oracle as their batch twins — streaming correctness as a
  * hash-checked number, not a parity spec alone.
  *
  * Execution model: `AvailableNow` processes the full backlog in
  * bounded micro-batches and terminates — exactly how a 100 TB
  * pipeline runs its nightly catch-up on the same code that serves the
  * live stream. Complete-mode output is what makes the final memory
  * table equal the batch aggregation (append mode only emits windows
  * the watermark has closed, and a finite file backlog never closes
  * the last window).
  *
  * The memory sink materializes on the driver, so these entries are
  * only registered for BOUNDED aggregates (hour×type cardinality —
  * ~3.4k rows at sf0.1), the same bounded-collect contract as the ANN
  * model aggregates (SCALE.md). A production deployment writes to a
  * real sink; the memory sink is the oracle-comparison seam.
  *
  * Plan-lint note: `run` executes the stream eagerly and returns the
  * sink table (a local relation), so the query declares `eagerPlan` —
  * the batch-equivalent pipeline over the same loader — as its
  * auditable distributed shape, the same pattern as the prefix-sum
  * and rank-method queries. Spark plans the incremental query from
  * the identical logical aggregation.
  */
object StreamingQueries {

  private val sinkId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Streaming twin of `Tables.events`: same footer-schema probe, same
    * nanos/micros normalization, but as an unbounded file source (the
    * stream must tolerate both physical layouts for the same reason
    * the batch loader does — a lake holds mixed writer generations).
    */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val reader = graft.core.Sessions.withConf(s,
      "spark.sql.legacy.parquet.nanosAsLong" -> "true")
    val rawSchema = reader.read.parquet(s"$dir/events.parquet").schema
    val raw = reader.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    rawSchema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other")
    }
  }

  /** Run a streaming DataFrame to completion into a fresh memory-sink
    * table and return it (complete mode; unique sink name per run so
    * bench passes don't collide).
    */
  private def runToTable(agg: DataFrame): DataFrame = {
    val name = s"graft_stream_sink_${sinkId.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt").toString
    val q = agg.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the sink's temp view registers in the session that started the
    // query — agg's (child) session, not necessarily the caller's
    agg.sparkSession.table(name)
  }

  /** [[EventStreams.hourlyAgg]] over the events backlog; oracle =
    * the batch hourly rollup (no `n_users`: distinct aggregation is
    * not incrementally computable in a streaming windowed agg — the
    * streaming counterpart would be an approx sketch, which has no
    * exact oracle).
    */
  val streamHourly = Query(
    "ev_stream_hourly",
    (s, dir) => {
      val result = runToTable(EventStreams.hourlyAgg(eventsStream(s, dir)))
      result
        .select(
          date_format(col("hour"), "yyyy-MM-dd HH:00:00").as("hour"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("hour"), col("event_type"))
    },
    oracle = Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
             event_type, count(*) AS n,
             round(sum(value), 2) AS total_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """),
    eagerPlan = Some((s, dir) =>
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))),
  )

  def all: Seq[Query] = Seq(streamHourly)
}
