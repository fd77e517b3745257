package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The ingest loops' micro-batch runner — its own object (no
  * registry-object references) so a spec can initialize it without
  * entering the SimilarityQueries ↔ StreamingQueries re-entrant
  * object-init chain, which only tolerates SimilarityQueries-first
  * order.
  */
object IngestStream {

  /** The admit-and-ingest micro-batch loop itself, split from
    * [[StreamingQueries]]'s ingestLoop publish scaffolding so IngestLogRestartSpec can
    * kill it between batches and restart it on the same checkpoint.
    * Each batch's verdict rows land DURABLY inside foreachBatch,
    * OVERWRITTEN into a `mbatch=<id>` partition of `logParts` (r14
    * verdict ask #5 — the loop used to buffer every batch's verdicts
    * in driver memory and write once after `awaitTermination`, so a
    * mid-stream crash lost the whole log while the index kept the
    * upserts): an at-least-once foreachBatch retry REPLACES its rows
    * (same batchId → same partition), and a crash between batches
    * loses nothing already committed — the restarted stream resumes
    * from the checkpoint and re-runs at most the uncommitted batch,
    * whose log overwrite and idempotent index handler converge.
    * `failAfterBatch` is the spec's crash injection point (after the
    * log write, before the micro-batch commits — the worst-ordered
    * crash; the [[graft.core.FaultInjection]] discipline).
    */
  private[streaming] def run(child: SparkSession, stage: String,
      streamSchema: String, logSchema: String, logParts: String,
      ckpt: String, handle: (DataFrame, Long) => Seq[Row],
      failAfterBatch: Option[Long] = None): Unit = {
    val q = start(child, stage, streamSchema, logSchema, logParts, ckpt,
      handle, Trigger.AvailableNow(), failAfterBatch)
    q.awaitTermination()
  }

  /** The UNBOUNDED-trigger leg (r15 verdict task 4): the same
    * admit-and-ingest loop under `Trigger.ProcessingTime` — the shape
    * a real always-on pipeline runs, where the source never "ends" —
    * with `maxFilesPerTrigger = 1` as the rate limiter (each tick
    * admits at most one staged file, so per-batch state and the
    * verdict log stay bounded by the nightly unit no matter how deep
    * the backlog). Because an unbounded trigger never terminates on
    * its own, the DATA-COMPLETE condition stops it: all `nBatches`
    * staged batches have durably committed their log partitions. The
    * finite-backlog oracle therefore hash-matches the AvailableNow
    * leg exactly (same batches, same handlers, same log). Returns the
    * per-data-batch progress — (batchId, input rows, trigger-execution
    * ms) — so a spec can pin bounded lag; fails loudly if the backlog
    * does not drain within `timeoutMs`.
    */
  private[streaming] def runContinuous(child: SparkSession, stage: String,
      streamSchema: String, logSchema: String, logParts: String,
      ckpt: String, handle: (DataFrame, Long) => Seq[Row],
      nBatches: Int, intervalMs: Long = 100L,
      timeoutMs: Long = 180000L): Seq[(Long, Long, Long)] = {
    val q = start(child, stage, streamSchema, logSchema, logParts, ckpt,
      handle, Trigger.ProcessingTime(intervalMs), None)
    val fs = new org.apache.hadoop.fs.Path(logParts)
      .getFileSystem(child.sparkContext.hadoopConfiguration)
    def committed = (0L until nBatches.toLong).forall(i => fs.exists(
      new org.apache.hadoop.fs.Path(s"$logParts/mbatch=$i/_SUCCESS")))
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!committed && q.isActive &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    val drained = committed
    // the final batch's progress event is published asynchronously
    // after its commit — give it a bounded moment so the returned lag
    // report covers every data batch before the stop cuts the stream
    val progressDeadline = System.currentTimeMillis() + 10000L
    while (drained &&
        q.recentProgress.count(_.numInputRows > 0) < nBatches &&
        System.currentTimeMillis() < progressDeadline)
      Thread.sleep(50)
    q.stop()
    q.awaitTermination()
    require(drained,
      s"continuous ingest did not drain $nBatches batches in ${timeoutMs}ms")
    q.recentProgress.toSeq.filter(_.numInputRows > 0)
      .map(p => (p.batchId, p.numInputRows,
        p.durationMs.getOrDefault("triggerExecution", -1L).toLong))
  }

  private def start(child: SparkSession, stage: String,
      streamSchema: String, logSchema: String, logParts: String,
      ckpt: String, handle: (DataFrame, Long) => Seq[Row],
      trigger: Trigger, failAfterBatch: Option[Long])
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(logSchema)
    child.readStream
      .schema(streamSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import scala.jdk.CollectionConverters._
        child.createDataFrame(handle(batch, batchId).asJava, schema)
          .coalesce(1).write.mode("overwrite")
          // the bookkeeping partition key is `mbatch`, NOT `batch`: a
          // Hive-style partition directory SHADOWS a same-named data
          // column on read (the directory value wins), so a channel
          // whose log schema itself carries `batch` (the text channel)
          // would lose its own column to the drop in the assembly step
          .parquet(s"$logParts/mbatch=$batchId")
        failAfterBatch.filter(_ == batchId).foreach { b =>
          throw new RuntimeException(s"injected crash after batch $b")
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(trigger)
      .start()
  }
}
