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
    * OVERWRITTEN into a `batch=<id>` partition of `logParts` (r14
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
    val schema = org.apache.spark.sql.types.StructType.fromDDL(logSchema)
    val q = child.readStream
      .schema(streamSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import scala.jdk.CollectionConverters._
        child.createDataFrame(handle(batch, batchId).asJava, schema)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$logParts/batch=$batchId")
        failAfterBatch.filter(_ == batchId).foreach { b =>
          throw new RuntimeException(s"injected crash after batch $b")
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
