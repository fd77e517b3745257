package graft.streaming

import graft.SparkSuite
import graft.streaming.EventStreams._
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** Exactly-once recovery: a checkpointed streaming query stopped
  * mid-stream and restarted must produce the same closed sessions as
  * an uninterrupted run — no losses, no duplicates. (The reference's
  * recovery guarantee R6/R8, in streaming form: state survives the
  * worker, not the other way around.)
  */
class CheckpointRestartSpec extends SparkSuite {

  private def listParquet(dir: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
  }

  test("sessionize survives stop/restart from checkpoint with identical output") {
    import spark.implicits._
    val base    = Files.createTempDirectory("ckpt-restart")
    val staged  = base.resolve("staged")
    val input   = base.resolve("input")
    val ckpt    = base.resolve("checkpoint").toString
    val sink    = base.resolve("sink").toString
    Files.createDirectories(input)

    // stage the sf0.001 events as 8 parquet files, time-ordered so the
    // split point is mid-stream
    val events = graft.Tables(spark, sf("sf0.001")).events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"ts")
    events.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val rows = spark.read.parquet(staged.toString).as[Event]
      .collect().sortBy(_.ts.getTime)
    val chunks = rows.grouped(math.ceil(rows.length / 8.0).toInt).toSeq

    def stageChunk(i: Int): Unit =
      spark.createDataset(chunks(i)).coalesce(1)
        .write.mode("append").parquet(input.toString)

    def runUntilDrained(): Unit = {
      val q = sessionize(
        spark.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", "1").parquet(input.toString)
          .as[Event])
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 1: first half of the stream, then hard stop
    (0 until 4).foreach(stageChunk)
    runUntilDrained()
    // phase 2: rest of the stream, restart from the same checkpoint
    (4 until chunks.length).foreach(stageChunk)
    runUntilDrained()

    val restarted = spark.read.parquet(sink).as[Session].collect()
      .map(s => (s.user_id, s.session_start.getTime, s.n_events)).sorted

    // reference: the same stream processed without interruption
    val refBase = Files.createTempDirectory("ckpt-ref")
    val refIn   = refBase.resolve("input"); Files.createDirectories(refIn)
    chunks.indices.foreach { i =>
      spark.createDataset(chunks(i)).coalesce(1)
        .write.mode("append").parquet(refIn.toString)
    }
    val refSink = refBase.resolve("sink").toString
    val refQ = sessionize(
      spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(refIn.toString)
        .as[Event])
      .writeStream.format("parquet")
      .option("path", refSink)
      .option("checkpointLocation", refBase.resolve("ckpt").toString)
      .outputMode("append").start()
    try refQ.processAllAvailable() finally refQ.stop()
    val uninterrupted = spark.read.parquet(refSink).as[Session].collect()
      .map(s => (s.user_id, s.session_start.getTime, s.n_events)).sorted

    assert(restarted.nonEmpty)
    assert(restarted.sameElements(uninterrupted),
      s"restarted=${restarted.length} vs uninterrupted=${uninterrupted.length}")
  }
}
