package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Replays an events parquet table as a rate-limited file stream
  * through the streaming sessionizer and prints closed sessions —
  * the runnable surface of the streaming module:
  * `runMain graft.streaming.StreamDemo <sfDir>`
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // stage the batch table as a file-source stream (1 file per batch)
    val staging = java.nio.file.Files.createTempDirectory("stream-in").toString
    val events  = graft.Tables(spark, sfDir).events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    events.write.mode("overwrite").parquet(staging)

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staging)
      .as[EventStreams.Event]

    val q = EventStreams.sessionize(stream)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    val closed = spark.table("sessions")
    println(s"closed_sessions=${closed.count()}")
    closed.orderBy(desc("n_events")).show(5, truncate = false)
    q.stop()
    spark.stop()
  }
}
