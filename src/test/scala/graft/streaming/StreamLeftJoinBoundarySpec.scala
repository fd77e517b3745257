package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins the EXACT outer-emission rule of the stream-stream LEFT join
  * that ev_stream_left_join's oracle encodes — probed, not assumed
  * (the first oracle draft used "global max ts − delay" and was wrong
  * by the 30-minute gap between the two sides' maxima):
  *
  *   1. the global watermark is the MIN across both sides' watermark
  *      operators, each over ITS OWN max event time (floored to ms);
  *   2. the state-eviction bound is watermark − joinWindow − 1 ms
  *      (exclusive bound via the 1 ms subtraction);
  *   3. rows compare against that ms-quantized bound at full µs
  *      precision — a view 500 µs above the bound stays in state even
  *      though its own ms-floor sits below it.
  *
  * The fixture plants views straddling the bound at ±1 ms and at
  * sub-ms offsets; a Spark upgrade changing any of the three clauses
  * flips a planted row and fails this spec before it can corrupt the
  * driver's hash gate.
  */
class StreamLeftJoinBoundarySpec extends SparkSuite {
  import spark.implicits._

  test("outer emission: min-of-sides watermark, −1 ms bound, µs compare") {
    // purchase max defines the governing (sparser) side's watermark:
    // T is an exact second, so wm = T − 600 s with no flooring noise.
    val tUs = 1700000000000000L
    // boundary B = wm − 300 s; per the engine rule a view emits iff
    // v_us <= (B_ms − 1 ms) in µs
    val bUs = tUs - 900000L * 1000
    val rows = Seq(
      (1L, tUs, 100L, "purchase"),
      (2L, tUs, 999L, "view"), // keeps the view-side watermark ≥ purchase side's
      (10L, bUs - 1000L, 1L, "view"), // 1 ms below: emits (equality at the bound)
      (11L, bUs, 2L, "view"),         // exactly at B: held
      (12L, bUs + 500L, 3L, "view"),  // B + 500 µs: held
      (13L, bUs + 1000L, 4L, "view"), // 1 ms above: held
      (14L, bUs - 500L, 5L, "view"),  // (B − 1 ms) + 500 µs: held — µs compare,
                                      // even though floor-ms(v) < B_ms
    )
    val dir = java.nio.file.Files.createTempDirectory("lj_bnd")
    val ckpt = java.nio.file.Files.createTempDirectory("lj_bnd_ckpt")
    try {
      rows.toDF("event_id", "us", "user_id", "event_type")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("events.parquet").toString)
      val schema = spark.read.parquet(dir.resolve("events.parquet").toString)
        .schema
      val stream = spark.readStream.schema(schema)
        .parquet(dir.resolve("events.parquet").toString)
      val q = EventStreams.viewPurchaseLeftJoin(stream)
        .writeStream.format("memory").queryName("lj_bnd")
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val emitted = spark.table("lj_bnd").collect()
        .map(r => r.getLong(0)).toSet
      assert(emitted == Set(10L),
        s"boundary behavior changed: emitted $emitted, expected {10} — " +
          "update ev_stream_left_join's oracle emission clause to match")
      // and the oracle's own arithmetic reproduces the engine verdicts
      val wmMs = tUs / 1000 - 600000
      val bound = (wmMs - 300001) * 1000
      val predicted = rows.collect {
        case (id, us, _, "view") if us <= bound => id
      }.toSet
      assert(predicted == emitted, s"oracle clause predicts $predicted")
    } finally {
      spark.catalog.dropTempView("lj_bnd")
      Seq(dir, ckpt).foreach { p =>
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }
  }
}
