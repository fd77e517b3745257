package graft.operators

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** ev_sliding_agg semantics: the 1-hour/15-minute sliding windows must
  * place every event in exactly four windows, and each window's count
  * must equal a direct interval recount.
  */
class SlidingWindowSpec extends SparkSuite {

  test("every event lands in exactly 4 overlapping windows") {
    val dir = sf("sf0.001")
    val events = spark.read.parquet(dir + "/events.parquet")
    val out = QueryRegistry.byName("ev_sliding_agg").run(spark, dir)
    val totalWindowed = out.agg(sum(col("n"))).head().getLong(0)
    assert(totalWindowed == 4L * events.count(),
      s"window multiplicity broken: $totalWindowed vs 4x${events.count()}")
  }

  test("a window's count equals the direct [start, start+1h) recount") {
    val dir = sf("sf0.001")
    val events = graft.Tables(spark, dir).events
      .select("ts", "event_type").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[String]("event_type")))
    val rows = QueryRegistry.byName("ev_sliding_agg").run(spark, dir)
      .collect()
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    // spot-check 20 windows spread across the output
    val step = math.max(1, rows.length / 20)
    rows.indices.by(step).foreach { i =>
      val r = rows(i)
      val startMs = java.time.Instant
        .from(fmt.parse(r.getString(0))).toEpochMilli
      val expect = events.count { case (t, ty) =>
        ty == r.getString(1) && t >= startMs && t < startMs + 3600000L
      }
      assert(r.getLong(2) == expect,
        s"window ${r.getString(0)}/${r.getString(1)}: " +
          s"${r.getLong(2)} vs recount $expect")
    }
  }
}
