package graft

import org.apache.spark.sql.types.TimestampType

/** Pins BOTH physical layouts `events.parquet` has shipped in — INT64
  * TIMESTAMP(NANOS) (rounds ≤5) and plain timestamp[us] (driver
  * regeneration, Aug 13) — against committed fixture files, so a future
  * regeneration of /root/testdata can never again silently zero the
  * whole ev_* family (round 6 lost 9 queries and 72 tests to exactly
  * that). The two fixtures hold the SAME logical rows; the nanos file
  * additionally carries sub-microsecond residue the loader must
  * truncate (not round) away.
  */
class EventsSchemaSpec extends SparkSuite {
  private def fixture(layout: String): String =
    new java.io.File(s"src/test/resources/events-layouts/$layout").getAbsolutePath

  test("events loader normalizes both layouts to TimestampType") {
    for (layout <- Seq("nanos", "micros")) {
      val df = Tables(spark, fixture(layout)).events
      assert(df.schema("ts").dataType == TimestampType, s"layout=$layout")
      assert(df.columns.toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
        s"layout=$layout")
    }
  }

  test("nanos and micros fixtures load to identical rows") {
    def rows(layout: String) =
      Tables(spark, fixture(layout)).events
        .selectExpr("event_id", "unix_micros(ts) AS us", "user_id",
          "event_type", "value", "props")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(rows("nanos").toSeq == rows("micros").toSeq)
  }

  test("nanos residue truncates via integer division, never rounds up") {
    // fixture row event_id=1 stores ...000_001_999 ns → must land on
    // ..._000_001 µs (floor), not ..._000_002 (half-up would be wrong:
    // DuckDB truncates nanos to its µs timestamps)
    val us = Tables(spark, fixture("nanos")).events
      .filter("event_id = 1").selectExpr("unix_micros(ts)")
      .collect().head.getLong(0)
    assert(us == 1700000000000001L)
  }

  test("real testdata events loads and ts supports unix_micros") {
    // whatever layout the driver generated last, the loader must cope
    val df = Tables(spark, sf("sf0.001")).events
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.selectExpr("max(unix_micros(ts))").collect().head.getLong(0) > 0L)
  }
}
