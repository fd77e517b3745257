package graft.streaming

import graft.SparkSuite
import graft.streaming.DocumentStreams._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class DocumentStreamsSpec extends SparkSuite {

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L + min * 60_000L)

  private val good  = (1 to 20).map(i => s"tok$i").mkString(" ") // 20 tokens
  private val good2 = (1 to 30).map(i => s"word$i").mkString(" ")
  private val short = "too short"                                // 2 tokens

  test("cleanStream admits quality-passing uniques, drops junk and replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = cleanStream(input.toDF())
      .writeStream.format("memory").queryName("clean_out")
      .outputMode("append").start()
    try {
      input.addData(
        Doc(1, good, ts(0)),   // kept
        Doc(2, short, ts(0)),  // dropped: quality gate
        Doc(3, good, ts(1)))   // dropped: duplicate content, later arrival
      q.processAllAvailable()
      input.addData(
        Doc(4, good, ts(2)),   // dropped: replay of already-admitted hash
        Doc(5, good2, ts(2)))  // kept: new content
      q.processAllAvailable()
      val kept = spark.table("clean_out").select(col("doc_id"))
        .collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(1L, 5L), s"kept: ${kept.toSeq}")
      // the admitted rows carry the audit columns
      val row = spark.table("clean_out").filter(col("doc_id") === 1).head()
      assert(row.getAs[String]("content_md5").length == 32)
      assert(row.getAs[Int]("n_tokens") == 20)
    } finally q.stop()
  }

  test("cleanStream quality band matches the batch tx_quality token band") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = cleanStream(input.toDF())
      .writeStream.format("memory").queryName("clean_band_out")
      .outputMode("append").start()
    try {
      val nine  = (1 to 9).map("t" + _).mkString(" ")
      val ten   = (1 to 10).map("t" + _).mkString(" ")
      input.addData(Doc(10, nine, ts(0)), Doc(11, ten, ts(0)))
      q.processAllAvailable()
      val kept = spark.table("clean_band_out").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L), s"kept: $kept") // 10-token floor, inclusive
    } finally q.stop()
  }
}
