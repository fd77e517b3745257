package graft.streaming

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Pins the UNBOUNDED-trigger ingest leg (r15 verdict task 4): the
  * same admit-and-ingest loop under `Trigger.ProcessingTime` with
  * `maxFilesPerTrigger` rate limiting — the always-on pipeline shape —
  * stopped by the data-complete condition, must commit the IDENTICAL
  * durable log and index as the AvailableNow leg over the same finite
  * backlog (which is why `ss_stream_ingest`'s oracle keeps
  * hash-matching after the vector channel switched triggers), with
  * per-tick input bounded by the rate limiter (state and lag stay
  * bounded no matter how deep the backlog) and a loud failure if the
  * backlog does not drain.
  */
class StreamContinuousSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  private def e = Tables(spark, dir).embeddings
    .select(col("vec_id"), col("embedding"))

  /** A self-contained vector-channel world: fresh IVF index + two
    * staged nightly files + the ingest-then-probe handler — the
    * ss_stream_ingest shape without the publish scaffolding.
    */
  private def world(tag: String): (String, String, String, String,
      (DataFrame, Long) => Seq[Row]) = {
    import graft.similarity.{SimilarityQueries => SQ}
    val base = java.nio.file.Files
      .createTempDirectory(s"graft-continuous-$tag").toString
    val idx   = s"$base/idx"
    val cents = SQ.trainIvfCentroids(e, 16)
    SQ.writeIvfIndex(spark, e, cents, idx)
    val stage = s"$base/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stage))
    def stageOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val scratch = s"$base/scratch_$name"
      df.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$stage/$name.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      ()
    }
    def fresh(off: Long): DataFrame = e.filter(col("vec_id") < 8)
      .select((col("vec_id") + off).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val t0 = 1700000000000L
    stageOne(fresh(300000L), "batch1", t0)
    stageOne(fresh(400000L), "batch2", t0 + 120000L)
    val handle: (DataFrame, Long) => Seq[Row] = (batch, _) => {
      SQ.upsertIvfIndex(spark, idx, batch)
      val probes = SQ.probesOfAll(batch, cents)
      val cells = probes.select(col("cell")).distinct()
        .collect().map(_.getInt(0)).sorted
      val assigned = spark.read.parquet(s"$idx/cells")
        .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
        .select(col("vec_id"), col("embedding"), col("cell"))
      SQ.rankTail(assigned, probes).collect().toSeq
    }
    (idx, stage, s"$base/logparts", s"$base/ckpt", handle)
  }

  private def logRows(logParts: String): Seq[(Long, Int, Long, Double)] =
    spark.read.parquet(logParts)
      .select(col("qid"), col("rk"), col("nid"), col("cos"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted

  test("continuous trigger == AvailableNow over the finite backlog; lag bounded by the rate limiter") {
    val schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    val logDdl = "qid LONG, rk INT, nid LONG, cos DOUBLE"

    val (idxA, stageA, logA, ckptA, handleA) = world("availnow")
    IngestStream.run(spark, stageA, schema, logDdl, logA, ckptA, handleA)

    val (idxC, stageC, logC, ckptC, handleC) = world("continuous")
    val progress = IngestStream.runContinuous(spark, stageC, schema,
      logDdl, logC, ckptC, handleC, nBatches = 2)

    // identical durable outputs: the data-complete stop makes the
    // unbounded trigger oracle-equivalent over a finite backlog
    assert(logRows(logC) == logRows(logA),
      "continuous-trigger log diverged from the AvailableNow leg")
    def cellIds(idx: String): Set[Long] =
      spark.read.schema("vec_id LONG, embedding ARRAY<FLOAT>, cell INT")
        .parquet(s"$idx/cells").select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
    assert(cellIds(idxC) == cellIds(idxA),
      "continuous-trigger index diverged from the AvailableNow leg")

    // bounded state/lag: the rate limiter admits ONE file per tick, so
    // the two staged files produce exactly TWO data ticks (an
    // unlimited source would drain the whole backlog in one) — batch
    // ids 0 and 1, each with a finite recorded trigger-execution time.
    // numInputRows is not asserted per-row: the handler re-executes
    // the source scan (merge locate + probe), so the metric counts
    // bounded re-reads of the one admitted file, not extra admission.
    assert(progress.map(_._1).sorted == Seq(0L, 1L),
      s"the rate limiter did not split the backlog one file per tick: " +
        s"$progress")
    assert(progress.forall(p => p._3 >= 0 && p._3 < 60000),
      s"unbounded per-tick lag: $progress")
  }

  test("an undrained backlog fails loudly instead of hanging") {
    val (_, stageC, logC, ckptC, handleC) = world("timeout")
    intercept[IllegalArgumentException] {
      // demand one more batch than was staged: the data-complete
      // condition can never hold, and the guard must trip
      IngestStream.runContinuous(spark, stageC,
        "vec_id LONG, embedding ARRAY<FLOAT>",
        "qid LONG, rk INT, nid LONG, cos DOUBLE",
        logC, ckptC, handleC, nBatches = 3, timeoutMs = 15000L)
    }
  }
}
