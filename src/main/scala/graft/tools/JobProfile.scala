package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev profiler: runs a named registry query once (after a warm pass)
  * with a job listener attached and prints every Spark job's wall time
  * plus the driver-side GAP before it — planning, footer reads,
  * checkpoint setup, anything that is not a running job. The gap/job
  * split is the first question of any per-query optimization: a query
  * dominated by gaps needs fewer actions or cheaper planning, one
  * dominated by a single job needs a better plan (guide §1.1).
  *
  * Usage: `sbt "runMain graft.tools.JobProfile ev_stream_left_join ..."`
  * (SPARK_GRAFT_SF_DIR selects the scale factor, default sf0.1).
  */
object JobProfile {
  private final case class JobRec(id: Int, desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[JobRec]()
    val listener = new SparkListener {
      private val open = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(js.stageInfos.lastOption.map(si =>
            s"${si.name} [${js.stageInfos.size} stages]"))
          .getOrElse("")
        val r = JobRec(js.jobId, desc.take(90), js.time, -1L)
        open.put(js.jobId, r); jobs.add(r)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = open.remove(je.jobId)
        if (r != null) r.end = je.time
      }
    }

    args.foreach { name =>
      val q = graft.QueryRegistry.byName(name)
      try exec(q.run(spark, dir)) // warm
      catch { case e: Throwable => println(s"[warm] $name failed: ${e.getMessage}") }
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      exec(q.run(spark, dir))
      val t1 = System.currentTimeMillis()
      // listener events are posted async; give the bus a moment to drain
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      val recs = jobs.toArray(Array.empty[JobRec]).sortBy(_.start)
      println(f"\n===== $name total ${(t1 - t0) / 1e3}%.3f s, ${recs.length} jobs =====")
      var cursor = t0
      var jobMs = 0L
      var gapMs = 0L
      recs.foreach { r =>
        val gap = math.max(0L, r.start - cursor)
        val durEnd = if (r.end > 0) r.end else t1
        val dur = math.max(0L, durEnd - math.max(r.start, cursor))
        gapMs += gap
        jobMs += dur
        cursor = math.max(cursor, durEnd)
        println(f"  gap ${gap / 1e3}%6.3f s | job ${r.id}%4d ${dur / 1e3}%6.3f s  ${r.desc}")
      }
      val tailGap = math.max(0L, t1 - cursor)
      gapMs += tailGap
      println(f"  gap ${tailGap / 1e3}%6.3f s | (tail)")
      println(f"  TOTAL job ${jobMs / 1e3}%.3f s, driver-gap ${gapMs / 1e3}%.3f s")
    }
    spark.stop()
  }
}
