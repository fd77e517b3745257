package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing probe for perf iteration (not a driver
  * contract): warms once, then prints min-of-N wall seconds.
  *
  *   runMain graft.Probe <queryName>[,<queryName>...] [sfDir] [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: Probe <query>[,<query>...] [sfDir] [reps]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val reps  = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(q: Query): Double = {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val q = QueryRegistry.byName(n)
      exec(q) // warm
      val best = (1 to reps).map(_ => exec(q)).min
      println(f"PROBE $n%-22s $best%.3f s (min of $reps)")
      if (sys.env.contains("SPARK_GRAFT_PLAN")) {
        // collect() drives THIS QueryExecution so the printed adaptive
        // plan is the final one (a write would execute a separate QE)
        val df = q.run(spark, sfDir)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
