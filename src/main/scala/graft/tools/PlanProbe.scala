package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: times named registry queries (3 passes after warm) and,
  * with PROBE_EXPLAIN=1, prints the executed plan — the fast inner loop
  * for plan-shape work without running the whole Bench registry.
  *
  * Usage: `sbt "runMain graft.tools.PlanProbe tx_tfidf dd_exact"`
  * (SPARK_GRAFT_SF_DIR selects the scale factor, default sf0.1).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    args.foreach { name =>
      val q = graft.QueryRegistry.byName(name)
      exec(q.run(spark, dir)) // warm
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = q.run(spark, dir)
        val t1 = System.nanoTime()
        exec(df)
        println(f"[probe] $name pass$i: ${(System.nanoTime() - t0) / 1e9}%.3f s" +
          f" (construct ${(t1 - t0) / 1e9}%.3f s)")
      }
      if (sys.env.contains("PROBE_EXPLAIN")) {
        val df = q.run(spark, dir)
        df.collect()
        println(df.queryExecution.executedPlan.toString
          .take(sys.env.getOrElse("PROBE_EXPLAIN_CHARS", "8000").toInt))
      }
    }
    spark.stop()
  }
}
