package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round throughput harness (driver contract: prints ONE JSON
  * line). Each registry query is executed twice through a `noop` sink —
  * the first pass warms JIT/parquet footers/broadcast relations, the
  * second is the measured engine throughput. The noop sink forces full
  * materialization of every operator without paying file-write cost
  * (a bare `count()` would let Catalyst prune whole subtrees).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // Dev-only subset filter (comma-separated query names); the driver
    // never sets it, so the recorded bench always covers the registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = only.fold(QueryRegistry.all)(names =>
      QueryRegistry.all.filter(q => names(q.name)))
    queries.foreach { q =>
      try exec(q.run(spark, sfDir))
      catch { case e: Throwable =>
        System.err.println(s"[bench-warm] ${q.name} failed: ${e.getMessage}")
      }
    }
    // two measured passes, min per query: single-pass numbers on a
    // shared box carry seconds of scheduler/GC noise. The second pass
    // runs in REVERSE order so an external contention window (minutes
    // of host load) cannot hit the same queries at the same relative
    // offset in both passes — the min then still sees one clean
    // measurement. A failed pass records None — a query regressing to
    // a hard failure must not make the benchmark look faster.
    def measure(order: Seq[Query]): Map[String, Option[Double]] = order.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { exec(q.run(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          false
        }
      q.name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }.toMap
    val m1 = measure(queries)
    val m2 = measure(queries.reverse)
    val results: Seq[(String, Option[Double])] = queries.map { q =>
      q.name -> ((m1(q.name), m2(q.name)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b)             => a.orElse(b) // one good pass still counts
      })
    }
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + v.fold("null")(_.toString)
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, None) => k }
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val headlineNames = queries.filter(_.headline).map(_.name).toSet
    val headlineTotal = results.collect {
      case (n, Some(v)) if headlineNames(n) => v
    }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"headline_total":$headlineTotal,"n_queries":${results.size},"errors":$errJson,"n_errors":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
