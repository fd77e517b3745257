package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Executable evidence for the AQE claims SCALE.md makes: the runtime
  * re-planner (a) coalesces over-provisioned shuffle partitions to the
  * data's actual size, and (b) splits skewed sort-merge join
  * partitions — the two behaviors the engine RELIES on at 100 TB
  * instead of hand-scheduling (manual salting stays only for the
  * shapes AQE cannot fix, per operators.Skew).
  */
class AqeSpec extends SparkSuite {

  test("AQE coalesces a 32-partition shuffle down to the tiny stage's real size") {
    val child = graft.core.Sessions.withConf(spark,
      "spark.sql.shuffle.partitions" -> "32",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true")
    val df = Tables(child, sf("sf0.001")).lineitem
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"runtime coalesce did not kick in:\n$plan")
  }

  test("AQE splits a skewed sort-merge join partition (skew=true in the final plan)") {
    val child = graft.core.Sessions.withConf(spark,
      "spark.sql.shuffle.partitions" -> "8",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      // forbid broadcast so the join MUST shuffle — the skew shape
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    import child.implicits._
    // one hot key carrying ~97% of rows, padded so its partition is
    // far beyond factor × median
    val big = child.range(0, 60000)
      .select(when(col("id") % 40 =!= 0, lit(0L)).otherwise(col("id") % 37)
        .as("k"),
        concat(lit("x"), lpad(col("id").cast("string"), 64, "0")).as("pad"))
    val dim = child.range(0, 37).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    // aggregate over pad so column pruning cannot drop it before the
    // shuffle — the hot key's partition must actually carry the bytes
    val joined = big.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("s"),
        sum(length(col("pad"))).as("padb"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"skew split did not kick in:\n$plan")
  }
}
