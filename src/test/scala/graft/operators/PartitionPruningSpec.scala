package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning: writing a fact
  * table partitioned by a coarse key lets a filtered read skip whole
  * directories — at 100 TB this is the difference between scanning a
  * year and scanning everything. The plan must show the filter as a
  * PartitionFilter (directory skip), not a PushedFilter (row skip).
  */
class PartitionPruningSpec extends SparkSuite {

  test("year-partitioned write is pruned by a year filter") {
    val dir = java.nio.file.Files.createTempDirectory("part-prune")
      .resolve("orders_by_year").toString
    val t = Tables(spark, sf("sf0.001"))
    t.orders
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString

    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"),
      s"year filter should prune partitions:\n$plan")
    // and it reads exactly the 1996 slice
    val expected = t.orders.filter(year(col("o_orderdate")) === 1996).count()
    assert(pruned.count() == expected)
    // probe: unpartitioned column filters stay row-level (PushedFilters)
    val rowFiltered = spark.read.parquet(dir)
      .filter(col("o_totalprice") > 100000.0)
    val plan2 = rowFiltered.queryExecution.executedPlan.toString
    assert(plan2.contains("PushedFilters: [IsNotNull(o_totalprice)"),
      s"price filter should push down:\n$plan2")
  }
}
