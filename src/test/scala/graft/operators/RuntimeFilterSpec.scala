package graft.operators

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Executable evidence for the runtime row-filter tier of the 100 TB
  * story: when a shuffle join's build side is selective, Spark's
  * InjectRuntimeFilter plants a Bloom filter built FROM the dim side
  * INTO the fact side's scan-filter — the fact table is pruned before
  * it ever reaches the exchange, the runtime analogue of the static
  * partition pruning PartitionPruningSpec pins. The engine relies on
  * this instead of hand-building semi-join prefilters.
  *
  * The size thresholds are production-scale (the application side must
  * be ~10 GB by default), so the spec lowers them to make the rule
  * fire at test SF — exactly the knob a real deployment tunes, not a
  * semantics change. Result parity against the unfiltered join proves
  * the filter is transparent.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("a selective dim join injects a Bloom runtime filter on the fact side") {
    val child = graft.core.Sessions.withConf(spark,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // forbid broadcast so the join must shuffle — the shape that
      // needs the bloom prefilter (a broadcast join prunes inline)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val t = Tables(child, sf("sf0.01"))
    val dim = t.part.filter(col("p_size") === 1)
      .select(col("p_partkey"), col("p_brand"))
    val joined = t.lineitem.select(col("l_partkey"), col("l_quantity"))
      .join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain") &&
      optimized.contains("bloom_filter_agg"),
      s"no Bloom runtime filter injected:\n$optimized")

    // transparency: identical result with the rule disabled
    val plain = graft.core.Sessions.withConf(spark,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val tp = Tables(plain, sf("sf0.01"))
    val expect = tp.lineitem.select(col("l_partkey"), col("l_quantity"))
      .join(tp.part.filter(col("p_size") === 1)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
  }
}
