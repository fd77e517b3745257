package graft.dedup

import graft.{QueryRegistry, SparkSuite}
import org.apache.spark.sql.functions._

/** Pins dd_band_probe's serving contract: the persisted-index path
  * returns rows IDENTICAL to the index-less dd_minhash_cdc pipeline,
  * the bands scan is statically partition-pruned, the hot-band cap is
  * a build-time property of the index, and the build is idempotent.
  */
class BandProbeSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("probe output is row-identical to the index-less CDC screen") {
    val probe = QueryRegistry.byName("dd_band_probe").run(spark, dir).collect()
    val cdc = QueryRegistry.byName("dd_minhash_cdc").run(spark, dir).collect()
    assert(probe.sameElements(cdc),
      "persisted-index admission diverges from the recompute path")
  }

  test("the bands scan carries a static partition filter on bkt") {
    val plan = QueryRegistry.byName("dd_band_probe").run(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_band_index"), s"no index scan in:\n$plan")
    assert(plan.contains("PartitionFilters: [bkt"),
      s"bands scan not partition-pruned:\n$plan")
  }

  test("the hot-band cap is enforced in the persisted index") {
    val idx = DedupQueries.buildBandIndex(spark, dir)
    val hot = spark.read.parquet(s"$idx/bands")
      .groupBy(col("bh")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 50).count()
    assert(hot == 0, "a hot band survived the build-time cap")
    // and the build is idempotent: same source data, same directory
    assert(DedupQueries.buildBandIndex(spark, dir) == idx)
  }
}
