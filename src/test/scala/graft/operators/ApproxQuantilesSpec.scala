package graft.operators

import graft.{QueryRegistry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** q_approx_quantiles — the mergeable quantile sketch: the gate flags
  * must hold, and independently the sketch values must land inside the
  * exact rank band computed from the fully sorted column.
  */
class ApproxQuantilesSpec extends SparkSuite {

  test("rank-guarantee flags hold at both SFs") {
    Seq("sf0.001", "sf0.01").foreach { sfn =>
      val r = QueryRegistry.byName("q_approx_quantiles")
        .run(spark, sf(sfn)).collect().head
      assert(r.getAs[Boolean]("p50_ok"), sfn)
      assert(r.getAs[Boolean]("p90_ok"), sfn)
      assert(r.getAs[Boolean]("p99_ok"), sfn)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("sketch values sit inside the exact rank band of the sorted column") {
    val xs = Tables(spark, sf("sf0.001")).lineitem
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = xs.length
    val acc = 1000
    val approx = Tables(spark, sf("sf0.001")).lineitem
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc)).as("a50"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(acc)).as("a90"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(acc)).as("a99"))
      .collect().head
    Seq(("a50", 0.5), ("a90", 0.9), ("a99", 0.99)).foreach { case (c, p) =>
      val v = approx.getAs[Double](c)
      val lo = xs(math.max(0, (n * (p - 2.0 / acc)).floor.toInt))
      val hi = xs(math.min(n - 1, (n * (p + 2.0 / acc)).ceil.toInt))
      assert(v >= lo && v <= hi, s"$c=$v outside exact band [$lo, $hi]")
    }
  }
}
