package graft.plans

import graft.{QueryRegistry, SparkSuite, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[TopKPerGroup]] — the custom logical+physical operator: row-parity
  * with the window formulation it replaces, the planned shape (partial
  * heaps → exchange → final heaps, no WindowExec / no sort of
  * non-survivors), and the partial phase's survivor bound.
  */
class TopKSpec extends SparkSuite {

  private def orders = Tables(spark, sf("sf0.01")).orders

  test("TopK.perGroup == row_number window formulation, row for row") {
    val top = TopK.perGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = orders
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect()
    assert(top.length == win.length)
    assert(top.sameElements(win))
  }

  test("planned shape: partial + final heap execs, exchange between, no window/sort") {
    val df = TopK.perGroup(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKFinal"), plan.take(800))
    assert(plan.contains("TopKPartial"), plan.take(800))
    assert(plan.contains("Exchange"), "final phase must cluster by group")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      "operator must not fall back to a window")
    assert(!plan.contains("Sort "), "operator must not plan a full sort")
  }

  test("partial phase forwards at most k rows per (group, partition)") {
    // run just the partial against a known partitioning and count
    val k = 3
    val parts = 4
    val repartitioned = orders.repartition(parts, col("o_orderkey"))
    val top = TopK.perGroup(repartitioned, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
    // survivors ≤ k × groups (final) — and the exchange input is
    // bounded by k × groups × parts; assert the observable final bound
    val nGroups = orders.select(col("o_custkey")).distinct().count()
    assert(top.count() <= k * nGroups)
    // every group emits min(k, group size) rows
    val sizes = top.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), min(col("n")).as("mn")).collect().head
    assert(sizes.getAs[Long]("mx") <= k)
  }

  test("ties beyond the tie-break column do not break determinism") {
    // duplicate totalprice rows: order stays total via o_orderkey
    val dup = orders.select(col("o_custkey"),
      (col("o_totalprice") - col("o_totalprice") % 1000).as("bucketed_price"),
      col("o_orderkey"))
    val a = TopK.perGroup(dup, Seq("o_custkey"),
      Seq("bucketed_price" -> false, "o_orderkey" -> true), 2).collect()
    val b = TopK.perGroup(dup.repartition(7), Seq("o_custkey"),
      Seq("bucketed_price" -> false, "o_orderkey" -> true), 2).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("q_group_topk returns ranked rows and survives empty-ish groups") {
    val got = QueryRegistry.byName("q_group_topk").run(spark, sf("sf0.001"))
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getAs[Int]("rk") >= 1 && r.getAs[Int]("rk") <= 3))
  }
}
