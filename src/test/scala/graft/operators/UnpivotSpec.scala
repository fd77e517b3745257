package graft.operators

import graft.{QueryRegistry, SparkSuite}

/** q_unpivot — the melt must be the exact inverse reshape of q_pivot's
  * wide output, and it must plan as an Expand inside the aggregation
  * stage: one hash exchange total, no shuffle introduced by the
  * reshape itself.
  */
class UnpivotSpec extends SparkSuite {

  test("melt is the exact inverse of the pivot's wide rows") {
    val long = QueryRegistry.byName("q_unpivot")
      .run(spark, sf("sf0.001")).collect()
    val wide = QueryRegistry.byName("q_pivot")
      .run(spark, sf("sf0.001")).collect()
    val fromLong = long.map(r => (r.getAs[String]("l_linestatus"),
      r.getAs[String]("returnflag")) -> r.getAs[Double]("revenue")).toMap
    assert(long.length == wide.length * 3)
    wide.foreach { w =>
      val ls = w.getAs[String]("l_linestatus")
      assert(fromLong((ls, "A")) == w.getAs[Double]("rev_a"))
      assert(fromLong((ls, "N")) == w.getAs[Double]("rev_n"))
      assert(fromLong((ls, "R")) == w.getAs[Double]("rev_r"))
    }
  }

  test("plans an Expand and adds no shuffle beyond the aggregation's") {
    val df = QueryRegistry.byName("q_unpivot").run(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"unpivot should plan Expand:\n$plan")
    val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nHash == 1, s"expected 1 hash exchange (the partial agg), got $nHash:\n$plan")
  }
}
