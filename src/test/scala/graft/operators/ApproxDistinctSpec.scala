package graft.operators

import graft.{QueryRegistry, SparkSuite}

class ApproxDistinctSpec extends SparkSuite {
  test("HLL error-bound flags are true and exact counts positive") {
    val r = QueryRegistry.byName("q_approx_distinct")
      .run(spark, sf("sf0.01")).collect().head
    assert(r.getAs[Long]("exact_parts") > 0)
    assert(r.getAs[Long]("exact_orders") > 0)
    assert(r.getAs[Boolean]("parts_within_10pct"))
    assert(r.getAs[Boolean]("orders_within_10pct"))
  }
}
