package graft.operators

import graft.{QueryRegistry, SparkSuite}

class ApproxDistinctSpec extends SparkSuite {
  test("HLL estimates within 10% of exact distinct counts") {
    val r = QueryRegistry.byName("q_approx_distinct")
      .run(spark, sf("sf0.01")).collect().head
    def rel(a: Long, e: Long) = math.abs(a - e).toDouble / e
    assert(rel(r.getAs[Long]("approx_parts"), r.getAs[Long]("exact_parts")) < 0.1)
    assert(rel(r.getAs[Long]("approx_orders"), r.getAs[Long]("exact_orders")) < 0.1)
  }
}
