package graft

/** Physical-plan lint for the whole registry: no query may plan an
  * unbounded CartesianProduct — the one join shape that cannot survive
  * a 100 TB input. Non-equi joins against a *broadcast* side
  * (BroadcastNestedLoopJoin) are permitted only for the queries that
  * declare a bounded small side (brute-force similarity baselines, the
  * 16-centroid IVF assignment).
  */
class PlanAuditSpec extends SparkSuite {

  /** declared brute-force baselines: O(n²) against a bounded/broadcast
    * side is their documented contract. q_approx_distinct's entry is a
    * 1-row × 1-row cross of two global aggregates, not a data join.
    */
  private val broadcastLoopAllowed = Set(
    "ss_cosine_topk", "ss_ivf_topk", "q_scalar_subquery",
    "q_approx_distinct", "tx_tfidf")

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} plans no cartesian product") {
      val plan = q.run(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct:\n$plan")
      if (!broadcastLoopAllowed(q.name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an undeclared nested-loop join:\n$plan")
      }
    }

    test(s"${q.name} plans no unbounded collect aggregate") {
      // collect_set/collect_list buffers grow with group cardinality —
      // a hot key (a boilerplate passage, a viral n-gram) materializes
      // a multi-million-element array in ONE aggregation buffer. No
      // registry query may plan one; bounded-set semantics must be
      // expressed as count/min/max + rejoin (see dd_dup_passages).
      val plan = q.run(spark, sf("sf0.001")).queryExecution.executedPlan.toString
      Seq("collect_set", "collect_list").foreach { fn =>
        assert(!plan.contains(fn),
          s"${q.name} plans an unbounded $fn aggregate:\n$plan")
      }
    }
  }
}
