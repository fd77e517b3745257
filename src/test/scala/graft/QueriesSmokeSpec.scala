package graft

/** Fast per-query smoke at sf0.001: every registry entry must run and
  * (for these fixtures) produce rows; full value-level correctness is
  * the DuckDB oracle gate (tools/oracle_check.py / driver t2).
  */
class QueriesSmokeSpec extends SparkSuite {

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.run(spark, sf("sf0.001")).count()
      assert(n >= 0)
      // queries over these fixtures are expected to be non-degenerate,
      // except the two that are legitimately selective at the tiny SF
      // (few customers lack 1995 orders / few nations have >=3 suppliers)
      // ev_stream_range_join shares ev_range_join's semantics, so it
      // is empty at exactly the same SFs
      val mayBeEmpty = Set("q_anti_join", "q_having", "ev_range_join",
        "ev_stream_range_join")
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
