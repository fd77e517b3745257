package graft

/** The engine's raw-SQL surface: for dialect-neutral queries, the very
  * SQL text shipped as the DuckDB oracle must also run on Spark SQL
  * over temp views of the same tables and produce the DataFrame
  * query's exact results — three implementations (DataFrame plan,
  * Spark SQL, DuckDB) of one declared semantics.
  */
class SqlSurfaceSpec extends SparkSuite {

  /** queries whose oracle text is ANSI enough for both engines
    * (no strftime/list lambdas/DuckDB-only syntax)
    */
  private val ansiPortable = Seq(
    "q1_pricing_summary", "q6_forecast_revenue", "q_distinct",
    "q_having", "q_set_ops", "q_pivot", "q_anti_join",
    "q_scalar_subquery", "q_correlated_min", "q_window_topk",
    "q_window_running", "q_cube") // q_percentiles: quantile_cont is DuckDB-only

  private lazy val viewsReady: Unit = {
    val t = Tables(spark, sf("sf0.001"))
    Seq("region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
      "supplier" -> t.supplier, "part" -> t.part, "orders" -> t.orders,
      "lineitem" -> t.lineitem, "events" -> t.events,
      "documents" -> t.documents, "embeddings" -> t.embeddings)
      .foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }

  ansiPortable.foreach { name =>
    test(s"$name: oracle SQL runs on Spark SQL with identical results") {
      viewsReady
      val sql = SparkEntry.oracleSql(name)
      val viaSql = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      val viaDf = QueryRegistry.byName(name).run(spark, sf("sf0.001"))
        .collect().map(_.toString).sorted.toSeq
      assert(viaSql == viaDf, s"$name: SQL and DataFrame results differ")
    }
  }
}
