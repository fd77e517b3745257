package graft

/** Scale-shape guarantees for the two eager driver-coordinated
  * pipelines (the PlanAuditSpec bans only see their declared
  * `eagerPlan` intermediate — this spec pins the properties that made
  * the eager shapes worth building):
  *
  *  - parallelism is the shuffle-partition CONFIG KNOB, not the
  *    source/group cardinality (the round-3 defect: a
  *    `Window.partitionBy(source)` collapsed tx_pack to one task per
  *    shard; `percentile` buffered a third of all orders per group);
  *  - the exchange is a RANGE partitioning on the pipeline's full sort
  *    key, so each source/group occupies a contiguous run of
  *    partitions and the driver-side prefix sums are correct;
  *  - the driver collect is bounded by partitions + key cardinality
  *    (contiguity: a partition spans >1 key only at run boundaries) —
  *    never by data volume.
  */
class EagerShapeSpec extends SparkSuite {

  /** Child session with a wide shuffle (32 > every key cardinality in
    * the test tables) — proves partition count tracks the knob, and
    * does not mutate the shared 4-partition test session.
    */
  private lazy val wide = graft.core.Sessions.withConf(spark,
    "spark.sql.shuffle.partitions" -> "32")

  test("tx_pack parallelism tracks the partition knob, not the shard count") {
    val dir     = sf("sf0.001")
    val sorted  = text.TextQueries.packSorted(wide, dir)
    val nPart   = sorted.rdd.getNumPartitions
    val nSource = Tables(wide, dir).documents
      .select("source").distinct().count().toInt
    assert(nPart == 32, s"expected the configured 32 partitions, got $nPart")
    assert(nPart > nSource,
      s"parallelism ($nPart) must exceed shard count ($nSource) — " +
        "a per-shard window shape would cap it at the shard count")
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(source"),
      s"tx_pack's exchange must range-partition on (source, doc_id):\n$plan")
    val partials = text.TextQueries.packPartials(sorted.rdd)
    assert(partials.length <= nPart + nSource,
      s"driver collect must stay bounded by partitions+sources " +
        s"(${nPart + nSource}), got ${partials.length}")
  }

  test("q_percentiles parallelism tracks the partition knob, not the group count") {
    val dir    = sf("sf0.001")
    val sorted = operators.Relational.percentileSorted(wide, dir)
    val nPart  = sorted.rdd.getNumPartitions
    val nGroup = Tables(wide, dir).orders
      .select("o_orderstatus").distinct().count().toInt
    assert(nPart == 32, s"expected the configured 32 partitions, got $nPart")
    assert(nPart > nGroup,
      s"parallelism ($nPart) must exceed group count ($nGroup) — " +
        "the exact-percentile aggregate shape would buffer a whole " +
        "group's rows in one task")
    val plan = sorted.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(g"),
      s"q_percentiles' exchange must range-partition on (group, value):\n$plan")
    val counts = operators.Relational.percentileCounts(sorted.rdd)
    assert(counts.length <= nPart + nGroup,
      s"driver collect must stay bounded by partitions+groups " +
        s"(${nPart + nGroup}), got ${counts.length}")
  }

  /** Null text has NULL n_tokens; the SQL window sum SKIPS nulls — the
    * doc advances the running offset by 0, still counts in its bin's
    * n_docs, and contributes nothing (NULL) to the bin's token sum. The
    * driver testdata has no null text, so this pins the semantics on a
    * fixture (an unguarded getInt would NPE here).
    */
  test("tx_pack matches the oracle's null-text window semantics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pack-null")
      .toString
    Seq(
      (1L, ("w " * 100).trim, "en", "a", 100L),
      (2L, null.asInstanceOf[String], "en", "a", 0L),
      (3L, ("w " * 200).trim, "en", "a", 200L),
      (4L, ("w " * 100).trim, "en", "a", 100L),
      (5L, ("w " * 10).trim, "en", "b", 10L),
      (6L, null.asInstanceOf[String], "en", "c", 0L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = QueryRegistry.byName("tx_pack").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toSeq
    // source a: 100 tok (prior 0 → bin 0), null (prior 100 → bin 0),
    // 200 tok (prior 100 → bin 0), 100 tok (prior 300 → bin 1)
    assert(got === Seq(
      ("a", 0L, 3L, Some(300L)),
      ("a", 1L, 1L, Some(100L)),
      ("b", 0L, 1L, Some(10L)),
      ("c", 0L, 1L, None), // all-null bin: SQL SUM of nothing is NULL
    ))
  }
}
