package graft

/** Physical-plan lint for the whole registry: no query may plan an
  * unbounded CartesianProduct — the one join shape that cannot survive
  * a 100 TB input. Non-equi joins against a *broadcast* side
  * (BroadcastNestedLoopJoin) are permitted only for the queries that
  * declare a bounded small side (brute-force similarity baselines, the
  * 16-centroid IVF assignment).
  *
  * Queries that declare an `eagerPlan` (two-level prefix sum, rank
  * method) execute their real work in driver-coordinated RDD jobs and
  * return a trivial local tail — for those the lint audits the declared
  * lazily-planned intermediate, which carries the actual exchange/sort
  * work. The scan guard below closes the evasion hole: a query whose
  * audited plan reads NONE of the input tables (no file scan anywhere)
  * is doing its work somewhere the lint cannot see, and fails unless it
  * declares the intermediate.
  */
class PlanAuditSpec extends SparkSuite {

  /** declared brute-force baselines: O(n²) against a bounded/broadcast
    * side is their documented contract. q_approx_distinct's entry is a
    * 1-row × 1-row cross of two global aggregates, not a data join.
    */
  /** tx_vocab's entry is the top-25 rows × a broadcast 1-row total —
    * the corpus-wide token sum cannot come from a window over the
    * bounded side (it spans every term, not just the kept 25).
    */
  /** ss_recall composes the declared baselines above (it re-runs
    * ss_cosine_topk and ss_ivf_topk verbatim as its truth/candidate
    * sides) and crosses two 1-row aggregates (hits × denom) — every
    * nested-loop in its plan is one of those declared-bounded shapes.
    */
  /** ss_maxsim's nested-loop side is the declared-bounded query set
    * (5 docs × 10 vecs) — the same contract as ss_cosine_topk's.
    */
  /** tx_bm25 / tx_lm_score cross the corpus-N/avgdl (resp. vocabulary-
    * size) 1-row aggregate in as a broadcast — the tx_tfidf contract.
    * q_skyline crosses the 1-row price min/max bounds that derive its
    * deterministic bucket ids.
    */
  private val broadcastLoopAllowed = Set(
    "ss_cosine_topk", "ss_ivf_topk", "q_scalar_subquery",
    "q_approx_distinct", "q_approx_quantiles", "tx_tfidf", "tx_vocab", "ss_recall",
    "ss_maxsim", "tx_bm25", "tx_lm_score", "q_skyline",
    // tx_bm25_probe crosses the persisted index's 1-row stats table in
    // as a broadcast — the same bm25Scored corpus-stats contract.
    "tx_bm25_probe",
    // tx_lm_holdout crosses the 1-row train-vocabulary size in as a
    // broadcast — the tx_lm_score contract at order 3.
    "tx_lm_holdout",
    // ss_matryoshka's nested loop is the declared-bounded 20-query
    // prefix side — the ss_cosine_topk contract; its rerank joins are
    // broadcast equi-joins on candidate ids.
    "ss_matryoshka",
    // ss_ivf_sqrtk is ss_ivf_topk at the ⌈√N⌉-defaulted cell count —
    // the same bounded-model contract (k×64-float literal centroids).
    "ss_ivf_sqrtk",
    // ss_hybrid_rrf's nested loops are its channels' declared shapes:
    // the 1-row query-vector broadcast (ss_cosine_topk contract) and
    // bm25Scored's 1-row corpus-stats broadcast (tx_bm25 contract).
    "ss_hybrid_rrf",
    // dd_cluster_split crosses the 1-row leaked_naive_clusters
    // aggregate into the 2-row per-split rollup — the
    // q_approx_distinct 1-row × k-row contract.
    "dd_cluster_split",
    // q11/q15/q22 cross a 1-row scalar aggregate (EU revenue total /
    // quarter-max revenue / positive-balance (Σ,n)) into the keyed
    // relation — the q_scalar_subquery contract.
    "q11_important_stock", "q15_top_supplier", "q22_global_sales",
    // ss_hard_negatives / ss_mmr score the corpus against a bounded
    // broadcast anchor/query set — the ss_cosine_topk contract; all
    // their later joins are equi-joins on qid over the bounded
    // candidate sets.
    "ss_hard_negatives", "ss_mmr",
    // tx_ppl_buckets reuses tx_lm_score's kernel verbatim (lmScored),
    // inheriting its sanctioned 1-row vocabulary-size broadcast cross.
    "tx_ppl_buckets")

  /** The plan the lint audits: the query's own result plan, or the
    * declared eager intermediate (which, unlike `run`, plans lazily —
    * auditing it does not execute the workload).
    */
  private val planCache = scala.collection.mutable.HashMap.empty[String, String]
  private def auditedPlan(q: Query): String =
    planCache.getOrElseUpdate(q.name, {
      val df = q.eagerPlan.getOrElse(q.run)(spark, sf("sf0.001"))
      df.queryExecution.executedPlan.toString
    })

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} plans no cartesian product") {
      val plan = auditedPlan(q)
      assert(!plan.contains("CartesianProduct"),
        s"${q.name} plans a CartesianProduct:\n$plan")
      if (!broadcastLoopAllowed(q.name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an undeclared nested-loop join:\n$plan")
      }
    }

    test(s"${q.name} plans no unbounded-state aggregate") {
      // collect_set/collect_list buffers grow with group cardinality —
      // a hot key (a boilerplate passage, a viral n-gram) materializes
      // a multi-million-element array in ONE aggregation buffer. The
      // exact `percentile` aggregate is the same class: it buffers
      // every group value (q_percentiles engineered it out in favor of
      // the rank method — this lint keeps it out). `\bpercentile\(`
      // deliberately does NOT match approx_percentile, whose sketch
      // buffer is bounded. Bounded-set semantics must be expressed as
      // count/min/max + rejoin (see dd_dup_passages).
      val plan = auditedPlan(q)
      Seq("collect_set", "collect_list").foreach { fn =>
        assert(!plan.contains(fn),
          s"${q.name} plans an unbounded $fn aggregate:\n$plan")
      }
      assert(!"""\bpercentile\(""".r.findFirstIn(plan).isDefined,
        s"${q.name} plans the unbounded exact percentile aggregate " +
          s"(use the rank method, see q_percentiles):\n$plan")
    }

    test(s"${q.name} audited plan scans the input tables") {
      // Eager-computation guard: a registry query whose audited plan
      // contains no file scan is computing its result outside the
      // planned pipeline (a driver loop, a pre-collected local table) —
      // every ban above would be vacuous for it. Queries with genuine
      // eager shapes must declare `eagerPlan` so the real pipeline
      // stays auditable; everything else must read its inputs in-plan.
      val plan = auditedPlan(q)
      assert(plan.contains("FileScan") || plan.contains("BatchScan"),
        s"${q.name}'s audited plan reads no input table — declare " +
          s"eagerPlan (see Query) if its work is genuinely eager:\n$plan")
    }
  }
}
