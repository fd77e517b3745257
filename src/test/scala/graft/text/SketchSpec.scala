package graft.text

import graft.{QueryRegistry, SparkSuite, Tables}
import graft.functions.SketchFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[graft.functions.SpaceSavingTopK]] — both regimes:
  *
  *  - exact (capacity ≥ distinct terms): the registered
  *    `tx_heavy_hitters` must agree with the exact group-by, err = 0;
  *  - eviction (capacity < distinct terms): the Space-Saving
  *    guarantees must hold through DISTRIBUTED partial/merge — every
  *    reported count sandwiches the true count
  *    (cnt − err ≤ true ≤ cnt) and the corpus's true top term
  *    survives in the summary.
  */
class SketchSpec extends SparkSuite {

  private def terms = Tables(spark, sf("sf0.001")).documents
    .select(explode(filter(split(col("text"), " "),
      t => length(t) > 0)).as("term"))

  private def trueCounts: Map[String, Long] =
    terms.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("tx_heavy_hitters == exact top-10 with err = 0 (capacity ≥ vocab)") {
    val got = QueryRegistry.byName("tx_heavy_hitters")
      .run(spark, sf("sf0.001")).collect()
    val exact = trueCounts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    assert(got.length == exact.length)
    got.zip(exact).zipWithIndex.foreach { case ((row, (t, c)), i) =>
      assert(row.getAs[Int]("rk") == i + 1)
      assert(row.getAs[String]("term") == t, s"rank ${i + 1}")
      assert(row.getAs[Long]("cnt") == c, s"term $t")
      assert(row.getAs[Long]("err") == 0L, s"term $t evicted unexpectedly")
    }
  }

  test("eviction regime: sandwich bound + heavy-hitter retention across a forced merge") {
    // the doc corpus's 31 terms are near-uniform (none exceeds the
    // N/capacity retention threshold), so plant one true heavy hitter
    // on top: Space-Saving only GUARANTEES retention above N/m
    val stream = terms.unionAll(
      spark.range(10000).select(lit("hot_term").as("term")))
    val truth = stream.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(truth.size > 8, "test needs vocabulary > capacity")
    val summary = stream.repartition(8) // force 8 partials + a real merge
      .agg(SketchFunctions.spaceSavingTopK(col("term"), 8).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.cnt"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(summary.length == 8, "saturated summary must hold exactly capacity entries")
    summary.foreach { case (t, cnt, err) =>
      val tr = truth.getOrElse(t, 0L)
      assert(tr <= cnt, s"$t: reported $cnt underestimates true $tr")
      assert(cnt - err <= tr, s"$t: lower bound ${cnt - err} exceeds true $tr")
    }
    val n = truth.valuesIterator.sum
    assert(truth("hot_term") > n / 8, "planted hitter must clear N/m")
    assert(summary.exists(_._1 == "hot_term"),
      "true heavy hitter hot_term lost by the sketch")
  }

  test("SQL surface: space_saving_topk agrees with the Column API") {
    graft.GraftExtensions.register(spark)
    terms.createOrReplaceTempView("sketch_terms")
    try {
      val viaSql = spark.sql(
        "SELECT space_saving_topk(term, 64) AS sk FROM sketch_terms")
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.cnt"), col("e.err")).collect().toSeq
      val viaCol = terms
        .agg(SketchFunctions.spaceSavingTopK(col("term"), 64).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.cnt"), col("e.err")).collect().toSeq
      assert(viaSql == viaCol)
    } finally spark.catalog.dropTempView("sketch_terms")
  }

  test("count_min: est >= exact for every vocab term, and linearity under repartition") {
    val truth = trueCounts
    val qs = truth.keys.toSeq.sorted
    def estimates(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.agg(SketchFunctions.countMinEstimates(col("term"), qs, 4, 512).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estimates(terms)
    truth.foreach { case (t, tr) =>
      assert(est(t) >= tr, s"$t: est ${est(t)} underestimates true $tr")
    }
    // LINEAR sketch: the partial/merge topology cannot change the
    // cells, so any repartitioning yields the identical estimates
    assert(estimates(terms.repartition(8)) == est)
    assert(estimates(terms.repartition(1)) == est)
  }

  test("count_min: saturated regime keeps the guarantee, collisions real") {
    import spark.implicits._
    // 4000 distinct synthetic terms into a 4x64 sketch — far past
    // saturation, so collisions MUST occur and the bound must still hold
    val data = (0 until 4000).flatMap(i => Seq.fill(i % 5 + 1)(s"term_$i"))
    val df = data.toDF("term").repartition(8)
    val truth = data.groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    val probe = truth.keys.toSeq.sorted.take(200)
    val est = df
      .agg(SketchFunctions.countMinEstimates(col("term"), probe, 4, 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    probe.foreach { t =>
      assert(est(t) >= truth(t), s"$t: ${est(t)} < true ${truth(t)}")
    }
    assert(probe.exists(t => est(t) > truth(t)),
      "4000 terms in 64 cells produced zero collisions — sketch not exercised")
  }

  test("count_min: TIGHT ε-bound holds for the gate's terms on the current corpus") {
    // tx_count_min's cross-engine gate checks est ≤ exact + 2·⌈εN⌉ —
    // deliberately slack, because for fixed seeded hashes the 1-row
    // CMS bound est ≤ exact + ⌈εN⌉ holds only w.p. ~1−e⁻⁴ per term
    // over hash choice. THIS test pins the tight bound against the
    // corpus as it exists today: if a testdata regeneration lands an
    // unlucky term, it fails HERE (loudly, with the term named), not
    // inside the hash gate.
    val qTerms = Seq("join", "vector", "window", "stream", "customer",
      "zzz_absent")
    Seq("sf0.001", "sf0.01").foreach { s =>
      val t = Tables(spark, sf(s)).documents
        .select(explode(filter(split(col("text"), " "),
          x => length(x) > 0)).as("term"))
      val n = t.count()
      val bound = math.ceil(math.E * n / 512).toLong
      val exact = t.filter(col("term").isin(qTerms: _*))
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val est = t
        .agg(SketchFunctions.countMinEstimates(col("term"), qTerms, 4, 512).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.est")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      qTerms.foreach { q =>
        val ex = exact.getOrElse(q, 0L)
        assert(est(q) <= ex + bound,
          s"$s/$q: est ${est(q)} > exact $ex + tight bound $bound — " +
            "testdata refresh hit an unlucky hash; retune the gate terms")
      }
    }
  }

  test("count_min: non-string input fails at analysis, not execution") {
    import spark.implicits._
    val nums = Seq(1L, 2L, 3L).toDF("v")
    val e = intercept[Exception] {
      nums.agg(SketchFunctions.countMinEstimates(col("v"), Seq("1"), 4, 64))
        .collect()
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("type") || msg.contains("string"),
      s"expected an analysis-time type error, got: ${e.getMessage}")
  }

  test("SQL surface: count_min_estimates trims and drops empty term segments") {
    graft.GraftExtensions.register(spark)
    terms.createOrReplaceTempView("cms_terms_trim")
    try {
      // 'join, stream,' must parse as ["join","stream"], not
      // ["join"," stream",""]
      val got = spark.sql(
        "SELECT count_min_estimates(term, 'join, stream,', 4, 512) AS sk " +
          "FROM cms_terms_trim")
        .select(explode(col("sk")).as("e"))
        .select(col("e.term")).collect().map(_.getString(0)).toSeq
      assert(got.sorted == Seq("join", "stream"), s"got $got")
    } finally spark.catalog.dropTempView("cms_terms_trim")
  }

  test("SQL surface: count_min_estimates agrees with the Column API") {
    graft.GraftExtensions.register(spark)
    terms.createOrReplaceTempView("cms_terms")
    try {
      val qs = Seq("join", "stream", "zzz")
      val viaSql = spark.sql(
        "SELECT count_min_estimates(term, 'join,stream,zzz', 4, 512) AS sk " +
          "FROM cms_terms")
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.est")).collect().toSeq
      val viaCol = terms
        .agg(SketchFunctions.countMinEstimates(col("term"), qs, 4, 512).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.est")).collect().toSeq
      assert(viaSql == viaCol)
    } finally spark.catalog.dropTempView("cms_terms")
  }
}
