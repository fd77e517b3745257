package graft.similarity

import graft.{QueryRegistry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** ss_maxsim — late-interaction MaxSim: row-parity with an independent
  * driver-side recomputation of Σ-of-max-cosine scoring, plus the
  * declared plan shape (bounded broadcast loop + TopKPerGroup tail,
  * no corpus-wide window/sort).
  */
class MaxsimSpec extends SparkSuite {

  test("top-3 per query doc matches a driver-side brute recomputation") {
    val rows = QueryRegistry.byName("ss_maxsim")
      .run(spark, sf("sf0.001")).collect()
    // independent truth: collect the (tiny at sf0.001) embedding table
    val vecs = Tables(spark, sf("sf0.001")).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byDoc = vecs.groupBy { case (id, _) => id / 10 }
      .map { case (did, m) => did -> m.values.toArray }
    val expected = (0L until 5L).flatMap { qdoc =>
      val scores = byDoc.collect { case (ddoc, dv) if ddoc != qdoc =>
        val s = byDoc(qdoc).map(qv => dv.map(d => cos(qv, d)).max).sum
        ddoc -> BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq
      scores.sortBy { case (d, s) => (-s, d) }.take(3).zipWithIndex
        .map { case ((ddoc, s), i) => (qdoc, i + 1, ddoc, s) }
    }
    val got = rows.map(r => (r.getAs[Long]("qdoc"), r.getAs[Int]("rk"),
      r.getAs[Long]("ddoc"), r.getAs[Double]("score"))).toSeq
    assert(got == expected)
  }

  test("plan: broadcast loop over the bounded query side, heap tail, no window below it") {
    val df = QueryRegistry.byName("ss_maxsim").run(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(plan.contains("TopKPartial") && plan.contains("TopKFinal"),
      s"ranking tail must be the bounded-heap operator:\n${plan.take(800)}")
  }
}
