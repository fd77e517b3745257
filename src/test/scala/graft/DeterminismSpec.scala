package graft

/** Every registry query must be value-deterministic across independent
  * executions — the property the driver's hash gate and any cluster
  * retry silently depend on. Catches unseeded randomness, tie-unstable
  * LIMIT/top-k, and partitioning-dependent output.
  */
class DeterminismSpec extends SparkSuite {

  QueryRegistry.all.foreach { q =>
    test(s"${q.name} is value-deterministic") {
      def runOnce(): Seq[String] =
        q.run(spark, sf("sf0.001")).collect().map(_.toString).sorted.toSeq
      assert(runOnce() == runOnce(), s"${q.name} differs across runs")
    }
  }
}
