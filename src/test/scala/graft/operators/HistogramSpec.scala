package graft.operators

import graft.{QueryRegistry, SparkSuite}

class HistogramSpec extends SparkSuite {
  test("q_histogram: contiguous buckets, exact totals, shares sum to ~1") {
    val rows = QueryRegistry.byName("q_histogram")
      .run(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // buckets are disjoint fixed-width intervals in ascending order
    rows.foreach { r =>
      assert(r.getAs[Double]("lo") == r.getAs[Long]("bucket") * 11000.0)
      assert(r.getAs[Double]("hi") == r.getAs[Double]("lo") + 11000.0)
      assert(r.getAs[Long]("n") > 0)
    }
    assert(rows.map(_.getAs[Long]("bucket")).toSeq ==
      rows.map(_.getAs[Long]("bucket")).sorted.toSeq)
    // every lineitem row lands in exactly one bucket
    val total = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 0.01, s"share sum $shareSum")
  }
}
