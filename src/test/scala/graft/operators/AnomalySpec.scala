package graft.operators

import graft.{QueryRegistry, SparkSuite}

/** ev_anomaly semantics: the top-10 z-scores must match a driver-side
  * brute-force recompute (trailing-24-observed-hours mean/variance
  * from exact integer sums), and the warm-up / degenerate-variance
  * filters must hold.
  */
class AnomalySpec extends SparkSuite {

  private def brute(dir: String): Seq[(String, String, Long, Double)] = {
    val hourly = spark.read.parquet(dir + "/events.parquet")
      .selectExpr("date_trunc('hour', ts) AS h", "event_type")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp](0), r.getString(1)))
      .groupBy(identity).map { case ((h, t), a) => (t, h, a.length.toLong) }
      .toSeq
    hourly.groupBy(_._1).toSeq.flatMap { case (t, cells) =>
      val ordered = cells.sortBy(_._2.getTime)
      ordered.indices.flatMap { i =>
        val prev = ordered.slice(math.max(0, i - 24), i).map(_._3)
        if (prev.length < 12) None
        else {
          val c = prev.length.toDouble
          val sn = prev.sum.toDouble
          val ss = prev.map(x => x * x).sum.toDouble
          val variance = (ss - sn * sn / c) / (c - 1)
          if (variance <= 0) None
          else {
            val (_, h, n) = ordered(i)
            val z = (n - sn / c) / math.sqrt(variance)
            val hs = java.time.format.DateTimeFormatter
              .ofPattern("yyyy-MM-dd HH:00:00")
              .withZone(java.time.ZoneOffset.UTC)
              .format(h.toInstant)
            Some((t, hs, n, z))
          }
        }
      }
    }
  }

  test("ev_anomaly: top-10 matches the brute-force rolling z-score (sf0.01)") {
    val expect = brute(sf("sf0.01"))
      .sortBy { case (t, h, _, z) => (-math.abs(z), t, h) }.take(10)
      .map { case (t, h, n, z) =>
        (t, h, n, BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
    val got = QueryRegistry.byName("ev_anomaly").run(spark, sf("sf0.01"))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ==
      expect.map(x => (x._1, x._2, x._3)), s"got $got\nexpect $expect")
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) <= 1e-4, s"z ${g._4} vs brute ${e._4}")
    }
  }
}
