package graft.operators

/** q_skyline semantics: the returned set must equal the naive
  * quadratic dominance definition exactly (the engine's bucketed
  * decomposition is an optimization, never a semantics change), and
  * the frontier must have the 2-D skyline's characteristic shape.
  */
class SkylineSpec extends graft.SparkSuite {

  private def parts(dir: String): Array[(Long, Double, Int)] =
    spark.read.parquet(dir + "/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))

  private def bruteSkyline(ps: Array[(Long, Double, Int)]): Set[Long] =
    ps.filter { case (_, ap, as_) =>
      !ps.exists { case (_, bp, bs) =>
        bp <= ap && bs >= as_ && (bp < ap || bs > as_)
      }
    }.map(_._1).toSet

  test("q_skyline equals the quadratic dominance definition (sf0.01)") {
    val all = parts(sf("sf0.01"))
    val expect = bruteSkyline(all)
    val got = graft.QueryRegistry.byName("q_skyline")
      .run(spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(got.map(_._1).toSet == expect,
      s"skyline mismatch: extra=${got.map(_._1).toSet -- expect} " +
        s"missing=${expect -- got.map(_._1).toSet}")
    // frontier shape: sorted by price ascending, sizes strictly
    // increase across distinct price levels (else the cheaper level
    // would dominate), and within a level all rows share the level max
    val byPrice = got.sortBy(_._2)
    byPrice.sliding(2).foreach {
      case Array((_, p1, s1), (_, p2, s2)) =>
        if (p1 < p2) assert(s2 > s1, s"level $p2 not above $p1's max")
        else assert(s1 == s2, "same-price skyline rows must tie on size")
      case _ =>
    }
  }

  test("q_skyline: exact (price, size) ties all survive together") {
    // no strict inequality ⇒ neither dominates the other; if the
    // corpus has a duplicated skyline point, every copy must be kept
    val all = parts(sf("sf0.001"))
    val expect = bruteSkyline(all)
    val got = graft.QueryRegistry.byName("q_skyline")
      .run(spark, sf("sf0.001")).collect().map(_.getLong(0)).toSet
    assert(got == expect)
    val kept = all.filter(p => got(p._1)).map(p => (p._2, p._3))
    kept.groupBy(identity).foreach { case (pt, copies) =>
      val corpusCopies = all.count(p => (p._2, p._3) == pt)
      assert(copies.length == corpusCopies,
        s"tied point $pt: kept ${copies.length} of $corpusCopies copies")
    }
  }
}
