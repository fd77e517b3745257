package graft.operators

import graft.{QueryRegistry, SparkSuite}
import java.time.LocalDateTime

/** First-principles replays of the round-9 TPC-H completion batch:
  * every query re-derived in plain Scala collections from the raw
  * sf0.001 tables (6k lineitem rows — trivially collectable in a
  * test) and compared value-for-value with the engine result. The
  * DuckDB oracle pins cross-engine agreement; this spec pins that
  * BOTH engines compute what the query English says.
  */
class TpchCompletionSpec extends SparkSuite {

  private def rows(table: String): Array[org.apache.spark.sql.Row] = {
    val t = graft.Tables(spark, sf("sf0.001"))
    val df = table match {
      case "lineitem" => t.lineitem
      case "orders"   => t.orders
      case "part"     => t.part
      case "supplier" => t.supplier
      case "nation"   => t.nation
      case "region"   => t.region
      case "customer" => t.customer
    }
    df.collect()
  }

  private case class Li(ok: Long, pk: Long, sk: Long, qty: Long,
      ext: Double, disc: Double, ship: LocalDateTime, rflag: String)
  private lazy val lineitem: Array[Li] = rows("lineitem").map { r =>
    Li(r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey"),
      r.getAs[Long]("l_suppkey"), r.getAs[Double]("l_quantity").toLong,
      r.getAs[Double]("l_extendedprice"), r.getAs[Double]("l_discount"),
      r.getAs[LocalDateTime]("l_shipdate"), r.getAs[String]("l_returnflag"))
  }
  private lazy val orders: Map[Long, (Long, String, LocalDateTime, String, Double)] =
    rows("orders").map { r =>
      r.getAs[Long]("o_orderkey") ->
        ((r.getAs[Long]("o_custkey"), r.getAs[String]("o_orderpriority"),
          r.getAs[LocalDateTime]("o_orderdate"), r.getAs[String]("o_orderstatus"),
          r.getAs[Double]("o_totalprice")))
    }.toMap
  private lazy val part: Map[Long, (String, String, Int, Double, String)] =
    rows("part").map { r =>
      r.getAs[Long]("p_partkey") ->
        ((r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
          r.getAs[Int]("p_size"), r.getAs[Double]("p_retailprice"),
          r.getAs[String]("p_name")))
    }.toMap
  private lazy val supplier: Map[Long, (Int, String, Double)] =
    rows("supplier").map { r =>
      r.getAs[Long]("s_suppkey") ->
        ((r.getAs[Int]("s_nationkey"), r.getAs[String]("s_name"),
          r.getAs[Double]("s_acctbal")))
    }.toMap
  private lazy val nationRegion: Map[Int, (String, String)] = {
    val regions = rows("region").map(r =>
      r.getAs[Int]("r_regionkey") -> r.getAs[String]("r_name")).toMap
    rows("nation").map { r =>
      r.getAs[Int]("n_nationkey") ->
        ((r.getAs[String]("n_name"), regions(r.getAs[Int]("n_regionkey"))))
    }.toMap
  }
  private lazy val customer: Map[Long, (Int, Double)] =
    rows("customer").map { r =>
      r.getAs[Long]("c_custkey") ->
        ((r.getAs[Int]("c_nationkey"), r.getAs[Double]("c_acctbal")))
    }.toMap

  private def revCents(l: Li): Long = math.round(l.ext * (1 - l.disc) * 100)
  private def daysLate(l: Li): Long = {
    val od = orders(l.ok)._3
    val utc = java.time.ZoneOffset.UTC
    (l.ship.toEpochSecond(utc) - od.toEpochSecond(utc)) / 86400L
  }
  private def run(name: String) =
    QueryRegistry.byName(name).run(spark, sf("sf0.001")).collect()

  test("q12: late-line priority counts replay") {
    val y97 = lineitem.filter { l =>
      val s = l.ship.toString
      s >= "1997-01-01" && s < "1998-01-01" && daysLate(l) > 60
    }
    val exp = y97.groupBy(_.rflag).view.mapValues { ls =>
      val hi = ls.count(l => Set("1-URGENT", "2-HIGH")(orders(l.ok)._2))
      (hi.toLong, (ls.size - hi).toLong)
    }.toMap
    val got = run("q12_ship_priority")
    assert(got.length == exp.size)
    got.foreach { r =>
      val (hi, lo) = exp(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("high_line_count") == hi)
      assert(r.getAs[Long]("low_line_count") == lo)
    }
  }

  test("q13: distribution sums to the customer count") {
    val got = run("q13_customer_distribution")
    assert(got.map(_.getAs[Long]("custdist")).sum == customer.size)
    val totalOrders = got.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    assert(totalOrders == orders.values.count(_._2 != "1-URGENT"))
  }

  test("q15: the winner IS the argmax supplier") {
    val rev = lineitem.filter { l =>
      val s = l.ship.toString
      s >= "1996-07-01" && s < "1996-10-01"
    }.groupBy(_.sk).view.mapValues(_.map(revCents).sum).toMap
    val mx = rev.values.max
    val got = run("q15_top_supplier")
    assert(got.map(_.getAs[Long]("s_suppkey")).toSet ==
      rev.filter(_._2 == mx).keySet)
    got.foreach(r => assert(
      math.round(r.getAs[Double]("total_revenue") * 100) == mx))
  }

  test("q18: every emitted order clears the threshold, none missed") {
    val perOrder = lineitem.groupBy(_.ok).view.mapValues(_.map(_.qty).sum)
    val exp = perOrder.filter(_._2 > 300).keys.toSet
    val got = run("q18_large_volume")
    assert(got.map(_.getAs[Long]("o_orderkey")).toSet == exp)
    got.foreach(r => assert(r.getAs[Long]("sum_qty") ==
      perOrder(r.getAs[Long]("o_orderkey"))))
  }

  test("q2: each winner quotes its part's min EU unit cost") {
    val eu = supplier.filter { case (_, (nk, _, _)) =>
      nationRegion(nk)._2 == "EUROPE" }.keySet
    val offers = lineitem.filter(l => eu(l.sk))
      .groupBy(l => (l.pk, l.sk)).view.mapValues(ls =>
        ls.map(l => math.round(l.ext / l.qty * 100)).min).toMap
    val minPerPart = offers.groupBy(_._1._1).view
      .mapValues(_.values.min).toMap
    val got = run("q2_min_cost_supp")
    assert(got.nonEmpty)
    got.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      val cost = math.round(r.getAs[Double]("cost") * 100)
      assert(cost == minPerPart(pk))
      val (brand @ _, ptype, size, _, _) = part(pk)
      assert(ptype == "STANDARD" && size >= 25)
    }
  }

  test("q21: numwait replays the semi/anti stack") {
    val late = lineitem.filter(l =>
      orders(l.ok)._4 == "F" && daysLate(l) > 60)
    val suppsByOrder = lineitem.groupBy(_.ok).view
      .mapValues(_.map(_.sk).toSet).toMap
    val lateByOrder = late.groupBy(_.ok).view
      .mapValues(_.map(_.sk).toSet).toMap
    val waiting = late.filter { l =>
      (suppsByOrder(l.ok) - l.sk).nonEmpty &&
        (lateByOrder(l.ok) - l.sk).isEmpty
    }
    val exp = waiting.groupBy(l => supplier(l.sk)._2).view
      .mapValues(_.size.toLong).toMap
    val got = run("q21_waiting_suppliers")
    assert(got.map(r => r.getAs[String]("s_name") ->
      r.getAs[Long]("numwait")).toMap == exp)
  }

  test("q22: emitted customers are rich anti-joined strays") {
    val posBal = customer.values.map(_._2).filter(_ > 0)
    val sumCents = posBal.map(b => math.round(b * 100)).sum
    val nPos = posBal.size
    val recent = orders.values.filter(_._3.toString >= "2000-01-01")
      .map(_._1).toSet
    val exp = customer.filter { case (ck, (_, bal)) =>
      math.round(bal * 100) * nPos > sumCents && !recent(ck)
    }
    val expByNation = exp.groupBy(_._2._1).view.mapValues { cs =>
      (cs.size.toLong, cs.values.map(c => math.round(c._2 * 100)).sum)
    }.toMap
    val got = run("q22_global_sales")
    assert(got.map(r => r.getAs[Int]("cntrycode") ->
      ((r.getAs[Long]("numcust"),
        math.round(r.getAs[Double]("totacctbal") * 100)))).toMap ==
      expByNation)
  }

  test("q11: emitted parts clear 1.5x the average part mass, none missed") {
    val eu = supplier.filter { case (_, (nk, _, _)) =>
      nationRegion(nk)._2 == "EUROPE" }.keySet
    val perPart = lineitem.filter(l => eu(l.sk)).groupBy(_.pk).view
      .mapValues(_.map(l => math.round(l.ext * 100)).sum).toMap
    val total = perPart.values.sum
    val n = perPart.size
    val exp = perPart.filter { case (_, v) => v * 2 * n > total * 3 }
    val got = run("q11_important_stock")
    assert(got.map(r => r.getAs[Long]("p_partkey") ->
      math.round(r.getAs[Double]("value") * 100)).toMap == exp)
  }

  test("q20: winners shipped >1/5 of their bolt quantity in 1997") {
    val boltParts = part.collect {
      case (pk, (_, _, _, _, name)) if name.contains("bolt") => pk }.toSet
    val per = lineitem.filter(l => boltParts(l.pk)).groupBy(_.sk).view
      .mapValues { ls =>
        val q97 = ls.filter(_.ship.toString.startsWith("1997")).map(_.qty).sum
        (q97, ls.map(_.qty).sum)
      }.toMap
    val exp = per.collect { case (sk, (q97, all)) if q97 * 5 > all =>
      supplier(sk)._2 }.toSet
    val got = run("q20_excess_shippers")
    assert(got.map(_.getAs[String]("s_name")).toSet == exp)
  }

  test("q17 and q19 scalars replay") {
    // q17: small-quantity revenue on Brand#3 SMALL parts
    val pstats = lineitem.groupBy(_.pk).view
      .mapValues(ls => (ls.map(_.qty).sum, ls.size)).toMap
    val cents17 = lineitem.filter { l =>
      val (brand, ptype, _, _, _) = part(l.pk)
      val (sumq, cnt) = pstats(l.pk)
      brand == "Brand#3" && ptype == "SMALL" && l.qty * 5 * cnt < sumq
    }.map(l => math.round(l.ext * 100)).sum
    val got17 = run("q17_small_qty_revenue")
    assert(got17.length == 1)
    assert(got17.head.getAs[Double]("avg_yearly") ==
      BigDecimal(cents17 / 700.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // q19: disjunctive arms
    def arm(l: Li): Boolean = {
      val (brand, _, size, _, _) = part(l.pk)
      (brand == "Brand#1" && size >= 1 && size <= 10 && l.qty >= 1 && l.qty <= 20) ||
      (brand == "Brand#2" && size >= 5 && size <= 25 && l.qty >= 10 && l.qty <= 30) ||
      (brand == "Brand#3" && size >= 20 && size <= 50 && l.qty >= 20 && l.qty <= 40)
    }
    val cents19 = lineitem.filter(arm).map(revCents).sum
    val got19 = run("q19_discounted_revenue")
    assert(math.round(got19.head.getAs[Double]("revenue") * 100) == cents19)
  }

  test("q9 and q16 replay") {
    // q9: widget-family profit by supplier nation and year
    val exp9 = lineitem.filter(l => part(l.pk)._5.contains("widget"))
      .groupBy { l =>
        (nationRegion(supplier(l.sk)._1)._1,
          orders(l.ok)._3.toString.substring(0, 4).toInt)
      }.view.mapValues(_.map(l =>
        revCents(l) - math.round(part(l.pk)._4 * l.qty * 10)).sum).toMap
    val got9 = run("q9_product_profit")
    assert(got9.map(r => (r.getAs[String]("nation"), r.getAs[Int]("o_year")) ->
      math.round(r.getAs[Double]("sum_profit") * 100)).toMap == exp9)
    // q16: distinct suppliers per bucket after the denylist
    val deny = supplier.collect { case (sk, (_, _, bal)) if bal < 1000 => sk }.toSet
    val sizes = Set(1, 5, 10, 15, 20, 25, 30, 35)
    val exp16 = lineitem.map(l => (l.pk, l.sk)).distinct
      .filterNot { case (_, sk) => deny(sk) }
      .flatMap { case (pk, sk) =>
        val (brand, ptype, size, _, _) = part(pk)
        if (brand != "Brand#1" && ptype != "PROMO" && sizes(size))
          Some(((brand, ptype, size), sk))
        else None
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val got16 = run("q16_parts_suppliers")
    assert(got16.map(r =>
      (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Int]("p_size")) -> r.getAs[Long]("supplier_cnt")).toMap == exp16)
  }
}
