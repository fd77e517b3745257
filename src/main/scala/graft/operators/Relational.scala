package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory over the TPC-H-ish test tables — the
  * query surface a user of the reference would gain by switching to this
  * engine (the reference itself has none of these, SURVEY.md §2.4; they
  * are Spark built-ins, declared here so the driver's DuckDB oracle
  * pins their semantics).
  *
  * Scale notes (100 TB design rules, per query):
  *   - fact-table filters are plain `Column` predicates on scan output →
  *     Catalyst pushes them into the parquet reader (PushedFilters).
  *   - dimension joins (`region`/`nation`/`customer`/`supplier`/`part`)
  *     are explicitly `broadcast()` — at any SF the dims are orders of
  *     magnitude smaller than `lineitem`, so the big side never shuffles
  *     for them.
  *   - aggregations are partial+final hash aggregations (combiner built
  *     in); the only full shuffles are on the grouping keys.
  *   - doubles in outputs are rounded (2–4 dp) so DuckDB's and Spark's
  *     summation orders agree after rounding; every row set is given a
  *     deterministic total order for stable comparison.
  */
object Relational {

  /** TPC-H Q1: pricing summary. Single scan of lineitem, one shuffle on
    * (returnflag, linestatus) — 6 groups, partial agg does ~all work
    * map-side.
    */
  val q1 = Query(
    "q1_pricing_summary",
    (s, dir) => {
      Tables(s, dir).lineitem
        .filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(
            sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        round(avg(l_quantity), 4) AS avg_qty,
        round(avg(l_extendedprice), 4) AS avg_price,
        round(avg(l_discount), 4) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """),
    headline = true,
  )

  /** TPC-H Q3: top-10 unshipped orders by revenue. customer is broadcast
    * (1.5K..150K rows vs 6M+ lineitem at SF1+); orders⋈lineitem is the
    * one real shuffle join; top-k is a TakeOrderedAndProject (no global
    * sort materialization). Ties broken by l_orderkey for determinism.
    */
  val q3 = Query(
    "q3_shipping_priority",
    (s, dir) => {
      val t = Tables(s, dir)
      val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
      val ord  = t.orders.filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li   = t.lineitem.filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    oracle = Some("""
      SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING'
        AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY revenue DESC, l_orderkey LIMIT 10
    """),
    headline = true,
  )

  /** TPC-H Q5: local-supplier volume. Five joins; region→nation→
    * {customer,supplier} chain is all broadcast (dims), so lineitem is
    * shuffled once (against orders) and the rest stays map-side.
    */
  val q5 = Query(
    "q5_local_supplier_volume",
    (s, dir) => {
      val t = Tables(s, dir)
      val asia = t.region.filter(col("r_name") === "ASIA")
      val nat  = t.nation.join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      val ord = t.orders.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      t.lineitem
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.customer),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    oracle = Some("""
      SELECT n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name
    """),
    headline = true,
  )

  /** TPC-H Q4-like: order-priority count with EXISTS (left-semi join).
    * The semi join keeps only orderkeys — Spark plans a shuffled semi
    * join with the lineitem side aggregated away early.
    */
  val q4 = Query(
    "q4_order_priority",
    (s, dir) => {
      val t = Tables(s, dir)
      val ord = t.orders.filter(
        col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      val lateLines = t.lineitem
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey")).distinct()
      ord.join(lateLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    oracle = Some("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """),
  )

  /** TPC-H Q6-like: forecast revenue change — pure scan+filter+agg, the
    * pushdown showcase (all three predicates reach the parquet reader).
    */
  val q6 = Query(
    "q6_forecast_revenue",
    (s, dir) => {
      Tables(s, dir).lineitem
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.04, 0.07) && col("l_quantity") < 25)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },
    oracle = Some("""
      SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.04 AND 0.07 AND l_quantity < 25
    """),
    headline = true,
  )

  /** TPC-H Q7-like (volume shipping): revenue flow between two trading
    * nations by ship year — supplier nation and customer nation are
    * the SAME dimension joined twice under different roles, the
    * aliased-dimension pattern. Both nation joins broadcast (25-row
    * dim); lineitem⋈orders is the one big shuffle, exactly where TPC-H
    * puts it; the (nation, nation, year) rollup is bounded.
    */
  val q7 = Query(
    "q7_volume_shipping",
    (s, dir) => {
      val t = Tables(s, dir)
      val sn = t.nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
      val cn = t.nation.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))
      // revenue in exact integer cents: per-row round of a bit-exact
      // double, then an order-independent integer sum — the
      // cross-engine discipline a double sum at a rounding boundary
      // cannot give (q8 flipped by 0.01 at sf0.001 before this)
      val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
        .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
        .filter(((col("supp_nation") === "NATION_3") &&
          (col("cust_nation") === "NATION_2")) ||
          ((col("supp_nation") === "NATION_2") &&
            (col("cust_nation") === "NATION_3")))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(revCents) / 100.0, 2).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    oracle = Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
               / 100.0, 2) AS revenue
      FROM lineitem, orders, supplier, customer, nation n1, nation n2
      WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_3'))
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """),
  )

  /** TPC-H Q10-like (returned items): which customers returned the
    * most revenue in a quarter — the big-fact⋈big-dim reporting join.
    * lineitem filters to returnflag = 'R' and orders to the quarter
    * BEFORE the join (predicate pushdown does the real work); the
    * customer join is the canonical AQE-broadcast candidate, nation
    * always broadcasts, and the top-20 is a sort-limit
    * (TakeOrderedAndProject heaps), never a global sort.
    */
  val q10 = Query(
    "q10_returned_items",
    (s, dir) => {
      val t = Tables(s, dir)
      val ord = t.orders.filter(
        col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long") // exact-cents revenue, the q7 discipline
      t.lineitem.filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(round(sum(revCents) / 100.0, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey, c_name,
             round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
               / 100.0, 2) AS revenue,
             c_acctbal, n_name
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20
    """),
  )

  /** TPC-H Q8-like (national market share): within one part-type
    * market, the share of each order-year's revenue supplied by one
    * nation — the join-then-conditional-share shape Q8 exists to
    * test. The part filter broadcasts and prunes the fact FIRST
    * (market revenue only), supplier→nation broadcasts for the
    * numerator tag, and both sums of each year's share come out of
    * one aggregation pass (the q14 discipline).
    */
  val q8 = Query(
    "q8_market_share",
    (s, dir) => {
      val t = Tables(s, dir)
      val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long") // exact-cents revenue, the q7 discipline
      t.lineitem
        .join(broadcast(t.part.filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(when(col("n_name") === "NATION_2", revCents)
            .otherwise(lit(0L))).cast("double") / sum(revCents), 4)
            .as("mkt_share"),
          round(sum(revCents) / 100.0, 2).as("market_revenue"))
        .orderBy(col("o_year"))
    },
    oracle = Some("""
      SELECT year(o_orderdate) AS o_year,
             round(sum(CASE WHEN n_name = 'NATION_2'
                    THEN round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
                    ELSE 0 END)::DOUBLE /
                   sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT),
                   4) AS mkt_share,
             round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
               / 100.0, 2) AS market_revenue
      FROM lineitem, part, orders, supplier, nation
      WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        AND s_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1
    """),
  )

  /** TPC-H Q14-like (promo effect): the share of a month's revenue on
    * PROMO parts — a fact⋈dimension join feeding a conditional
    * aggregate ratio. The part side broadcasts; the ratio divides two
    * sums computed in ONE aggregation pass (no second scan); rounded
    * at 2 dp like every revenue number so cross-engine double
    * summation order cannot flip the gate.
    */
  val q14 = Query(
    "q14_promo_effect",
    (s, dir) => {
      val t = Tables(s, dir)
      val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long") // exact-cents revenue, the q7 discipline
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100) *
          sum(when(col("p_type") === "PROMO", revCents).otherwise(lit(0L)))
            .cast("double") /
          sum(revCents), 2).as("promo_pct"),
          round(sum(revCents) / 100.0, 2).as("total_revenue"))
    },
    oracle = Some("""
      SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                     THEN round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
                     ELSE 0 END)::DOUBLE /
                   sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT),
                   2) AS promo_pct,
             round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
               / 100.0, 2) AS total_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """),
  )

  /** ROLLUP over returnflag × linestatus (grouping-sets family). NULL
    * subtotal keys are COALESCE'd to 'ALL' so the two engines hash
    * identical values.
    */
  val qRollup = Query(
    "q_rollup",
    (s, dir) => {
      Tables(s, dir).lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    },
    oracle = Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, round(sum(l_quantity), 2) AS qty
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus
    """),
  )

  /** Arbitrary GROUPING SETS (the general form ROLLUP/CUBE specialize)
    * via the Spark 4 `Dataset.groupingSets` API: detail, per-priority
    * subtotal, and grand total in one pass — Catalyst plans a single
    * Expand + aggregation, not three scans.
    */
  val qGroupingSets = Query(
    "q_grouping_sets",
    (s, dir) => {
      Tables(s, dir).orders
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("total"))
        .orderBy(col("priority"), col("status"))
    },
    oracle = Some("""
      SELECT coalesce(o_orderpriority, 'ALL') AS priority,
             coalesce(o_orderstatus, 'ALL') AS status,
             count(*) AS n, round(sum(o_totalprice), 2) AS total
      FROM orders
      GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                              (o_orderpriority), ())
      ORDER BY priority, status
    """),
  )

  /** CUBE over returnflag × linestatus — all four grouping sets. */
  val qCube = Query(
    "q_cube",
    (s, dir) => {
      Tables(s, dir).lineitem
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("total"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("total"))
        .orderBy(col("returnflag"), col("linestatus"))
    },
    oracle = Some("""
      SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             coalesce(l_linestatus, 'ALL') AS linestatus,
             count(*) AS n, round(sum(l_extendedprice), 2) AS total
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus
    """),
  )

  /** Window ranking: top-3 parts by retail price per brand
    * (row_number, deterministic tiebreak on p_partkey).
    */
  val qWindowTopk = Query(
    "q_window_topk",
    (s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables(s, dir).part
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("p_brand"), col("rk"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy(col("p_brand"), col("rk"))
    },
    oracle = Some("""
      SELECT p_brand, rk, p_partkey, round(p_retailprice, 2) AS price
      FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          row_number() OVER (PARTITION BY p_brand
                             ORDER BY p_retailprice DESC, p_partkey) AS rk
        FROM part)
      WHERE rk <= 3 ORDER BY p_brand, rk
    """),
  )

  /** Window frames: running revenue + previous-order delta per customer
    * (sum over unbounded-preceding frame, lag). Deterministic order
    * within customer via (o_orderdate, o_orderkey).
    */
  val qWindowRunning = Query(
    "q_window_running",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables(s, dir).orders
        .filter(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
            .as("running_total"),
          round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2)
            .as("prev_price"),
        )
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_custkey, o_orderkey,
        round(sum(o_totalprice) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        round(coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev_price
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey
    """),
  )

  /** Window-function breadth: dense_rank, ntile, lead, first over one
    * shared (nation, balance) ordering — Spark plans a single Window
    * exec for all four.
    */
  val qWindowMisc = Query(
    "q_window_misc",
    (s, dir) => {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      Tables(s, dir).supplier
        .select(
          col("s_suppkey"), col("s_nationkey"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"),
          coalesce(lead(col("s_suppkey"), 1).over(w), lit(-1L)).as("next_supp"),
          first(col("s_suppkey")).over(w).as("richest"))
        .orderBy(col("s_suppkey"))
    },
    oracle = Some("""
      SELECT s_suppkey, s_nationkey,
        dense_rank() OVER w AS drk,
        ntile(4) OVER w AS quartile,
        coalesce(lead(s_suppkey, 1) OVER w, -1) AS next_supp,
        first_value(s_suppkey) OVER w AS richest
      FROM supplier
      WINDOW w AS (PARTITION BY s_nationkey
                   ORDER BY s_acctbal DESC, s_suppkey)
      ORDER BY s_suppkey
    """),
  )

  /** Date/time function surface: calendar rollup by (year, quarter)
    * with month spans — engine-portable extractions only (dayofweek
    * numbering differs between engines and is deliberately avoided).
    */
  val qDatetime = Query(
    "q_datetime",
    (s, dir) => {
      Tables(s, dir).orders
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"))
        .agg(
          count(lit(1)).as("n"),
          count_distinct(month(col("o_orderdate"))).as("n_months"),
          min(dayofmonth(col("o_orderdate"))).as("first_dom"))
        .orderBy(col("yr"), col("qtr"))
    },
    oracle = Some("""
      SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
        count(*) AS n,
        count(DISTINCT month(o_orderdate)) AS n_months,
        min(day(o_orderdate)) AS first_dom
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """),
  )

  /** Scalar string-function surface (upper/lower/trim/pad/replace/
    * substring/concat/length/levenshtein) — classic Levenshtein is
    * engine-portable, so even edit distance is value-oracled.
    */
  val qStringFuncs = Query(
    "q_string_funcs",
    (s, dir) => {
      Tables(s, dir).part
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          lower(col("p_type")).as("type_lc"),
          trim(col("p_name")).as("name_trim"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
          regexp_replace(col("p_brand"), "#", "-").as("brand_dash"),
          substring(col("p_type"), 1, 5).as("type_head"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"),
          levenshtein(col("p_brand"), lit("Brand#1")).as("brand_dist"))
        .orderBy(col("p_partkey"))
    },
    oracle = Some("""
      SELECT p_partkey,
        upper(p_brand) AS brand_uc, lower(p_type) AS type_lc,
        trim(p_name) AS name_trim,
        lpad(p_partkey::VARCHAR, 8, '0') AS key_pad,
        replace(p_brand, '#', '-') AS brand_dash,
        substr(p_type, 1, 5) AS type_head,
        p_brand || '/' || p_type AS brand_type,
        length(p_name) AS name_len,
        levenshtein(p_brand, 'Brand#1') AS brand_dist
      FROM part WHERE p_partkey < 500 ORDER BY p_partkey
    """),
  )

  /** Exact distinct counts (the reference has no distinct at all). */
  val qDistinct = Query(
    "q_distinct",
    (s, dir) => {
      Tables(s, dir).lineitem.agg(
        count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"),
        count_distinct(col("l_orderkey")).as("n_orders"),
      )
    },
    oracle = Some("""
      SELECT count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem
    """),
  )

  /** Set operations: customers ordering in both 1996 and 1997
    * (INTERSECT) minus those also ordering in 1998 (EXCEPT).
    */
  val qSetOps = Query(
    "q_set_ops",
    (s, dir) => {
      val o = Tables(s, dir).orders
      def buyersIn(y: Int) =
        o.filter(year(col("o_orderdate")) === y).select(col("o_custkey")).distinct()
      buyersIn(1996).intersect(buyersIn(1997)).except(buyersIn(1998))
        .orderBy(col("o_custkey"))
    },
    oracle = Some("""
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      ORDER BY o_custkey
    """),
  )

  /** Anti join: customers with no 1995 orders (NOT EXISTS). */
  val qAntiJoin = Query(
    "q_anti_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val o95 = t.orders.filter(year(col("o_orderdate")) === 1995)
      t.customer
        .join(o95, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    oracle = Some("""
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND year(o_orderdate) = 1995)
      ORDER BY c_custkey
    """),
  )

  /** Scalar subquery: orders priced ≥ 1.5× the global average. */
  val qSubquery = Query(
    "q_scalar_subquery",
    (s, dir) => {
      val o   = Tables(s, dir).orders
      val avgP = o.agg(avg(col("o_totalprice")).as("a"))
      o.join(broadcast(avgP))
        .filter(col("o_totalprice") >= col("a") * 1.5)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderkey"))
    },
    oracle = Some("""
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM orders
      WHERE o_totalprice >= (SELECT avg(o_totalprice) FROM orders) * 1.5
      ORDER BY o_orderkey
    """),
  )

  /** GROUP BY + HAVING: nations whose suppliers carry above-average
    * account balance mass.
    */
  val qHaving = Query(
    "q_having",
    (s, dir) => {
      val t = Tables(s, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("s_acctbal")), 2).as("total_bal"),
          count(lit(1)).as("n_supp"))
        .filter(col("n_supp") >= 3)
        .orderBy(col("n_name"))
    },
    oracle = Some("""
      SELECT n_name, round(sum(s_acctbal), 2) AS total_bal, count(*) AS n_supp
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name HAVING count(*) >= 3 ORDER BY n_name
    """),
  )

  /** Full outer join: per-customer 1996 vs 1997 spend — customers
    * active in only one year appear with a NULL-coalesced zero on the
    * other side.
    */
  val qFullOuter = Query(
    "q_full_outer",
    (s, dir) => {
      val o = Tables(s, dir).orders
      def spend(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as(s"ck$y"))
        .agg(round(sum(col("o_totalprice")), 2).as(s"spend$y"))
      spend(1996).join(spend(1997),
        col("ck1996") === col("ck1997"), "full_outer")
        .select(
          coalesce(col("ck1996"), col("ck1997")).as("custkey"),
          coalesce(col("spend1996"), lit(0.0)).as("spend_1996"),
          coalesce(col("spend1997"), lit(0.0)).as("spend_1997"))
        .orderBy(col("custkey"))
    },
    oracle = Some("""
      WITH s96 AS (SELECT o_custkey AS ck, round(sum(o_totalprice), 2) AS spend
                   FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
           s97 AS (SELECT o_custkey AS ck, round(sum(o_totalprice), 2) AS spend
                   FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1)
      SELECT coalesce(s96.ck, s97.ck) AS custkey,
             coalesce(s96.spend, 0.0) AS spend_1996,
             coalesce(s97.spend, 0.0) AS spend_1997
      FROM s96 FULL OUTER JOIN s97 ON s96.ck = s97.ck
      ORDER BY custkey
    """),
  )

  /** Correlated subquery (TPC-H Q2 shape): parts priced at their
    * brand's minimum. Spark: window-min composition (one shuffle on
    * brand) — the decorrelation Catalyst itself would do.
    */
  val qCorrelated = Query(
    "q_correlated_min",
    (s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
      Tables(s, dir).part
        .withColumn("min_price", min(col("p_retailprice")).over(w))
        .filter(col("p_retailprice") === col("min_price"))
        .select(col("p_brand"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy(col("p_brand"), col("p_partkey"))
    },
    oracle = Some("""
      SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
      FROM part p
      WHERE p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                             WHERE p2.p_brand = p.p_brand)
      ORDER BY p_brand, p_partkey
    """),
  )

  /** Pivot via conditional aggregation (engine-portable pivot shape):
    * revenue by linestatus pivoted across return flags.
    */
  val qPivot = Query(
    "q_pivot",
    (s, dir) => {
      val li  = Tables(s, dir).lineitem
      def rev(flag: String) = round(sum(
        when(col("l_returnflag") === flag,
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(0.0)), 2)
      li.groupBy(col("l_linestatus"))
        .agg(rev("A").as("rev_a"), rev("N").as("rev_n"), rev("R").as("rev_r"))
        .orderBy(col("l_linestatus"))
    },
    oracle = Some("""
      SELECT l_linestatus,
        round(sum(CASE WHEN l_returnflag = 'A'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_a,
        round(sum(CASE WHEN l_returnflag = 'N'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_n,
        round(sum(CASE WHEN l_returnflag = 'R'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS rev_r
      FROM lineitem GROUP BY 1 ORDER BY 1
    """),
  )

  /** The inverse reshape of [[qPivot]]: melt the wide per-flag revenue
    * columns back to long (l_linestatus, returnflag, revenue) rows via
    * `Dataset.unpivot` — Catalyst's `Expand` node, a map-side row
    * multiplier with NO shuffle of its own. The only exchange in the
    * plan is the partial-agg shuffle that builds the wide input; the
    * melt then triples six rows. At 100 TB the same holds structurally:
    * unpivot cost is #rows × #value-columns emitted locally inside the
    * scan/agg stage, never a join or an exchange — the reshape every
    * feature-table→long-format training-data export needs. Value
    * columns are named `A`/`N`/`R` so the variable column carries the
    * return flag directly; the oracle reshapes with a UNION ALL (the
    * portable UNPIVOT spelling) over the identical wide CTE.
    */
  val qUnpivot = Query(
    "q_unpivot",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      def rev(flag: String) = round(sum(
        when(col("l_returnflag") === flag,
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(0.0)), 2)
      li.groupBy(col("l_linestatus"))
        .agg(rev("A").as("A"), rev("N").as("N"), rev("R").as("R"))
        .unpivot(
          ids = Array(col("l_linestatus")),
          values = Array(col("A"), col("N"), col("R")),
          variableColumnName = "returnflag",
          valueColumnName = "revenue")
        .orderBy(col("l_linestatus"), col("returnflag"))
    },
    oracle = Some("""
      WITH wide AS (
        SELECT l_linestatus,
          round(sum(CASE WHEN l_returnflag = 'A'
            THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS a,
          round(sum(CASE WHEN l_returnflag = 'N'
            THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS n,
          round(sum(CASE WHEN l_returnflag = 'R'
            THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS r
        FROM lineitem GROUP BY 1)
      SELECT l_linestatus, returnflag, revenue FROM (
        SELECT l_linestatus, 'A' AS returnflag, a AS revenue FROM wide
        UNION ALL
        SELECT l_linestatus, 'N' AS returnflag, n AS revenue FROM wide
        UNION ALL
        SELECT l_linestatus, 'R' AS returnflag, r AS revenue FROM wide)
      ORDER BY l_linestatus, returnflag
    """),
  )

  /** HLL approximate distinct counts, oracle-checked via error bounds.
    * The sketch value itself can't cross engines (DuckDB's approx
    * sketch differs by construction), so the query outputs the exact
    * counts plus boolean `*_within_5pct` flags asserting the HLL++
    * estimate lands within 2×rsd (rsd≈5%, so 10%; the rsd is a std
    * dev, not a bound — 1× is exceeded at small SFs); DuckDB recomputes
    * the exact counts and asserts the flags are true.
    */
  val qApproxDistinct = Query(
    "q_approx_distinct",
    (s, dir) => {
      // The approx (HLL) and exact distinct aggregates are computed in
      // SEPARATE single-row aggregations joined at the end: mixing them
      // in one agg drags the ~KB HLL buffers through the distinct-
      // rewrite's expand+regroup, merging one sketch per distinct key
      // group (measured 2× slower than the sum of the split parts).
      val li = Tables(s, dir).lineitem
        .select(col("l_partkey"), col("l_orderkey"))
      val exact = li.agg(
        count_distinct(col("l_partkey")).as("exact_parts"),
        count_distinct(col("l_orderkey")).as("exact_orders"))
      val approx = li.agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      exact.crossJoin(approx)
        .select(
          col("exact_parts"),
          col("exact_orders"),
          // the interval itself rides in-row (integer-exact: ⌊10%⌋),
          // so the gate pins the guarantee's WIDTH, not just a flag
          expr("exact_parts div 10").as("parts_max_err"),
          expr("exact_orders div 10").as("orders_max_err"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.10).as("parts_within_10pct"),
          (abs(col("approx_orders") - col("exact_orders")) <=
            col("exact_orders") * 0.10).as("orders_within_10pct"),
        )
    },
    oracle = Some("""
      SELECT
        count(DISTINCT l_partkey)  AS exact_parts,
        count(DISTINCT l_orderkey) AS exact_orders,
        count(DISTINCT l_partkey)  // 10 AS parts_max_err,
        count(DISTINCT l_orderkey) // 10 AS orders_max_err,
        true AS parts_within_10pct,
        true AS orders_within_10pct
      FROM lineitem
    """),
  )

  /** Mergeable quantile SKETCH, oracle-checked via its rank guarantee —
    * the bounded-memory counterpart of [[qPercentiles]]' exact rank
    * method (the same split [[qApproxDistinct]] makes for distinct
    * counts). `percentile_approx` runs Spark's Greenwald–Khanna-style
    * summary as a partial-aggregable sketch: O(accuracy·log n) memory
    * per partition regardless of group size, merged map-side — at
    * 100 TB it is one scan + a constant-size merge, where any exact
    * method must either buffer values (banned by the plan lint) or
    * take a second coordinated pass.
    *
    * The sketch value itself can't cross engines, so the contract under
    * the gate is the GUARANTEE, not the value: for each p the returned
    * value's rank interval (count<, count≤] must intersect
    * [p−1/acc, p+1/acc]. Both rank fractions come from one conditional
    * aggregation over the base crossed with the 1-row sketch aggregate
    * (the sanctioned broadcast 1-row cross); DuckDB recomputes the
    * exact count and asserts the flags.
    */
  val qApproxQuantiles = Query(
    "q_approx_quantiles",
    (s, dir) => {
      val acc = 1000
      val eps = 1.0 / acc + 1e-9
      val li = Tables(s, dir).lineitem.select(col("l_extendedprice").as("x"))
      val sk = li.agg(
        percentile_approx(col("x"), lit(0.5), lit(acc)).as("a50"),
        percentile_approx(col("x"), lit(0.9), lit(acc)).as("a90"),
        percentile_approx(col("x"), lit(0.99), lit(acc)).as("a99"),
        count(lit(1)).as("n"))
      def ok(ap: String, p: Double) = {
        val lt = sum((col("x") < col(ap)).cast("long")) / first(col("n"))
        val le = sum((col("x") <= col(ap)).cast("long")) / first(col("n"))
        (lt <= p + eps) && (le >= p - eps)
      }
      li.crossJoin(broadcast(sk))
        .agg(
          first(col("n")).as("n"),
          ok("a50", 0.5).as("p50_ok"),
          ok("a90", 0.9).as("p90_ok"),
          ok("a99", 0.99).as("p99_ok"))
    },
    oracle = Some("""
      SELECT count(*) AS n, true AS p50_ok, true AS p90_ok, true AS p99_ok
      FROM lineitem
    """),
  )

  /** Column profiling sweep (data-quality pass a pipeline runs before
    * training): per-column null counts, distincts, ranges — one scan,
    * one partial-agg shuffle.
    */
  val qProfile = Query(
    "q_profile",
    (s, dir) => {
      Tables(s, dir).orders.agg(
        count(lit(1)).as("n_rows"),
        sum(col("o_custkey").isNull.cast("long")).as("null_custkey"),
        count_distinct(col("o_orderstatus")).as("n_status"),
        count_distinct(col("o_orderpriority")).as("n_priority"),
        round(min(col("o_totalprice")), 2).as("min_price"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"),
      )
    },
    oracle = Some("""
      SELECT count(*) AS n_rows,
        CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
        count(DISTINCT o_orderstatus) AS n_status,
        count(DISTINCT o_orderpriority) AS n_priority,
        round(min(o_totalprice), 2) AS min_price,
        round(max(o_totalprice), 2) AS max_price,
        strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
        strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
      FROM orders
    """),
  )

  /** Exact interpolated percentiles per order status via the
    * DISTRIBUTED RANK METHOD (matches DuckDB `quantile_cont`: the
    * (n−1)·p linear interpolation, rounded for float parity).
    *
    * Spark's exact `percentile` aggregate materializes every group
    * value in ONE aggregation buffer — grouped by a 3-value status
    * column, each buffer holds ~1/3 of all orders, the same
    * unbounded-state class the registry lint bans for collect_set, and
    * an OOM at 100× scale. Instead: range-partition on (group, value)
    * and sort within partitions — each group occupies a contiguous run
    * of partitions in global value order — then (1) collect the tiny
    * per-(partition, group) row counts, (2) the driver prefix-sums them
    * into offsets, locates which partition holds each target rank
    * ⌊(n−1)p⌋ / ⌈(n−1)p⌉, and broadcasts ≤ 6 lookups per group, (3) a
    * second per-partition pass emits ONLY the matched rows. No task
    * ever buffers a group; driver state is O(partitions × groups + 6 ×
    * groups) — the declared contract is a low-cardinality grouping key,
    * the same bound every GROUP BY on status enjoys. Both passes share
    * one RDD instance, so the range bounds are sampled once and cannot
    * diverge between the count job and the fetch job. Interpolation
    * uses Spark's own formula ((hi−r)·v_lo + (r−lo)·v_hi) for bit
    * parity with the `percentile` aggregate it replaces.
    *
    * The per-partition target map is BOUNDED (≤ 6 ranks × groups
    * entries) so it ships in the task closure directly — no broadcast
    * variable whose lifecycle would outlive the query.
    */
  private[graft] def percentileSorted(s: SparkSession, dir: String): DataFrame = {
    val nPart = s.sessionState.conf.numShufflePartitions
    Tables(s, dir).orders
      .filter(col("o_totalprice").isNotNull)
      .select(col("o_orderstatus").as("g"),
        col("o_totalprice").cast("double").as("v"))
      .repartitionByRange(nPart, col("g"), col("v"))
      .sortWithinPartitions(col("g"), col("v"))
  }

  /** Pass 1 of the rank method: per-(partition, group) row counts —
    * the bounded driver collect (≤ partitions × groups rows).
    */
  private[graft] def percentileCounts(
      rows: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row])
      : Array[((Int, String), Long)] =
    rows.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { r => val g = r.getString(0); m.update(g, m.getOrElse(g, 0L) + 1L) }
      m.iterator.map { case (g, c) => ((pid, g), c) }
    }.collect()

  val qPercentiles = Query(
    "q_percentiles",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
      val ps = Seq(0.5, 0.9, 0.99)
      val sorted = percentileSorted(s, dir)
      val rows = sorted.rdd // shared by both jobs — one shuffle, one set of range bounds
      val counts = percentileCounts(rows)
      val totals: Map[String, Long] =
        counts.groupBy(_._1._2).map { case (g, a) => g -> a.map(_._2).sum }
      // global 0-based ranks needed per group: lo/hi of each percentile
      val wanted: Map[String, Seq[Long]] = totals.map { case (g, n) =>
        g -> ps.flatMap { p =>
          val r = (n - 1) * p
          Seq(math.floor(r).toLong, math.ceil(r).toLong)
        }.distinct
      }
      // route each (group, rank) to the partition whose offset run holds it
      val perPartTargets: Map[Int, Map[String, Map[Long, Long]]] = {
        val acc = scala.collection.mutable.HashMap.empty[(Int, String), scala.collection.mutable.HashMap[Long, Long]]
        counts.groupBy(_._1._2).foreach { case (g, arr) =>
          var offset = 0L
          arr.sortBy(_._1._1).foreach { case ((pid, _), c) =>
            wanted(g).foreach { rank =>
              if (rank >= offset && rank < offset + c) {
                acc.getOrElseUpdate((pid, g), scala.collection.mutable.HashMap.empty)
                  .update(rank - offset, rank)
              }
            }
            offset += c
          }
        }
        acc.toSeq.groupBy(_._1._1).map { case (pid, entries) =>
          pid -> entries.map { case ((_, g), m) => g -> m.toMap }.toMap
        }
      }
      val picked: Array[((String, Long), Double)] =
        rows.mapPartitionsWithIndex { (pid, it) =>
          perPartTargets.get(pid) match {
            case None => Iterator.empty
            case Some(byG) =>
              val local = scala.collection.mutable.HashMap.empty[String, Long]
              it.flatMap { r =>
                val g = r.getString(0)
                val i = local.getOrElse(g, 0L)
                local.update(g, i + 1L)
                byG.get(g).flatMap(_.get(i))
                  .map(globalRank => ((g, globalRank), r.getDouble(1)))
              }
          }
        }.collect()
      val valueAt = picked.toMap
      def interp(g: String, p: Double): Double = {
        val r  = (totals(g) - 1) * p
        val lo = math.floor(r).toLong
        val hi = math.ceil(r).toLong
        if (lo == hi) valueAt((g, lo))
        else (hi - r) * valueAt((g, lo)) + (r - lo) * valueAt((g, hi))
      }
      val out = totals.keys.toSeq.sorted.map { g =>
        Row(g, interp(g, 0.5), interp(g, 0.9), interp(g, 0.99))
      }
      val schema = StructType(Seq(
        StructField("o_orderstatus", StringType),
        StructField("p50", DoubleType),
        StructField("p90", DoubleType),
        StructField("p99", DoubleType)))
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema)
        .select(col("o_orderstatus"),
          round(col("p50"), 4).as("p50"),
          round(col("p90"), 4).as("p90"),
          round(col("p99"), 4).as("p99"))
        .orderBy(col("o_orderstatus"))
    },
    eagerPlan = Some(percentileSorted),
    oracle = Some("""
      SELECT o_orderstatus,
        round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        round(quantile_cont(o_totalprice, 0.99), 4) AS p99
      FROM orders GROUP BY 1 ORDER BY 1
    """),
  )

  /** Fixed-width histogram of lineitem extended price — the data-
    * profiling op next to [[qProfile]]'s min/max summary: 10 buckets of
    * 11,000 over [0, 110,000) (covers TPC-H's ~[900, 105,000) price
    * domain), each with its bounds, row count, and share. Bucketing is
    * plain `floor(x / width)` integer arithmetic — deterministic on
    * both engines, no percentile/statistics state — and the rollup is
    * counts only, so results are shuffle-order independent.
    *
    * Scale shape: the bucket id computes in the scan projection; one
    * partial-agg exchange of ≤ 10 groups. The 1-row total for shares
    * rides a broadcast crossJoin (the allowed 1-row-aggregate form).
    */
  val qHistogram = Query(
    "q_histogram",
    (s, dir) => {
      val width = 11000.0
      val b = floor(col("l_extendedprice").cast("double") / width)
        .cast("long")
      val g = Tables(s, dir).lineitem
        .select(b.as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n"))
      // total via a whole-frame window over the ≤10-row aggregate —
      // bounded by the bucket count, no join (the tx_mix_rebalance shape)
      val total = sum(col("n")).over(Window.partitionBy()).cast("double")
      g.select(
          col("bucket"),
          (col("bucket") * width).as("lo"),
          ((col("bucket") + 1) * width).as("hi"),
          col("n"),
          round(col("n") / total, 4).as("share"))
        .orderBy(col("bucket"))
    },
    oracle = Some("""
      WITH g AS (
        SELECT CAST(floor(l_extendedprice::DOUBLE / 11000.0) AS BIGINT)
                 AS bucket,
               count(*) AS n
        FROM lineitem GROUP BY 1
      ), tot AS (SELECT sum(n)::DOUBLE AS total FROM g)
      SELECT bucket,
        -- ::DOUBLE: DuckDB types `BIGINT * 11000.0` as DECIMAL(25,1),
        -- which pandas can't materialize faithfully (oracle_check's
        -- pandas-safe scan); Spark's side is a double product
        (bucket * 11000.0)::DOUBLE AS lo,
        ((bucket + 1) * 11000.0)::DOUBLE AS hi,
        n::BIGINT AS n, round(n / total, 4) AS share
      FROM g, tot ORDER BY bucket
    """),
  )

  /** Z-order (Morton) multi-dimensional clustering audit — the
    * data-skipping layout op for the lake: interleave the bits of two
    * query dimensions (customer, order day) so that CONTIGUOUS ranges
    * of the z-value map to small rectangles in (customer × day) space,
    * then report per-z-range occupancy and the min/max envelope of
    * BOTH dimensions. A single-dimension sort bounds one dimension per
    * file and leaves the other spanning the full domain; the z-curve
    * bounds both at once (~255 of 1,500 customers AND ~255 of ~2,400
    * days per 2^16 z-range at sf0.01), which is what lets a scan over
    * files laid out in z-order prune on EITHER predicate — see
    * [[ZOrder.writeZOrdered]] for the write side and ZOrderSpec for
    * the measured skipping effect. The bit-spread is the classic
    * shift-or-mask Morton spread, identical integer ops on both
    * engines, so the oracle is exact.
    */
  val qZorderLayout = Query(
    "q_zorder_layout",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val day = datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
      val z = ZOrder.zval2(col("o_custkey"), day)
      o.select(col("o_custkey"), col("o_orderdate"), z.as("zval"))
        .groupBy(shiftright(col("zval"), 16).as("bucket"))
        .agg(
          count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_ck"),
          max(col("o_custkey")).as("max_ck"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_d"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_d"))
        .orderBy(col("bucket"))
    },
    oracle = Some(s"""
      WITH z AS (
        SELECT o_custkey, o_orderdate,
          (${ZOrder.spread16Sql("o_custkey")} |
           (${ZOrder.spread16Sql(
      "datediff('day', DATE '1992-01-01', o_orderdate)")} << 1)) AS zval
        FROM orders)
      SELECT (zval >> 16) AS bucket, count(*) AS n,
        min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
        strftime(min(o_orderdate), '%Y-%m-%d') AS min_d,
        strftime(max(o_orderdate), '%Y-%m-%d') AS max_d
      FROM z GROUP BY 1 ORDER BY 1
    """),
  )

  /** Top-3 orders per customer through the CUSTOM [[graft.plans.TopKPerGroup]]
    * operator (logical node + strategy + two-phase physical heaps) —
    * same declared semantics as the `row_number ≤ k` window pattern
    * ([[qWindowTopk]] et al.) but without shuffling or sorting
    * non-survivors: each scan partition forwards at most k rows per
    * group, the exchange moves only those, the final heaps merge per
    * group. The rank column is assigned AFTER the operator by a window
    * over ≤ k rows per group — partitioned, bounded by construction.
    * Ordering (o_totalprice DESC, o_orderkey ASC) is total, so the
    * result is deterministic and the oracle exact; TopKSpec proves
    * row-parity with the window formulation and pins the plan (no
    * WindowExec / SortExec below the final operator).
    */
  val qGroupTopk = Query(
    "q_group_topk",
    (s, dir) => {
      val top = graft.plans.TopK.perGroup(
        Tables(s, dir).orders,
        Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      top.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rk", row_number().over(w))
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    },
    oracle = Some("""
      SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders) WHERE rk <= 3
      ORDER BY o_custkey, rk
    """),
  )

  /** 2-D skyline (Pareto frontier): the parts no other part beats on
    * BOTH price (lower-is-better) and size (higher-is-better) — the
    * multi-criteria shortlist operator (Börzsönyi et al., ICDE'01
    * "The Skyline Operator"). A part survives iff no part is
    * ≤-price AND ≥-size with at least one strict.
    *
    * The naive formulation is a quadratic NOT EXISTS self-join (the
    * oracle states it that way). The engine instead decomposes by the
    * sort dimension, all-distributed:
    *   1. price-level aggregate: `grp_max(price) = max(size)` — a plain
    *      groupBy (same-price dominance needs only this: a row survives
    *      its own price level iff its size equals the level max; exact
    *      ties dominate nobody, so ALL rows at the level max survive);
    *   2. strictly-cheaper dominance needs the PREFIX max of grp_max in
    *      price order, computed two-level so no corpus-wide window ever
    *      plans: bucket the level table by VALUE (a deterministic
    *      min/max-scaled bucket id — not spark_partition_id over a
    *      repartitionByRange, whose sampled bounds could differ between
    *      the two consuming subplans if the exchange were not reused),
    *      running max per bucket (window PARTITIONED by bucket id),
    *      then a per-bucket max table — ≤ bucket-count rows, the
    *      bounded-window class — prefix-maxed across buckets and
    *      joined back;
    *   3. one equi-join of the base against its level verdicts.
    * At 100 TB: two shuffles of the (distinct-price)-sized level table
    * + one key-partitioned join — no window or sort over the data, no
    * quadratic pair expansion. Same protocol shape as q_percentiles'
    * rank method, but expressed fully declaratively (the bounded
    * per-bucket table stays in-plan; nothing collects). Value buckets
    * can skew with the price distribution — a performance, never a
    * correctness, concern (each bucket's window is still
    * level-cardinality-bounded). The min/max bounds ride in as the
    * sanctioned broadcast 1-row cross.
    */
  val qSkyline = Query(
    "q_skyline",
    (s, dir) => {
      val p = Tables(s, dir).part
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      val nB = 32
      val lvl = p.groupBy(col("p_retailprice"))
        .agg(max(col("p_size")).as("grp_max"))
      val bounds = lvl.agg(min(col("p_retailprice")).as("lo"),
        max(col("p_retailprice")).as("hi"))
      // deterministic, price-monotone bucket id: floor of the min/max-
      // scaled position, clamped into [0, nB)
      val bucketed = lvl.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          when(col("hi") === col("lo"), lit(0)).otherwise(
            least(floor((col("p_retailprice") - col("lo")) /
              (col("hi") - col("lo")) * nB), lit(nB - 1))).cast("int"))
        .select(col("p_retailprice"), col("grp_max"), col("bucket"))
      val wLocal = Window.partitionBy(col("bucket"))
        .orderBy(col("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = bucketed
        .withColumn("local_prev", max(col("grp_max")).over(wLocal))
      val wBucket = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // ≤ nB rows from here on — bounded by construction
      val bucketPrev = bucketed.groupBy(col("bucket"))
        .agg(max(col("grp_max")).as("pmax"))
        .withColumn("bucket_prev", max(col("pmax")).over(wBucket))
        .select(col("bucket"), col("bucket_prev"))
      val verdicts = local.join(broadcast(bucketPrev), "bucket")
        .withColumn("prev_max", greatest(col("local_prev"), col("bucket_prev")))
        .select(col("p_retailprice"), col("grp_max"), col("prev_max"))
      p.join(verdicts, "p_retailprice")
        .filter(col("p_size") === col("grp_max") &&
          (col("prev_max").isNull || col("p_size") > col("prev_max")))
        .select(col("p_partkey"),
          round(col("p_retailprice"), 2).as("p_retailprice"), col("p_size"))
        .orderBy(col("p_partkey"))
    },
    oracle = Some("""
      SELECT p_partkey, round(p_retailprice, 2) AS p_retailprice, p_size
      FROM part a
      WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      ORDER BY p_partkey
    """),
  )

  // ---------------------------------------------------------------------
  // TPC-H completion (round 9): the 13 remaining query SHAPES, adapted to
  // this testdata's reduced schema (no partsupp table, no comment/phone/
  // container/shipmode columns, no commit/receipt dates — TESTDATA.md).
  // Each keeps the signature plan shape the original exists to test; the
  // substituted predicates are noted per query. Money follows the q7
  // exact-cents discipline; quantities are integral in this data
  // (TestdataSchemaSpec) so quantity sums are exact longs.
  // ---------------------------------------------------------------------

  /** TPC-H Q2-like (min-cost supplier): for each qualifying part, the
    * EUROPE supplier quoting the minimum unit cost — the
    * correlated-min shape, decorrelated as aggregate-then-self-join on
    * the correlation key (partkey), exactly how Catalyst rewrites the
    * subquery. Without partsupp, a (part, supplier) quote is the
    * minimum observed unit price round(100·extendedprice/quantity)
    * over their lineitems — IEEE division is correctly rounded, so the
    * cents value is bit-identical cross-engine and the min/equality
    * land on exact integers. Supplier/nation/region dims broadcast;
    * the only big shuffle is the offers aggregation on (part, supp).
    */
  val q2 = Query(
    "q2_min_cost_supp",
    (s, dir) => {
      val t = Tables(s, dir)
      val eu = t.region.filter(col("r_name") === "EUROPE")
      val nat = t.nation.join(broadcast(eu), col("n_regionkey") === col("r_regionkey"))
      val supp = t.supplier.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      val unitCents = round(col("l_extendedprice") / col("l_quantity") * 100).cast("long")
      val offers = t.lineitem
        .join(broadcast(supp.select(col("s_suppkey"))), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(unitCents).as("cost_cents"))
      val minPerPart = offers.groupBy(col("l_partkey")).agg(min(col("cost_cents")).as("min_cents"))
        .withColumnRenamed("l_partkey", "mp_partkey")
      offers
        .join(minPerPart, col("l_partkey") === col("mp_partkey") &&
          col("cost_cents") === col("min_cents"))
        .join(broadcast(t.part.filter(col("p_type") === "STANDARD" && col("p_size") >= 25)),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
          col("n_name"), col("p_partkey"),
          round(col("cost_cents") / 100.0, 2).as("cost"))
        .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
        .limit(100)
    },
    oracle = Some("""
      WITH offers AS (
        SELECT l_partkey, l_suppkey,
               min(round(l_extendedprice / l_quantity * 100)::BIGINT) AS cost_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY 1, 2)
      SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
             round(cost_cents / 100.0, 2) AS cost
      FROM offers o
      JOIN part ON p_partkey = o.l_partkey
      JOIN supplier ON s_suppkey = o.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_type = 'STANDARD' AND p_size >= 25
        AND cost_cents = (SELECT min(cost_cents) FROM offers i
                          WHERE i.l_partkey = o.l_partkey)
      ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100
    """),
  )

  /** TPC-H Q9-like (product-type profit): profit by supplier nation and
    * order year over one product family — the many-join star with an
    * arithmetic measure. Without ps_supplycost the unit cost is 10% of
    * p_retailprice; profit = revenue − cost, both per-row rounded to
    * exact integer cents BEFORE the sum (the q7 discipline, applied to
    * a subtraction). Part filter broadcasts and prunes the fact first;
    * supplier→nation broadcasts; one shuffle against orders.
    */
  val q9 = Query(
    "q9_product_profit",
    (s, dir) => {
      val t = Tables(s, dir)
      val profitCents =
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long") -
          round(col("p_retailprice") * col("l_quantity") * 10).cast("long")
      t.lineitem
        .join(broadcast(t.part.filter(col("p_name").contains("widget"))),
          col("l_partkey") === col("p_partkey"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(profitCents) / 100.0, 2).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    oracle = Some("""
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
                       - round(p_retailprice * l_quantity * 10)::BIGINT)
               / 100.0, 2) AS sum_profit
      FROM lineitem, part, orders, supplier, nation
      WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%widget%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC
    """),
  )

  /** TPC-H Q11-like (important stock): parts whose revenue mass from
    * EUROPE-supplied lines exceeds 1.5× the average per-part mass —
    * the HAVING-against-a-scalar-subquery shape. Q11's fraction
    * scales inversely with SF, so a fixed fraction degenerates as the
    * part count grows; comparing against the average (2·v·n > 3·Σ
    * over exact integer cents — 14/331/2930 winners at the three SFs)
    * is the same shape with an SF-stable selectivity, and no double
    * division crosses the gate. The 1-row (Σ, n) aggregate broadcasts
    * into the per-part relation (PlanAuditSpec's 1-row-cross
    * allowlist).
    */
  val q11 = Query(
    "q11_important_stock",
    (s, dir) => {
      val t = Tables(s, dir)
      val eu = t.region.filter(col("r_name") === "EUROPE")
      val nat = t.nation.join(broadcast(eu), col("n_regionkey") === col("r_regionkey"))
      val supp = t.supplier.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      val euLines = t.lineitem
        .join(broadcast(supp.select(col("s_suppkey"))), col("l_suppkey") === col("s_suppkey"))
      val extCents = round(col("l_extendedprice") * 100).cast("long")
      val perPart = euLines.groupBy(col("l_partkey").as("p_partkey"))
        .agg(sum(extCents).as("val_cents"))
      val total = perPart.agg(sum(col("val_cents")).as("total_cents"),
        count(lit(1)).as("n_parts"))
      perPart.join(broadcast(total))
        .filter(col("val_cents") * 2 * col("n_parts") > col("total_cents") * 3)
        .select(col("p_partkey"), round(col("val_cents") / 100.0, 2).as("value"))
        .orderBy(col("value").desc, col("p_partkey"))
    },
    oracle = Some("""
      WITH eu_lines AS (
        SELECT l_partkey, round(l_extendedprice * 100)::BIGINT AS ext_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      per_part AS (
        SELECT l_partkey AS p_partkey, sum(ext_cents) AS val_cents
        FROM eu_lines GROUP BY 1)
      SELECT p_partkey, round(val_cents / 100.0, 2) AS value
      FROM per_part
      WHERE val_cents * 2 * (SELECT count(*) FROM per_part)
          > (SELECT sum(val_cents) FROM per_part) * 3
      ORDER BY value DESC, p_partkey
    """),
  )

  /** TPC-H Q12-like (shipping priority by mode): late-line counts split
    * by order priority class — the join-plus-conditional-count shape.
    * Without l_shipmode/receiptdate, the mode proxy is l_returnflag
    * and "late" is shipped >60 days after order date within 1997. One
    * fact⋈fact equi-join, counts are exact integers.
    */
  val q12 = Query(
    "q12_ship_priority",
    (s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },
    oracle = Some("""
      SELECT l_returnflag,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
             sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 0 ELSE 1 END)::BIGINT AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_returnflag ORDER BY l_returnflag
    """),
  )

  /** TPC-H Q13-like (customer order-count distribution): LEFT OUTER
    * join with the filter in the JOIN condition (not WHERE — customers
    * with zero qualifying orders must survive with count 0), then a
    * second aggregation over the counts — the double-aggregation
    * shape. The priority filter stands in for the comment NOT LIKE.
    */
  val q13 = Query(
    "q13_customer_distribution",
    (s, dir) => {
      val t = Tables(s, dir)
      val ord = t.orders.filter(col("o_orderpriority") =!= "1-URGENT")
      t.customer
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    oracle = Some("""
      SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """),
  )

  /** TPC-H Q15-like (top supplier): suppliers whose quarterly revenue
    * equals the maximum — the view-plus-scalar-max shape. Revenue is
    * exact integer cents, so the max and the equality join land on
    * exact integers; the 1-row max broadcasts (PlanAuditSpec
    * allowlist).
    */
  val q15 = Query(
    "q15_top_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val rev = t.lineitem
        .filter(col("l_shipdate") >= lit("1996-07-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revCents).as("rev_cents"))
      val mx = rev.agg(max(col("rev_cents")).as("mx_cents"))
      rev.join(broadcast(mx))
        .filter(col("rev_cents") === col("mx_cents"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("rev_cents") / 100.0, 2).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    oracle = Some("""
      WITH revenue AS (
        SELECT l_suppkey,
               sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
                 AS rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, round(rev_cents / 100.0, 2) AS total_revenue
      FROM revenue JOIN supplier ON s_suppkey = l_suppkey
      WHERE rev_cents = (SELECT max(rev_cents) FROM revenue)
      ORDER BY s_suppkey
    """),
  )

  /** TPC-H Q16-like (parts/supplier relationship): distinct-supplier
    * counts per (brand, type, size) bucket, excluding a supplier
    * denylist via NOT IN (left-anti) — the count-distinct-with-
    * exclusion shape. The (part, supplier) relation comes from
    * distinct lineitem pairs (no partsupp table); the acctbal
    * threshold stands in for the complaints comment scan.
    */
  val q16 = Query(
    "q16_parts_suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      // r16 (guide §2.4): the (partkey, suppkey) pre-distinct bought
      // nothing — count(DISTINCT l_suppkey) per (brand, type, size) is
      // invariant under duplicate pairs, and the count-distinct's own
      // map-side partial aggregate dedupes before its exchange. Keeping
      // the raw pairs drops a full-width Exchange(partkey, suppkey)
      // (3 shuffles → 2) and lets both broadcast joins ride the scan.
      val rel = t.lineitem.select(col("l_partkey"), col("l_suppkey"))
      val denylist = t.supplier.filter(col("s_acctbal") < 1000)
        .select(col("s_suppkey"))
      rel
        .join(broadcast(denylist), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t.part.filter(col("p_brand") =!= "Brand#1" &&
          col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    oracle = Some("""
      SELECT p_brand, p_type, p_size,
             count(DISTINCT l_suppkey) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      JOIN part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        AND l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """),
  )

  /** TPC-H Q17-like (small-quantity revenue): revenue from lines whose
    * quantity is below 20% of their part's average — the correlated
    * per-group average, decorrelated as an aggregate equi-joined back
    * on the correlation key. The 0.2·avg comparison is cleared of
    * division: qty < 0.2·(Σq/n) ⇔ 5·qty·n < Σq over exact integer
    * quantities, so no double crosses the gate; the final ÷7 years is
    * one deterministic division of an exact cents sum.
    */
  val q17 = Query(
    "q17_small_qty_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      val qtyL = col("l_quantity").cast("long")
      val pstats = t.lineitem.groupBy(col("l_partkey").as("pk"))
        .agg(sum(qtyL).as("sumq"), count(lit(1)).as("cnt"))
      t.lineitem
        .join(broadcast(t.part.filter(col("p_brand") === "Brand#3" &&
          col("p_type") === "SMALL")), col("l_partkey") === col("p_partkey"))
        .join(pstats, col("l_partkey") === col("pk"))
        .filter(qtyL * 5 * col("cnt") < col("sumq"))
        .agg(round(sum(round(col("l_extendedprice") * 100).cast("long")) / 700.0, 2)
          .as("avg_yearly"))
    },
    oracle = Some("""
      SELECT round(sum(round(l_extendedprice * 100)::BIGINT) / 700.0, 2)
               AS avg_yearly
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN (SELECT l_partkey AS pk, sum(l_quantity::BIGINT) AS sumq,
                   count(*) AS cnt
            FROM lineitem GROUP BY 1) pstats ON pk = l_partkey
      WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
        AND l_quantity::BIGINT * 5 * cnt < sumq
    """),
  )

  /** TPC-H Q18-like (large-volume customers): orders whose total
    * quantity clears a threshold, joined back to orders and customers
    * — the HAVING-on-fact-aggregate shape. Quantities are integral in
    * this data, so the per-order sums and the threshold compare are
    * exact longs; top-100 is a heap (TakeOrderedAndProject).
    */
  val q18 = Query(
    "q18_large_volume",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.lineitem.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      // Price goes through exact integer cents (the q7/q8/q10/q14
      // pattern) — never gate a 2dp-rounded raw double cross-engine.
      val priceCents = round(col("o_totalprice") * 100).cast("long")
      big.join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          (priceCents / 100.0).as("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
    oracle = Some("""
      SELECT c_name, c_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             round(o_totalprice * 100)::BIGINT / 100.0 AS o_totalprice,
             sum_qty
      FROM (SELECT l_orderkey, sum(l_quantity::BIGINT)::BIGINT AS sum_qty
            FROM lineitem GROUP BY 1 HAVING sum(l_quantity::BIGINT) > 300) big
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """),
  )

  /** TPC-H Q19-like (discounted revenue): revenue under an OR of three
    * (brand, size-range, quantity-range) arms — the
    * disjunctive-predicate shape whose point is that the part filter
    * (an OR of brand/size conjuncts) still prunes via the broadcast
    * join while the mixed part+line arms evaluate post-join.
    */
  val q19 = Query(
    "q19_discounted_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      val revCents = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100).cast("long")
      val arm1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 20)
      val arm2 = col("p_brand") === "Brand#2" && col("p_size").between(5, 25) &&
        col("l_quantity").between(10, 30)
      val arm3 = col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40)
      t.lineitem
        .join(broadcast(t.part.filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(5, 25)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(20, 50)))),
          col("l_partkey") === col("p_partkey"))
        .filter(arm1 || arm2 || arm3)
        .agg(round(sum(revCents) / 100.0, 2).as("revenue"))
    },
    oracle = Some("""
      SELECT round(sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
               / 100.0, 2) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 1 AND 20)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
             AND l_quantity BETWEEN 20 AND 40)
    """),
  )

  /** TPC-H Q20-like (excess concentration): suppliers who shipped over
    * 20% of their all-time bolt-part quantity in 1997 alone (order
    * dates span ~7 years, so >1/5 is genuine concentration — 2/14/121
    * winners at the three SFs) — the
    * nested-semi-join-with-correlated-aggregate shape. Both the 1997
    * and all-time sums come out of ONE aggregation pass (conditional
    * sum), the ratio compare is cleared of division (5·q1997 > qAll
    * over exact longs), and the winner keys semi-join into the
    * supplier dim.
    */
  val q20 = Query(
    "q20_excess_shippers",
    (s, dir) => {
      val t = Tables(s, dir)
      val qtyL = col("l_quantity").cast("long")
      val boltParts = t.part.filter(col("p_name").contains("bolt"))
        .select(col("p_partkey"))
      val perSupp = t.lineitem
        .join(broadcast(boltParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(
          sum(when(year(col("l_shipdate")) === 1997, qtyL).otherwise(0L)).as("q1997"),
          sum(qtyL).as("q_all"))
        .filter(col("q1997") * 5 > col("q_all"))
      t.supplier
        .join(perSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name"))
    },
    oracle = Some("""
      SELECT s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY l_suppkey
        HAVING sum(CASE WHEN year(l_shipdate) = 1997
                   THEN l_quantity::BIGINT ELSE 0 END) * 5
             > sum(l_quantity::BIGINT))
      ORDER BY s_name
    """),
  )

  /** TPC-H Q21-like (suppliers who kept orders waiting): late lines of
    * finalized orders where ANOTHER supplier shares the order (EXISTS
    * self-join) but NO OTHER supplier was also late (NOT EXISTS
    * self-join) — the semi+anti self-join stack. Without
    * commit/receipt dates, "late" is shipped >60 days after order
    * date (the q4 rule). Both the semi and anti sides are equi-joins
    * on orderkey with a suppkey-inequality residual.
    */
  val q21 = Query(
    "q21_waiting_suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val fOrders = t.orders.filter(col("o_orderstatus") === "F")
      val late = t.lineitem
        .join(fOrders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = t.lineitem.select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"))
      val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
        col("l_suppkey").as("o3_suppkey"))
      late
        .join(others, col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },
    oracle = Some("""
      SELECT s_name, count(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND o3.o_orderstatus = 'F'
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """),
  )

  /** TPC-H Q22-like (global sales opportunity): customers richer than
    * the positive-balance average with no recent orders, grouped by
    * nation — the anti-join-plus-scalar-average shape. The average
    * compare is cleared of division (bal·n > Σbal over exact integer
    * cents); nationkey stands in for the phone country code; the
    * 1-row (Σ, n) aggregate broadcasts (PlanAuditSpec allowlist).
    */
  val q22 = Query(
    "q22_global_sales",
    (s, dir) => {
      val t = Tables(s, dir)
      val balCents = round(col("c_acctbal") * 100).cast("long")
      val posAvg = t.customer.filter(col("c_acctbal") > 0)
        .agg(sum(balCents).as("sum_cents"), count(lit(1)).as("n_pos"))
      val recent = t.orders
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      t.customer
        .join(broadcast(posAvg))
        .filter(balCents * col("n_pos") > col("sum_cents"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(balCents) / 100.0, 2).as("totacctbal"))
        .orderBy(col("cntrycode"))
    },
    oracle = Some("""
      SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             round(sum(round(c_acctbal * 100)::BIGINT) / 100.0, 2) AS totacctbal
      FROM customer
      WHERE round(c_acctbal * 100)::BIGINT *
            (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(round(c_acctbal * 100)::BIGINT) FROM customer
             WHERE c_acctbal > 0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY c_nationkey ORDER BY cntrycode
    """),
  )

  def all: Seq[Query] = Seq(
    q1, q2, q3, q5, q4, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15,
    q16, q17, q18, q19, q20, q21, q22,
    qRollup, qCube, qGroupingSets, qWindowTopk,
    qWindowRunning, qWindowMisc, qDatetime, qStringFuncs, qDistinct,
    qSetOps, qAntiJoin, qSubquery, qHaving, qFullOuter, qCorrelated,
    qPivot, qUnpivot, qApproxDistinct, qApproxQuantiles, qProfile, qHistogram, qPercentiles,
    qZorderLayout, qGroupTopk, qSkyline)
}
