package graft.operators

import graft.{Query, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream-shaped batch queries over the `events` table (10K rows
  * at sf0.01; the streaming module runs the same logic incrementally
  * with watermarks — see graft.streaming.EventStreams).
  *
  * Scale notes: everything partitions by `user_id` or by coarse time
  * bucket — both high-cardinality, skew-free keys; sessionization is a
  * single shuffle on user_id followed by narrow window functions; no
  * driver-side state.
  */
object Events {

  /** Hourly tumbling-window aggregation per event type. Time bucket is
    * emitted as a string so both engines hash the same bytes.
    */
  val hourly = Query(
    "ev_hourly_agg",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00")
            .as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"),
          count_distinct(col("user_id")).as("n_users"),
        )
        .orderBy(col("hour"), col("event_type"))
    },
    oracle = Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour,
             event_type, count(*) AS n,
             round(sum(value), 2) AS total_value,
             count(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """),
    headline = true,
  )

  /** Sessionization: a session breaks after a 30-minute idle gap.
    * lag → gap flag → running sum = session id, then per-user session
    * stats. One shuffle on user_id; all three window functions share the
    * same (user_id, ts, event_id) sort so Spark plans a single Window
    * exec over one sort.
    */
  val sessionize = Query(
    "ev_sessionize",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val withGap = Tables(s, dir).events
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts").cast("double") - col("prev_ts").cast("double") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_session"))
            .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      withGap
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(
          max(col("session_id")).cast("long").as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          count(lit(1)).as("n_session_rows"),
        )
        .orderBy(col("user_id"))
    },
    oracle = Some("""
      WITH gaps AS (
        SELECT user_id, ts, event_id,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
      ), flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN prev_ts IS NULL
                 OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session
        FROM gaps
      ), sess AS (
        SELECT user_id,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
      ), per_session AS (
        SELECT user_id, session_id, count(*) AS n_events
        FROM sess GROUP BY 1, 2
      )
      SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
             max(n_events) AS max_session_events,
             count(*) AS n_session_rows
      FROM per_session GROUP BY user_id ORDER BY user_id
    """),
  )

  /** Daily active users + event volume (retention-style rollup). */
  val dailyActive = Query(
    "ev_daily_active",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(
          count_distinct(col("user_id")).as("dau"),
          count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"),
        )
        .orderBy(col("day"))
    },
    oracle = Some("""
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             count(DISTINCT user_id) AS dau, count(*) AS n_events,
             round(sum(value), 2) AS total_value
      FROM events GROUP BY 1 ORDER BY 1
    """),
  )

  /** Conversion funnel: users whose first view precedes their first
    * purchase. Two small self-aggregations broadcast-joined.
    */
  val funnel = Query(
    "ev_funnel",
    (s, dir) => {
      val e = Tables(s, dir).events
      val firstView = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
      val firstBuy = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_buy"))
      firstView
        .join(firstBuy, "user_id")
        .filter(col("first_view") < col("first_buy"))
        .select(col("user_id"))
        .orderBy(col("user_id"))
    },
    oracle = Some("""
      WITH v AS (SELECT user_id, min(ts) AS first_view FROM events
                 WHERE event_type = 'view' GROUP BY 1),
           b AS (SELECT user_id, min(ts) AS first_buy FROM events
                 WHERE event_type = 'purchase' GROUP BY 1)
      SELECT v.user_id FROM v JOIN b USING (user_id)
      WHERE first_view < first_buy ORDER BY user_id
    """),
  )

  /** Semi-structured: extract a JSON field from `props` and aggregate on
    * it (the engine's JSON path surface).
    */
  val jsonProps = Query(
    "ev_json_props",
    (s, dir) => {
      Tables(s, dir).events
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k_mod"))
    },
    oracle = Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
             count(*) AS n
      FROM events GROUP BY 1 ORDER BY 1
    """),
  )

  /** As-of join: each purchase matched to the same user's most recent
    * strictly-earlier view. Spark lacks a native ASOF JOIN; the
    * composition is the documented pattern (SURVEY §2.4 preference (a)):
    * union both streams, one window per user ordered by event time with
    * a `rangeBetween(-inf, -1)` frame on epoch-micros — the range frame
    * (not rows) is what gives exact strict-inequality as-of semantics
    * under timestamp ties. The oracle runs DuckDB's NATIVE `ASOF JOIN`,
    * so the composition is checked against a real as-of implementation,
    * not against itself. One shuffle on user_id; no self-join.
    */
  val asofJoin = Query(
    "ev_asof_join",
    (s, dir) => {
      val e = Tables(s, dir).events
        .filter(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), unix_micros(col("ts")).as("tsu"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tsu"))
        .rangeBetween(Window.unboundedPreceding, -1)
      e.withColumn("last_view_ts",
        max(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_view_ts").isNotNull)
        .select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
          date_format(col("last_view_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("view_ts"),
          (unix_micros(col("ts")) - unix_micros(col("last_view_ts")))
            .as("gap_us"))
        .orderBy(col("event_id"))
    },
    oracle = Some("""
      WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
           p AS (SELECT event_id, user_id, ts FROM events
                 WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id,
        strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
        epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      FROM p ASOF JOIN v ON p.user_id = v.user_id AND v.ts < p.ts
      ORDER BY p.event_id
    """),
  )

  /** Range join: (purchase, view) pairs of the same user within ±5
    * minutes. Naive form is a theta join (cross product per user); the
    * scalable shape used here buckets both sides into 5-minute epochs
    * and joins on (user_id, bucket) with one side exploded to its
    * {b-1, b, b+1} candidate buckets — an equi-join Catalyst can hash-
    * partition, with the exact range predicate as a post-filter. The
    * oracle states the naive theta join directly; results must match.
    */
  val rangeJoin = Query(
    "ev_range_join",
    (s, dir) => {
      val e = Tables(s, dir).events
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("v_id"), col("user_id"),
          unix_micros(col("ts")).as("v_us"))
        .withColumn("bucket",
          explode(array((-1 to 1).map(d =>
            expr("v_us div 300000000") + d): _*)))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
        .withColumn("bucket", expr("p_us div 300000000"))
      purchases.join(views, Seq("user_id", "bucket"))
        .filter(abs(col("p_us") - col("v_us")) <= 300000000L)
        .select(col("p_id"), col("v_id"), col("user_id"),
          (col("p_us") - col("v_us")).as("gap_us"))
        .distinct()
        .orderBy(col("p_id"), col("v_id"))
    },
    oracle = Some("""
      SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id,
             epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON p.user_id = v.user_id
       AND abs(epoch_us(p.ts) - epoch_us(v.ts)) <= 300000000
      ORDER BY p_id, v_id
    """),
  )

  /** Native session windows: Spark's `session_window(ts, gap)` merges
    * events with <30-minute gaps per user — the built-in counterpart of
    * the manual lag-based `ev_sessionize`. The oracle reproduces the
    * same sessions with the manual SQL, so the two formulations are
    * proven equivalent. (window.end is last_event + gap by definition,
    * so the comparable columns are start and counts.)
    */
  val sessionWindow = Query(
    "ev_session_window",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("user_id"),
          date_format(col("session_window.start"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start"))
    },
    oracle = Some("""
      WITH flagged AS (
        SELECT user_id, ts, value,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sess AS (
        SELECT user_id, ts, value,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged)
      SELECT user_id,
        strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        count(*) AS n_events, round(sum(value), 2) AS total_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start
    """),
  )

  /** Cohort retention matrix: users grouped by first-seen day, activity
    * counted per week offset — the product-analytics staple. Two
    * aggregations plus one user-keyed join; the first-seen table is
    * user-cardinality (shuffles as (user_id, date) pairs), the matrix
    * itself is bounded by days × offsets.
    */
  val retention = Query(
    "ev_retention",
    (s, dir) => {
      val d = Tables(s, dir).events
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = d.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
      d.join(first, "user_id")
        .select(col("user_id"),
          date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
          floor(datediff(col("d"), col("d0")) / lit(7)).as("week_offset"))
        .distinct()
        .groupBy(col("cohort_day"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("week_offset"))
    },
    oracle = Some("""
      WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS d FROM events
      ), f AS (
        SELECT user_id, min(d) AS d0 FROM d GROUP BY 1
      ), a AS (
        SELECT DISTINCT d.user_id,
          strftime(f.d0, '%Y-%m-%d') AS cohort_day,
          (d.d - f.d0) // 7 AS week_offset
        FROM d JOIN f USING (user_id))
      SELECT cohort_day, week_offset, count(*) AS n_users
      FROM a GROUP BY 1, 2 ORDER BY 1, 2
    """),
  )

  /** [[Skew.saltedJoin]] under the oracle gate: events (big side,
    * skewed — a handful of hot `event_type` keys carry everything)
    * joined to a per-type dimension through the deterministic salt
    * protocol, then rolled up. At 100 TB a plain shuffle join on a
    * 5-value key sends each hot key to ONE reducer; the salt spreads
    * every hot key over `nSalts` tasks at the cost of replicating the
    * (tiny) dim side nSalts×. The oracle is the UNSALTED join — the
    * gate proves the protocol is invisible to semantics. The dim-
    * derived column flows through the aggregate so a broken join
    * cannot hash-pass; `avg_value` is the type's dim value (one dim
    * row per type joined to every event of the type).
    */
  val skewJoin = Query(
    "ev_skew_join",
    (s, dir) => {
      val e = Tables(s, dir).events
      val dim = e.groupBy(col("event_type"))
        .agg(round(avg(col("value")), 4).as("type_avg"))
      Skew.saltedJoin(e, dim, "event_type", col("event_id"), nSalts = 8)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value") * col("type_avg")), 2).as("weighted"),
          min(col("type_avg")).as("avg_value"))
        .orderBy(col("event_type"))
    },
    oracle = Some("""
      WITH dim AS (
        SELECT event_type, round(avg(value), 4) AS type_avg
        FROM events GROUP BY 1)
      SELECT e.event_type, count(*) AS n,
             round(sum(e.value * d.type_avg), 2) AS weighted,
             min(d.type_avg) AS avg_value
      FROM events e JOIN dim d USING (event_type)
      GROUP BY 1 ORDER BY 1
    """),
  )

  /** Slowly-changing-dimension type-2 history build (the warehouse op
    * that turns an event/CDC feed into versioned dimension rows):
    * consecutive runs of the same `event_type` per user collapse into
    * one version row carrying `valid_from` / `valid_to` / `is_current`
    * — the gaps-and-islands pattern (run boundaries via `lag`, version
    * numbers via a running sum of boundary flags, one row per island).
    *
    * Plan shape (pinned in PLANS.md): everything clusters on
    * `user_id` — the lag + running-sum windows share one
    * sort+exchange; the island `groupBy(user_id, ver)` and the
    * `lead(ver)` window are both satisfied by the SAME HashPartitioning
    * (user_id ⊆ the clustering keys), so the whole history build is ONE
    * hash exchange on a high-cardinality skew-free key plus the final
    * presentation sort. At 100 TB: state per user is one row per
    * version (not per event) after the map-side-combinable island
    * aggregate, and no global window ever appears.
    */
  val scd2 = Query(
    "ev_scd2",
    (s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val prev = lag(col("event_type"), 1).over(byUser)
      val runs = Tables(s, dir).events
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("chg",
          when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
        .withColumn("ver", sum(col("chg"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("ver"))
        .agg(min(col("event_type")).as("event_type"),
          min(col("ts")).as("from_ts"), count(lit(1)).as("n_events"))
      val byVer = Window.partitionBy(col("user_id")).orderBy(col("ver"))
      val nextFrom = lead(col("from_ts"), 1).over(byVer)
      runs
        .withColumn("valid_to_ts", nextFrom)
        .select(col("user_id"), col("ver"), col("event_type"),
          date_format(col("from_ts"), fmt).as("valid_from"),
          coalesce(date_format(col("valid_to_ts"), fmt), lit("current"))
            .as("valid_to"),
          col("valid_to_ts").isNull.as("is_current"),
          col("n_events"))
        .orderBy(col("user_id"), col("ver"))
    },
    oracle = Some("""
      WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_type
        FROM events
      ), flagged AS (
        SELECT user_id, event_type, ts, event_id,
          CASE WHEN prev_type IS NULL OR prev_type <> event_type
               THEN 1 ELSE 0 END AS chg
        FROM ordered
      ), versioned AS (
        SELECT user_id, event_type, ts,
          sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        FROM flagged
      ), runs AS (
        SELECT user_id, CAST(ver AS BIGINT) AS ver,
          min(event_type) AS event_type, min(ts) AS from_ts,
          count(*) AS n_events
        FROM versioned GROUP BY user_id, ver
      )
      SELECT user_id, ver, event_type,
        strftime(from_ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
        coalesce(strftime(lead(from_ts) OVER (PARTITION BY user_id
          ORDER BY ver), '%Y-%m-%d %H:%M:%S.%f'), 'current') AS valid_to,
        (lead(from_ts) OVER (PARTITION BY user_id ORDER BY ver) IS NULL)
          AS is_current,
        n_events
      FROM runs ORDER BY user_id, ver
    """),
  )

  /** Rolling z-score anomaly detection — the monitoring query every
    * event pipeline runs over its own volumes: each (hour, type)
    * count scores against the trailing 24 OBSERVED hours of the same
    * type (rows-frame: silent hours don't pad the baseline), and the
    * 10 most anomalous cells surface. Needs ≥ 12 observed trailing
    * hours (warm-up) and non-degenerate variance.
    *
    * Cross-engine determinism: mean/variance do NOT use either
    * engine's stddev aggregate (different accumulation algorithms ⇒
    * different float error). Both sides compute the EXACT integer
    * window sums Σn and Σn² and then the identical double formula
    * var = (Σn² − (Σn)²/c)/(c−1) — integer sums are exact, the double
    * expression tree is the same, so z agrees bit-for-bit before
    * rounding. Shape: one (hour×type)-bounded aggregate, windows
    * PARTITIONED by type (distributed), a top-10 sort-limit tail, and
    * a rank window over 10 rows.
    */
  /** The rolling-z scoring tail over an (h, event_type, n) hourly
    * relation — shared verbatim by [[anomaly]] and its streaming twin
    * (`ev_stream_anomaly`), which differ only in how the hourly rollup
    * is maintained (one batch scan vs. incremental window state).
    */
  private[graft] def anomalyTail(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-24, -1)
    val scored = hourly
      .withColumn("c", count(col("n")).over(w))
      .withColumn("sn", sum(col("n")).over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .filter(col("c") >= 12)
      .withColumn("variance",
        (col("ss") - col("sn") * col("sn") / col("c")) / (col("c") - 1))
      .filter(col("variance") > 0)
      .withColumn("z",
        (col("n") - col("sn") / col("c")) / sqrt(col("variance")))
    scored.orderBy(abs(col("z")).desc, col("event_type"), col("h"))
      .limit(10)
      .withColumn("rk", row_number().over(
        Window.orderBy(abs(col("z")).desc, col("event_type"), col("h"))))
      .select(col("rk"), col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("n"), round(col("z"), 4).as("z"))
      .orderBy(col("rk"))
  }

  /** Sketch-algebra rollup — the pre-aggregation trick OLAP cubes rely
    * on: per-(day, type) HLL sketches built ONCE, then re-aggregated
    * to per-type totals by sketch UNION (register-wise max — exactly
    * distinct-union semantics, which additive counts cannot give).
    * This is how a 100 TB deployment serves "distinct users over any
    * date range" without rescanning events: the daily sketch table is
    * days×types rows, and any rollup is a union over it. Uses Spark's
    * DataSketches-backed `hll_sketch_agg`/`hll_union_agg` (lgK=12,
    * rsd ≈ 1.6%). Gate contract: sketch estimates are
    * implementation-dependent numbers, so the gate pins the GUARANTEE
    * (the q_approx_distinct / ev_stream_hourly_users pattern): the
    * union-of-days estimate must sit within 15% of the exact per-type
    * distinct with an absolute floor of 8; DuckDB recomputes the
    * exact counts and day spans and asserts the flag.
    */
  val hllRollup = Query(
    "ev_hll_rollup",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val daily = ev
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val merged = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      val exact = ev.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
      merged.join(exact, "event_type")
        .select(col("event_type"), col("n_days"), col("exact_users"),
          (abs(col("est") - col("exact_users")) <=
            greatest(ceil(col("exact_users") * 0.15), lit(8))).as("est_ok"))
        .orderBy(col("event_type"))
    },
    oracle = Some("""
      SELECT event_type,
             count(DISTINCT ts::DATE) AS n_days,
             count(DISTINCT user_id) AS exact_users,
             true AS est_ok
      FROM events GROUP BY 1 ORDER BY 1
    """),
  )

  /** DAU/WAU — the daily-active / weekly-active report every product
    * pipeline ships, built the way it scales: DAU is the exact per-day
    * distinct (one aggregation), and WAU is a ROLLING SKETCH UNION —
    * `hll_union_agg` over a CALENDAR-bounded 7-day range frame (on an
    * integer day number) on the
    * days-bounded daily-sketch relation ([[hllRollup]]'s
    * materialization unit consumed as a rolling window), so the
    * 7-day distinct never rescans events. The exactness side of the
    * audit computes true WAU via the ev_sliding_agg Expand discipline
    * (each event day contributes to its 7 covering days — a map-side
    * explode, then one distinct aggregation); the gate pins DAU
    * exactly and WAU's estimator GUARANTEE (15% band, absolute floor
    * 8 — the small-cardinality HLL rule) per day.
    */
  val activeUsers = Query(
    "ev_active_users",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val daily = ev.groupBy(to_date(col("ts")).as("d"))
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
          count_distinct(col("user_id")).as("dau"))
      // days-bounded relation (30 rows at every SF): the unpartitioned
      // rolling frame is over days, not events. RANGE over an integer
      // day number, not ROWS over days-present rows: the exactness
      // oracle is calendar-bounded (BETWEEN d-6 AND d), and a corpus
      // with a missing event day would make a rows-frame union span
      // more than 7 calendar days and flip wau_ok.
      val w7 = Window.orderBy(col("dn")).rangeBetween(-6, 0)
      val est = daily
        .withColumn("dn", datediff(col("d"), lit("1970-01-01").cast("date")))
        .withColumn("wau_sk", expr("hll_union_agg(sk, false)").over(w7))
        .select(col("d"), col("dau"),
          expr("hll_sketch_estimate(wau_sk)").as("wau_est"))
      val exact7 = ev
        .select(to_date(col("ts")).as("ed"), col("user_id"))
        .select(explode(sequence(lit(0), lit(6))).as("k"), col("ed"),
          col("user_id"))
        .select(expr("date_add(ed, k)").as("d"), col("user_id"))
        .groupBy(col("d"))
        .agg(count_distinct(col("user_id")).as("wau_exact"))
      est.join(exact7, "d")
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau_exact"),
          (abs(col("wau_est") - col("wau_exact")) <=
            greatest(ceil(col("wau_exact") * 0.15), lit(8))).as("wau_ok"))
        .orderBy(col("day"))
    },
    oracle = Some("""
      WITH daily AS (
        SELECT ts::DATE AS d, count(DISTINCT user_id) AS dau
        FROM events GROUP BY 1
      ), ex AS (
        SELECT dd.d, count(DISTINCT e.user_id) AS wau_exact
        FROM daily dd JOIN events e
          ON e.ts::DATE BETWEEN dd.d - 6 AND dd.d
        GROUP BY 1)
      SELECT strftime(daily.d, '%Y-%m-%d') AS day, dau, wau_exact,
             true AS wau_ok
      FROM daily JOIN ex ON daily.d = ex.d
      ORDER BY day
    """),
  )

  val anomaly = Query(
    "ev_anomaly",
    (s, dir) => {
      val hourly = Tables(s, dir).events
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      anomalyTail(hourly)
    },
    oracle = Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
      ), win AS (
        SELECT h, event_type, n,
          count(n) OVER w AS c, sum(n) OVER w AS sn,
          sum(n * n) OVER w AS ss
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      ), scored AS (
        SELECT h, event_type, n,
          (n - sn / c) / sqrt((ss - sn * sn / c) / (c - 1)) AS z
        FROM win
        WHERE c >= 12 AND (ss - sn * sn / c) / (c - 1) > 0
      )
      SELECT row_number() OVER (ORDER BY abs(z) DESC, event_type, h) AS rk,
             event_type, strftime(h, '%Y-%m-%d %H:00:00') AS hour,
             n, round(z, 4) AS z
      FROM scored ORDER BY abs(z) DESC, event_type, h LIMIT 10
    """),
  )

  /** Point-in-time temporal join — the warehouse query SCD2 histories
    * exist FOR: each purchase joins the dimension version (the user's
    * non-purchase activity-status run) valid AT the purchase's
    * timestamp, `valid_from ≤ ts < valid_to` with the open version
    * unbounded. This is [[scd2]]'s history build consumed end-to-end:
    * a fact × versioned-dimension interval-containment join.
    *
    * Plan shape: the join is EQUI on user_id with the interval
    * containment as a residual predicate — one key-partitioned
    * shuffle join, no range-join machinery, no window over facts. A
    * user's version count is bounded by their status-change count, so
    * the per-key match work is tiny and skew follows user activity
    * (the salted-join protocol applies if a bot user ever matters).
    * Each fact matches AT MOST one version (versions partition the
    * timeline); facts before the user's first status version drop
    * (inner semantics, stated in the oracle).
    */
  val scd2Join = Query(
    "ev_scd2_join",
    (s, dir) => {
      val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val prev = lag(col("event_type"), 1).over(byUser)
      val dim = Tables(s, dir).events
        .filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("chg",
          when(prev.isNull || prev =!= col("event_type"), 1).otherwise(0))
        .withColumn("ver", sum(col("chg"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("ver"))
        .agg(min(col("event_type")).as("status"),
          min(col("ts")).as("from_ts"))
        .withColumn("to_ts",
          lead(col("from_ts"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("ver"))))
      val facts = Tables(s, dir).events
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"), col("value"))
      facts.join(dim,
        col("p_user") === col("user_id") &&
          col("p_ts") >= col("from_ts") &&
          (col("to_ts").isNull || col("p_ts") < col("to_ts")))
        .select(col("p_id"), col("user_id"), col("ver"), col("status"),
          date_format(col("p_ts"), fmt).as("p_ts"),
          round(col("value"), 2).as("value"))
        .orderBy(col("p_id"))
    },
    oracle = Some("""
      WITH nonp AS (
        SELECT user_id, event_type, ts, event_id,
          lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS prev_type
        FROM events WHERE event_type <> 'purchase'
      ), flagged AS (
        SELECT user_id, event_type, ts,
          CASE WHEN prev_type IS NULL OR prev_type <> event_type
               THEN 1 ELSE 0 END AS chg,
          event_id
        FROM nonp
      ), versioned AS (
        SELECT user_id, event_type, ts,
          sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver
        FROM flagged
      ), dim AS (
        SELECT user_id, CAST(ver AS BIGINT) AS ver,
          min(event_type) AS status, min(ts) AS from_ts,
          lead(min(ts)) OVER (PARTITION BY user_id ORDER BY ver) AS to_ts
        FROM versioned GROUP BY user_id, ver
      )
      SELECT p.event_id AS p_id, d.user_id, d.ver, d.status,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS p_ts,
             round(p.value, 2) AS value
      FROM events p JOIN dim d
        ON p.user_id = d.user_id
       AND p.ts >= d.from_ts
       AND (d.to_ts IS NULL OR p.ts < d.to_ts)
      WHERE p.event_type = 'purchase'
      ORDER BY p_id
    """),
  )

  /** SLIDING-window aggregation — the overlapping-window semantics
    * [[hourly]]'s tumbling buckets cannot express (a 1-hour window
    * every 15 minutes: each event belongs to exactly FOUR windows, and
    * a spike shows in every window covering it rather than splitting
    * on an arbitrary bucket edge). Uses Spark's native
    * `window(ts, '1 hour', '15 minutes')` — a map-side Expand (4 rows
    * per event) feeding one hash aggregate, no self-join.
    *
    * The oracle replicates the window assignment in exact INTEGER
    * µs→s arithmetic (floor to the 15-minute grid, then the 4
    * predecessor starts); epoch-aligned flooring is deterministic on
    * both engines, and an event exactly on a grid boundary belongs to
    * the window STARTING at it, never the one ending there — stated by
    * the k = 0..3 construction on both sides.
    */
  val slidingAgg = Query(
    "ev_sliding_agg",
    (s, dir) => {
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour", "15 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
            .as("w_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("w_start"), col("event_type"))
    },
    oracle = Some("""
      WITH e AS (
        SELECT epoch_us(ts) // 1000000 // 900 * 900 AS grid_s,
               event_type, value
        FROM events
      ), expanded AS (
        SELECT grid_s - k * 900 AS start_s, event_type, value
        FROM (SELECT grid_s, event_type, value, unnest(range(0, 4)) AS k
              FROM e)
      )
      SELECT strftime(to_timestamp(start_s), '%Y-%m-%d %H:%M:%S') AS w_start,
             event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM expanded GROUP BY 1, 2 ORDER BY 1, 2
    """),
  )

  def all: Seq[Query] = Seq(hourly, sessionize, dailyActive, funnel,
    jsonProps, asofJoin, rangeJoin, sessionWindow, retention, skewJoin,
    scd2, anomaly, scd2Join, slidingAgg, hllRollup, activeUsers)
}
