package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.GraftQuery
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Product/behavioral analytics operators over the events and orders
  * streams: funnel conversion, cohort retention, exact-arithmetic
  * anomaly flagging, and SCD2 dimension versioning. The reference
  * engine delegates this entire surface to its host dataframe library
  * (reference `README.rst:36-39`); here each shape is expressed so one
  * key shuffle serves every window/aggregation of the query.
  */
object Analytics {

  /** Shared day-level revenue rollup (day, cents) — the cents
    * exactness recipe (round·100 → exact long sum) stated ONCE for
    * the q122/q127/q138/q139/q144 family (review finding: five
    * verbatim copies drift when the recipe changes).
    */
  private def dailyRevenueCents(t: Tables): DataFrame =
    t.orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))

  /** Shared per-(segment, customer) lifetime cents rollup — the
    * q123/q125 block stated once.
    */
  private def segmentCustomerCents(t: Tables): DataFrame =
    t.orders
      .join(broadcast(t.customer.select(col("c_custkey"),
        col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))

  /** Calendar month index (year·12 + month, long) — the cohort month
    * arithmetic q129/q130/q141 must share exactly.
    */
  private def monthIndex(c: Column): Column =
    (year(c) * 12 + month(c)).cast("long")

  /** Staged funnel per user (view → click → purchase, each stage
    * strictly after the previous): three chained whole-partition
    * conditional MINs over the SAME window spec, so Catalyst plans a
    * single user_id exchange + sort for all of them — no self-joins,
    * no re-scans. funnel_depth counts completed stages; timestamps of
    * each stage ride along for the hash.
    */
  val q46Funnel = GraftQuery(
    "q46_funnel",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"))
      t.events
        .select(col("user_id"), col("event_type"), col("ts"))
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("ts") > col("t_view"),
            col("ts"))).over(w))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
            col("ts"))).over(w))
        .groupBy(col("user_id"))
        .agg(
          tsString(first(col("t_view"))).as("t_view_s"),
          tsString(first(col("t_click"))).as("t_click_s"),
          tsString(first(col("t_purchase"))).as("t_purchase_s"),
          (first(col("t_view")).isNotNull.cast("long")
            + first(col("t_click")).isNotNull.cast("long")
            + first(col("t_purchase")).isNotNull.cast("long")).as("funnel_depth"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH staged AS (
        SELECT user_id, event_type, ts,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id) AS t_view
        FROM events),
      staged2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                 OVER (PARTITION BY user_id) AS t_click
        FROM staged),
      staged3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                 OVER (PARTITION BY user_id) AS t_purchase
        FROM staged2)
      SELECT user_id,
             strftime(MIN(t_view), '%Y-%m-%d %H:%M:%S') AS t_view_s,
             strftime(MIN(t_click), '%Y-%m-%d %H:%M:%S') AS t_click_s,
             strftime(MIN(t_purchase), '%Y-%m-%d %H:%M:%S') AS t_purchase_s,
             CAST(CASE WHEN MIN(t_view) IS NULL THEN 0 ELSE 1 END
                + CASE WHEN MIN(t_click) IS NULL THEN 0 ELSE 1 END
                + CASE WHEN MIN(t_purchase) IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS funnel_depth
      FROM staged3
      GROUP BY user_id
      ORDER BY user_id
    """)
  )

  /** Cohort retention: users grouped by first-active day, distinct
    * active users per (cohort_day, day_offset). Two aggregations on
    * the same user_id key — the cohort frame is users-sized (tiny
    * next to events) so its join back is broadcast; the retention
    * count shuffles once on the composite day key.
    */
  val q47CohortRetention = GraftQuery(
    "q47_cohort_retention",
    (s, dir) => {
      val t = Tables(s, dir)
      val days = t.events
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val cohort = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      days.join(broadcast(cohort), Seq("user_id"))
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day_s"),
          col("day_offset"), col("n_users"))
        .orderBy(col("cohort_day_s"), col("day_offset"))
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id)
      SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day_s,
             CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) AS day_offset,
             COUNT(DISTINCT d.user_id) AS n_users
      FROM days d JOIN cohort c ON d.user_id = c.user_id
      GROUP BY 1, 2
      ORDER BY cohort_day_s, day_offset
    """)
  )

  /** Exact-arithmetic anomaly flags: a lineitem is anomalous if its
    * extended price deviates from its part's mean by more than two
    * population standard deviations. The test is evaluated WITHOUT
    * floating point: prices become integer cents, and
    * (x−μ)² > 4σ²  ⟺  (n·x − S)² > 4·(n·Q − S²)
    * with S = Σcents, Q = Σcents² — all BIGINT, so the flag is
    * bit-identical across engines (no sqrt, no division). Magnitude
    * bound: |terms| ≤ n·max_cents² ≈ group_size · 10^14 — safe in
    * BIGINT through group sizes ~10⁴; the per-part stats frame is
    * dimension-sized and broadcast back onto the fact scan.
    */
  val q48AnomalyExact = GraftQuery(
    "q48_anomaly_exact",
    (s, dir) => {
      val t = Tables(s, dir)
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val li = t.lineitem
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey"), cents.as("cents"))
      val stats = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_part"),
          sum(col("cents")).as("s"),
          sum(col("cents") * col("cents")).as("q"))
      li.join(broadcast(stats), Seq("l_partkey"))
        .withColumn("dev_cents", col("n_part") * col("cents") - col("s"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("n_part"), col("dev_cents"),
          (col("dev_cents") * col("dev_cents") >
            lit(4L) * (col("n_part") * col("q") - col("s") * col("s")))
            .as("is_anomaly"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      WITH li AS (
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_partkey,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
      stats AS (
        SELECT l_partkey, COUNT(*) AS n_part,
               CAST(SUM(cents) AS BIGINT) AS s,
               CAST(SUM(cents * cents) AS BIGINT) AS q
        FROM li GROUP BY l_partkey)
      SELECT li.l_orderkey, li.l_linenumber, li.l_partkey,
             st.n_part,
             st.n_part * li.cents - st.s AS dev_cents,
             (st.n_part * li.cents - st.s) * (st.n_part * li.cents - st.s)
               > 4 * (st.n_part * st.q - st.s * st.s) AS is_anomaly
      FROM li JOIN stats st ON li.l_partkey = st.l_partkey
      ORDER BY li.l_orderkey, li.l_linenumber
    """)
  )

  /** SCD2 dimension versioning: each order opens a customer version
    * valid until the next order (tie-broken by order key for
    * determinism), the latest version flagged current with an open-end
    * sentinel. One window over the natural key — the standard
    * warehouse "type 2" maintenance shape, expressible without MERGE.
    */
  val q49Scd2Versions = GraftQuery(
    "q49_scd2_versions",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t.orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate"))
        .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          tsString(col("o_orderdate")).as("valid_from_s"),
          coalesce(tsString(col("valid_to")), lit("9999-12-31 00:00:00")).as("valid_to_s"),
          col("valid_to").isNull.as("is_current"))
        .orderBy(col("o_custkey"), col("valid_from_s"), col("o_orderkey"))
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from_s,
             COALESCE(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S'),
                      '9999-12-31 00:00:00') AS valid_to_s,
             lead(o_orderdate) OVER w IS NULL AS is_current
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, valid_from_s, o_orderkey
    """)
  )

  /** Statistical profile with EXACT moment arithmetic: Pearson
    * correlation and OLS slope of extendedprice on quantity per
    * return flag. Both engines accumulate the raw moments as integer
    * cents (Σx, Σy, Σxy BIGINT-exact; Σx², Σy² through DECIMAL(38,0)
    * — Σy² exceeds 2⁶³ at scale) and only then evaluate the formula
    * in double. Every double op in that tail (cast of an exact
    * integer, multiply, subtract, divide, sqrt) is correctly rounded
    * under IEEE 754, so the emitted correlation/slope are
    * bit-identical across engines — no rounding epsilon needed.
    */
  val q51StatsProfile = GraftQuery(
    "q51_stats_profile",
    (s, dir) => {
      val t = Tables(s, dir)
      val xc = round(col("l_quantity") * 100).cast("long")
      val yc = round(col("l_extendedprice") * 100).cast("long")
      val li = t.lineitem.select(col("l_returnflag"), xc.as("x"), yc.as("y"))
      val dec = DecimalType(38, 0)
      li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum((col("x") * col("y")).cast(dec)).as("sxy"),
          sum((col("x") * col("x")).cast(dec)).as("sx2"),
          sum((col("y") * col("y")).cast(dec)).as("sy2"))
        .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
          // products of the component sums overflow 64-bit — the
          // formula tail runs on double-cast components (each < 2⁵³,
          // so the casts are exact and every op correctly rounded)
          col("sx").cast(DoubleType).as("sx_d"),
          col("sy").cast(DoubleType).as("sy_d"),
          col("sxy").cast(DoubleType).as("sxy_d"),
          col("sx2").cast(DoubleType).as("sx2_d"),
          col("sy2").cast(DoubleType).as("sy2_d"))
        .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
          ((col("n") * col("sxy_d") - col("sx_d") * col("sy_d")) /
            sqrt((col("n") * col("sx2_d") - col("sx_d") * col("sx_d")) *
                 (col("n") * col("sy2_d") - col("sy_d") * col("sy_d"))))
            .as("corr_qty_price"),
          ((col("n") * col("sxy_d") - col("sx_d") * col("sy_d")) /
            (col("n") * col("sx2_d") - col("sx_d") * col("sx_d")))
            .as("slope_cents"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sxy_d,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)
                      * CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx2_d,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sy2_d
        FROM lineitem GROUP BY l_returnflag),
      d AS (
        SELECT *, CAST(sx AS DOUBLE) AS sx_d, CAST(sy AS DOUBLE) AS sy_d FROM m)
      SELECT l_returnflag, n, sx, sy,
             (n * sxy_d - sx_d * sy_d) /
               sqrt((n * sx2_d - sx_d * sx_d) * (n * sy2_d - sy_d * sy_d)) AS corr_qty_price,
             (n * sxy_d - sx_d * sy_d) / (n * sx2_d - sx_d * sx_d) AS slope_cents
      FROM d
      ORDER BY l_returnflag
    """)
  )

  /** Data-quality column profiling: per-column null count, distinct
    * count, and min/max rendered through type-stable casts (strings
    * direct, integers via string cast, money via DECIMAL(12,2),
    * timestamps via the shared formatter) — the "profile this table"
    * operator every ingestion pipeline runs first. One pass per
    * profiled column, unioned; at scale the distinct counts switch to
    * the theta sketch (q38) — here they stay exact so the oracle can
    * hash them.
    */
  val q52ColumnProfile = GraftQuery(
    "q52_column_profile",
    (s, dir) => {
      val t = Tables(s, dir)
      val o = t.orders
      def prof(name: String, c: Column, minMax: Column => Column) =
        o.agg(
          count(lit(1)).as("n_rows"),
          sum(c.isNull.cast("long")).as("n_null"),
          count_distinct(c).as("n_distinct"),
          minMax(min(c)).as("min_s"),
          minMax(max(c)).as("max_s"))
          .select(lit(name).as("column_name"), col("n_rows"), col("n_null"),
            col("n_distinct"), col("min_s"), col("max_s"))
      prof("o_custkey", col("o_custkey"), _.cast("string"))
        .unionByName(prof("o_orderdate", col("o_orderdate"), tsString))
        .unionByName(prof("o_orderstatus", col("o_orderstatus"), identity))
        .unionByName(prof("o_totalprice", col("o_totalprice"),
          _.cast(DecimalType(12, 2)).cast("string")))
        .orderBy(col("column_name"))
    },
    Some("""
      SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             COUNT(DISTINCT o_custkey) AS n_distinct,
             CAST(MIN(o_custkey) AS VARCHAR) AS min_s,
             CAST(MAX(o_custkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', COUNT(*),
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderdate),
             strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
             strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(*),
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderstatus),
             MIN(o_orderstatus), MAX(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', COUNT(*),
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_totalprice),
             CAST(CAST(MIN(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR),
             CAST(CAST(MAX(o_totalprice) AS DECIMAL(12,2)) AS VARCHAR)
      FROM orders
      ORDER BY column_name
    """)
  )

  /** Session gap for q54 — shares the streaming family's definition
    * (EventsStream.SessionGapMinutes) so batch funnels and streaming
    * sessions agree on what a "session" is.
    */
  private val SessionGapMicros =
    graft.streaming.EventsStream.SessionGapMinutes * 60L * 1000000L

  /** Funnel conversion WITHIN session boundaries: events are first
    * sessionized (30-minute silence closes a session — the same gap
    * rule the streaming family uses), then the view → click → purchase
    * staged funnel runs per (user, session) instead of per user. This
    * is the composition ROADMAP named: a user who views today and
    * purchases next week no longer converts.
    *
    * Plan shape: ONE user_id exchange serves everything — the lag
    * window, the running-sum session id, the three chained conditional
    * MINs (their (user_id, session_id) partition is satisfied by the
    * user_id hash partitioning — Spark only adds a sort), and the
    * final per-session aggregation. No self-joins, no re-scans.
    */
  val q56SessionizedFunnel = GraftQuery(
    "q56_sessionized_funnel",
    (s, dir) => {
      val t = Tables(s, dir)
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = t.events
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
        .withColumn("new_session",
          (col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > SessionGapMicros)
            .cast("long"))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
      val wSess = Window.partitionBy(col("user_id"), col("session_id"))
      sess
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts"))).over(wSess))
        .withColumn("t_click",
          min(when(col("event_type") === "click" && col("ts") > col("t_view"),
            col("ts"))).over(wSess))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
            col("ts"))).over(wSess))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          tsString(min(col("ts"))).as("session_start_s"),
          (first(col("t_view")).isNotNull.cast("long")
            + first(col("t_click")).isNotNull.cast("long")
            + first(col("t_purchase")).isNotNull.cast("long")).as("funnel_depth"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_id, event_type, ts,
               lag(epoch_us(ts)) OVER w AS prev_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT *, CAST(SUM(CASE WHEN prev_us IS NULL
                      OR epoch_us(ts) - prev_us > $SessionGapMicros
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM e),
      st1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id, session_id) AS t_view
        FROM sess),
      st2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
                 OVER (PARTITION BY user_id, session_id) AS t_click
        FROM st1),
      st3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
                 OVER (PARTITION BY user_id, session_id) AS t_purchase
        FROM st2)
      SELECT user_id, session_id,
             COUNT(*) AS n_events,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start_s,
             CAST(CASE WHEN MIN(t_view) IS NULL THEN 0 ELSE 1 END
                + CASE WHEN MIN(t_click) IS NULL THEN 0 ELSE 1 END
                + CASE WHEN MIN(t_purchase) IS NULL THEN 0 ELSE 1 END AS BIGINT)
               AS funnel_depth
      FROM st3
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """)
  )

  /** Declarative data-quality constraint suite (the Deequ shape): each
    * constraint is one row — name, exact metric, pass flag — so a
    * pipeline can gate ingestion on `bool_and(passed)`. Metrics are
    * ratios of exact BIGINT counts evaluated in one correctly-rounded
    * double division, so they hash identically across engines.
    *
    * Scale shape: ONE map-side-combined aggregation per table computes
    * every per-table counter (three orders metrics share one scan,
    * two lineitem metrics share another); referential integrity is the
    * only join (left-anti on the key, AQE-handled). The six constraint
    * rows unpivot from the three 1-row frames driver-free.
    */
  val q55DqConstraints = GraftQuery(
    "q55_dq_constraints",
    (s, dir) => {
      val t = Tables(s, dir)
      def ratio(num: Column, den: Column): Column =
        (num.cast("long").cast(DoubleType) / den.cast("long").cast(DoubleType))
      // one aggregation per table: every counter in a single scan
      val o = t.orders.agg(
        count(lit(1)).as("o_n"),
        count(col("o_custkey")).as("o_custkey_nn"),
        count_distinct(col("o_orderkey")).as("o_orderkey_dist"),
        sum(col("o_orderstatus").isin("F", "O", "P").cast("long")).as("o_status_ok"))
      val l = t.lineitem.agg(
        count(lit(1)).as("l_n"),
        sum((col("l_discount") >= 0 && col("l_discount") <= 0.1).cast("long"))
          .as("l_disc_ok"),
        sum((col("l_quantity") > 0).cast("long")).as("l_qty_ok"))
      val orphans = t.lineitem.select(col("l_orderkey"))
        .join(t.orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val wide = o.crossJoin(l).crossJoin(orphans)
      def row(name: String, metric: Column, passed: Column): DataFrame =
        wide.select(lit(name).as("constraint_name"), metric.as("metric"),
          passed.as("passed"))
      row("completeness:o_custkey",
          ratio(col("o_custkey_nn"), col("o_n")),
          col("o_custkey_nn") === col("o_n"))
        .unionByName(row("uniqueness:o_orderkey",
          ratio(col("o_orderkey_dist"), col("o_n")),
          col("o_orderkey_dist") === col("o_n")))
        .unionByName(row("fk:lineitem.l_orderkey->orders",
          col("n_orphans").cast(DoubleType),
          col("n_orphans") === 0))
        .unionByName(row("range:l_discount[0,0.1]",
          ratio(col("l_disc_ok"), col("l_n")),
          col("l_disc_ok") === col("l_n")))
        .unionByName(row("accepted:o_orderstatus{F,O,P}",
          ratio(col("o_status_ok"), col("o_n")),
          col("o_status_ok") === col("o_n")))
        .unionByName(row("positive:l_quantity>0",
          ratio(col("l_qty_ok"), col("l_n")),
          col("l_qty_ok") === col("l_n")))
        .orderBy(col("constraint_name"))
    },
    Some("""
      SELECT 'completeness:o_custkey' AS constraint_name,
             CAST(COUNT(o_custkey) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS metric,
             COUNT(o_custkey) = COUNT(*) AS passed
      FROM orders
      UNION ALL
      SELECT 'uniqueness:o_orderkey',
             CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
             COUNT(DISTINCT o_orderkey) = COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'fk:lineitem.l_orderkey->orders',
             CAST(COUNT(*) AS DOUBLE),
             COUNT(*) = 0
      FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      UNION ALL
      SELECT 'range:l_discount[0,0.1]',
             CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE),
             SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1 ELSE 0 END) = COUNT(*)
      FROM lineitem
      UNION ALL
      SELECT 'accepted:o_orderstatus{F,O,P}',
             CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE),
             SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END) = COUNT(*)
      FROM orders
      UNION ALL
      SELECT 'positive:l_quantity>0',
             CAST(SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE),
             SUM(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) = COUNT(*)
      FROM lineitem
      ORDER BY constraint_name
    """)
  )

  /** Winsorization (robust stats): per return flag, clip extended
    * prices at the exact 1st/99th percentile and report how much mass
    * the tails carried. Percentile thresholds are EXACT and integer —
    * the value at sorted position ⌈p·n⌉ — computed with the q68
    * bucket drill-down (near-unique prices make a (flag, cents)
    * histogram row-sized, so neither a histogram group-by nor a
    * per-flag CDF window may materialize): coarse 4096-cent bucket
    * counts map-side, locate the bucket straddling ⌈p·n⌉ from the
    * tiny bucket CDF, exact ordered walk only inside that bucket.
    * Clip counts and the winsorized sum are one conditional aggregate
    * over the cached fact projection under broadcast thresholds — no
    * row-sized shuffle at any step. At 100 TB the same query swaps
    * the exact drill-down for the KLL sketch (q35) with a rank-error
    * bound; the exact form is the oracle baseline.
    */
  val q59Winsorize = GraftQuery(
    "q59_winsorize",
    (s, dir) => {
      val t = Tables(s, dir)
      val li = t.lineitem.select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .cache()
      // shared bucket CDF (built once) and ONE drill-down join for
      // BOTH thresholds: each p contributes its target bucket with a
      // marker column, the in-bucket walk partitions by (flag, b,
      // marker), and the final agg pivots the two markers back to
      // columns. The fact side is touched twice total (bucket counts
      // + the joined walk), not twice per threshold.
      val bucket = (col("cents") / 4096L).cast("long")
      val wB = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cdf = li.groupBy(col("l_returnflag"), bucket.as("b"))
        .agg(count(lit(1)).as("bcnt"))
        .withColumn("cumB", sum(col("bcnt")).over(wB))
        .withColumn("n", sum(col("bcnt"))
          .over(Window.partitionBy(col("l_returnflag"))))
      def targetOf(p: Double): DataFrame = cdf
        .filter(col("cumB") >= ceil(col("n") * p))
        .groupBy(col("l_returnflag"))
        .agg(min(struct(col("b"), (col("cumB") - col("bcnt")).as("below"),
          col("n"))).as("t"))
        .select(col("l_returnflag"), col("t.b").as("b"),
          col("t.below").as("below"), col("t.n").as("n"), lit(p).as("p"))
      val targets = targetOf(0.01).union(targetOf(0.99))
      val wIn = Window.partitionBy(col("l_returnflag"), col("b"), col("p"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val thresholds = li.withColumn("b", bucket)
        .join(broadcast(targets), Seq("l_returnflag", "b"))
        .withColumn("cum", col("below") + sum(lit(1L)).over(wIn))
        .groupBy(col("l_returnflag"))
        .agg(
          min(when(col("p") === 0.01 &&
            col("cum") >= ceil(col("n") * 0.01), col("cents"))).as("p01"),
          min(when(col("p") === 0.99 &&
            col("cum") >= ceil(col("n") * 0.99), col("cents"))).as("p99"))
      val out = li.join(broadcast(thresholds), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          first(col("p01")).as("p01_cents"),
          first(col("p99")).as("p99_cents"),
          sum(when(col("cents") < col("p01"), lit(1L)).otherwise(lit(0L)))
            .as("n_clipped_low"),
          sum(when(col("cents") > col("p99"), lit(1L)).otherwise(lit(0L)))
            .as("n_clipped_high"),
          sum(greatest(least(col("cents"), col("p99")), col("p01"))
            .cast(DecimalType(38, 0))).cast("long").as("winsorized_cents"))
        .orderBy(col("l_returnflag"))
      out.persist().count()
      li.unpersist(false)
      out
    },
    Some("""
      WITH li AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
      hist AS (
        SELECT l_returnflag, cents, COUNT(*) AS cnt
        FROM li GROUP BY 1, 2),
      cdf AS (
        SELECT l_returnflag, cents,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        FROM hist),
      lo AS (
        SELECT l_returnflag, MIN(cents) AS p01 FROM cdf
        WHERE cum >= ceil(n * 0.01) GROUP BY 1),
      hi AS (
        SELECT l_returnflag, MIN(cents) AS p99 FROM cdf
        WHERE cum >= ceil(n * 0.99) GROUP BY 1),
      th AS (SELECT lo.l_returnflag, p01, p99 FROM lo JOIN hi USING (l_returnflag))
      SELECT li.l_returnflag,
             COUNT(*) AS n,
             MIN(th.p01) AS p01_cents,
             MIN(th.p99) AS p99_cents,
             CAST(SUM(CASE WHEN li.cents < th.p01 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_low,
             CAST(SUM(CASE WHEN li.cents > th.p99 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_high,
             CAST(SUM(greatest(least(li.cents, th.p99), th.p01)) AS BIGINT)
               AS winsorized_cents
      FROM li JOIN th ON li.l_returnflag = th.l_returnflag
      GROUP BY li.l_returnflag
      ORDER BY li.l_returnflag
    """)
  )

  /** Approximate group-by via deterministic systematic sampling (the
    * AQP shape): per return flag, estimate total revenue from the 5%
    * of ORDERS with l_orderkey ≡ 0 (mod 20), scale by 20, and report
    * the exact total, the estimate, and the relative error side by
    * side. Everything is exact integer arithmetic plus ONE correctly-
    * rounded double division, so even the ESTIMATE and its error
    * hash-match across engines — the sample is a pure function of the
    * key, not an RNG. One scan: the sampled sum is a conditional
    * aggregate riding the exact aggregate's shuffle. At 100 TB this is
    * the "answer in 1/20th the IO" dashboard query; sampling by the
    * JOIN KEY (order, not row) keeps correlated lineitems together so
    * per-order math stays valid.
    */
  val q61ApproxGroupbySample = GraftQuery(
    "q61_approx_groupby_sample",
    (s, dir) => {
      val t = Tables(s, dir)
      val cents = round(col("l_extendedprice") * 100).cast("long")
      t.lineitem
        .select(col("l_returnflag"), col("l_orderkey"), cents.as("cents"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("cents").cast(DecimalType(38, 0))).cast("long")
            .as("exact_cents"),
          (sum(when(pmod(col("l_orderkey"), lit(20L)) === 0, col("cents"))
            .otherwise(lit(0L)).cast(DecimalType(38, 0))).cast("long") * 20L)
            .as("est_cents"))
        .select(col("l_returnflag"), col("n_rows"), col("exact_cents"),
          col("est_cents"),
          (abs(col("est_cents") - col("exact_cents")).cast(DoubleType) /
            col("exact_cents").cast(DoubleType)).as("rel_err"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS exact_cents,
             CAST(SUM(CASE WHEN l_orderkey % 20 = 0
                           THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) * 20 AS est_cents,
             CAST(abs(CAST(SUM(CASE WHEN l_orderkey % 20 = 0
                                    THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                                    ELSE 0 END) AS BIGINT) * 20
                      - CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT))
                  AS DOUBLE)
               / CAST(CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) AS rel_err
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  )

  /** Periodic-behavior profile: each user's modal hour of day (ties →
    * earliest hour) and how concentrated their activity is in it —
    * the "when does this user act" feature a personalization pipeline
    * derives. Two aggregations on the user key; the modal pick is one
    * struct-max (no window), the share one correctly-rounded double
    * division of exact BIGINTs.
    */
  val q62PeriodicProfile = GraftQuery(
    "q62_periodic_profile",
    (s, dir) => {
      val t = Tables(s, dir)
      val hourly = t.events
        .select(col("user_id"), hour(col("ts")).cast("long").as("hod"))
        .groupBy(col("user_id"), col("hod"))
        .agg(count(lit(1)).as("cnt"))
      hourly
        .groupBy(col("user_id"))
        .agg(
          sum(col("cnt")).as("n_events"),
          count(lit(1)).as("n_active_hours"),
          max(struct(col("cnt"), (-col("hod")).as("neg"))).as("best"))
        .select(col("user_id"), col("n_events"), col("n_active_hours"),
          (-col("best.neg")).as("modal_hour"),
          (col("best.cnt").cast(DoubleType) / col("n_events").cast(DoubleType))
            .as("modal_share"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH hourly AS (
        SELECT user_id, CAST(hour(ts) AS BIGINT) AS hod, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
      best AS (
        SELECT user_id,
               CAST(SUM(cnt) AS BIGINT) AS n_events,
               COUNT(*) AS n_active_hours,
               (array_agg(hod ORDER BY cnt DESC, hod))[1] AS modal_hour,
               (array_agg(cnt ORDER BY cnt DESC, hod))[1] AS modal_cnt
        FROM hourly GROUP BY user_id)
      SELECT user_id, n_events, n_active_hours, modal_hour,
             CAST(modal_cnt AS DOUBLE) / CAST(n_events AS DOUBLE) AS modal_share
      FROM best
      ORDER BY user_id
    """)
  )

  /** Gaps-and-islands: per-customer runs of CONSECUTIVE order days.
    * The classic streak detection — the island key is
    * day − row_number() (constant within a consecutive run), so the
    * whole operator is one customer-key window plus one island-key
    * aggregation: a single exchange serves both (the island key is a
    * function of the window's own partition+order). No self-joins, no
    * per-day grids; at 100 TB the state per customer is its distinct
    * order days — dimension-sized against the fact table.
    */
  val q63OrderStreaks = GraftQuery(
    "q63_order_streaks",
    (s, dir) => {
      val t = Tables(s, dir)
      val days = t.orders
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
        .distinct()
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      val islands = days
        .withColumn("grp", date_sub(col("d"), row_number().over(w)))
        .groupBy(col("o_custkey"), col("grp"))
        .agg(count(lit(1)).as("len"))
      islands
        .groupBy(col("o_custkey"))
        .agg(
          sum(col("len")).as("n_active_days"),
          count(lit(1)).cast("long").as("n_streaks"),
          max(col("len")).as("max_streak"))
        .orderBy(col("o_custkey"))
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders),
      islands AS (
        SELECT o_custkey,
               d - CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY d)
                        AS INTEGER) AS grp
        FROM days),
      runs AS (
        SELECT o_custkey, grp, COUNT(*) AS len
        FROM islands GROUP BY o_custkey, grp)
      SELECT o_custkey,
             CAST(SUM(len) AS BIGINT) AS n_active_days,
             CAST(COUNT(*) AS BIGINT) AS n_streaks,
             CAST(MAX(len) AS BIGINT) AS max_streak
      FROM runs
      GROUP BY o_custkey
      ORDER BY o_custkey
    """)
  )

  /** Smoothing pseudo-count for q64's leave-one-out target encoding. */
  val TargetEncodingSmoothing = 10.0

  /** Leave-one-out target encoding of o_orderpriority against
    * o_totalprice — the categorical-feature encoding a training
    * pipeline derives without label leakage: each row's own label is
    * excluded from its group mean, shrunk toward the global prior by
    * `TargetEncodingSmoothing` pseudo-observations.
    *
    * Exactness: group and global sums ride as DECIMAL(12,2) (the data
    * is 2-decimal money) and convert to double once; the per-row
    * encoding is then a FIXED chain of correctly-rounded IEEE ops —
    * ((S_g − x) + m·prior) / ((n_g − 1) + m) with this exact
    * parenthesization on both engines — so the doubles hash
    * bit-identically.
    *
    * Scale shape: the group frame is category-cardinality-sized
    * (5 rows here); it broadcasts back onto the fact scan. Two scans
    * of orders, zero shuffles of fact-table width.
    */
  val q64TargetEncoding = GraftQuery(
    "q64_target_encoding",
    (s, dir) => {
      val t = Tables(s, dir)
      val m = TargetEncodingSmoothing
      val groups = t.orders
        .groupBy(col("o_orderpriority"))
        .agg(sumMoney(col("o_totalprice")).as("s_g"),
          count(lit(1)).as("n_g"))
      val prior = t.orders
        .agg((sumMoney(col("o_totalprice")) /
          count(lit(1)).cast(DoubleType)).as("prior"))
      val enc = t.orders
        .join(broadcast(groups), Seq("o_orderpriority"))
        .crossJoin(broadcast(prior))
        .select(col("o_orderkey"), col("o_orderpriority"),
          (((col("s_g") - col("o_totalprice")) + lit(m) * col("prior")) /
            ((col("n_g") - lit(1L)).cast(DoubleType) + lit(m)))
            .as("loo_enc"))
      enc.orderBy(col("o_orderkey"))
    },
    Some("""
      WITH g AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS s_g,
               COUNT(*) AS n_g
        FROM orders GROUP BY o_orderpriority),
      p AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS prior
        FROM orders)
      SELECT o.o_orderkey, o.o_orderpriority,
             ((g.s_g - o.o_totalprice) + (10.0 * p.prior))
               / (CAST(g.n_g - 1 AS DOUBLE) + 10.0) AS loo_enc
      FROM orders o JOIN g USING (o_orderpriority) CROSS JOIN p
      ORDER BY o.o_orderkey
    """)
  )

  /** Pareto frontier (skyline) of parts: minimize retail price,
    * maximize size; a part is dominated if some part is no more
    * expensive AND no smaller, strictly better in at least one.
    * Naive dominance is O(n²); here the frontier falls out of the
    * price-DOMAIN frame: per distinct price keep the max size, then a
    * running max over prices sorted ascending gives "best size among
    * strictly cheaper" — a part survives iff it has the max size at
    * its own price AND beats that running max. One domain-sized
    * window (distinct prices ≪ rows) + a broadcast join back to the
    * scan; equal (price, size) pairs survive together, as dominance
    * requires strictness.
    */
  val q66ParetoFrontier = GraftQuery(
    "q66_pareto_frontier",
    (s, dir) => {
      val t = Tables(s, dir)
      val byPrice = t.part
        .groupBy(col("p_retailprice"))
        .agg(max(col("p_size")).as("pmax"))
      val w = Window.orderBy(col("p_retailprice"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val levels = byPrice
        .withColumn("prevmax", max(col("pmax")).over(w))
      t.part
        .join(broadcast(levels), Seq("p_retailprice"))
        .filter(col("p_size") === col("pmax") &&
          (col("prevmax").isNull || col("p_size") > col("prevmax")))
        .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      WITH lvl AS (
        SELECT p_retailprice, MAX(p_size) AS pmax
        FROM part GROUP BY p_retailprice),
      lvl2 AS (
        SELECT p_retailprice, pmax,
               MAX(pmax) OVER (ORDER BY p_retailprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        FROM lvl)
      SELECT p.p_partkey, p.p_retailprice, p.p_size
      FROM part p JOIN lvl2 l USING (p_retailprice)
      WHERE p.p_size = l.pmax
        AND (l.prevmax IS NULL OR p.p_size > l.prevmax)
      ORDER BY p.p_partkey
    """)
  )

  /** Robust outlier profile per return flag: median and MAD (median
    * absolute deviation) of the price in exact cents, plus the count
    * beyond 3 MADs — the robust alternative to q48's z-score flags
    * (one wild value cannot drag the threshold). Median is the
    * type-1 quantile (smallest value whose CDF reaches ⌈n/2⌉),
    * stated identically in the oracle.
    *
    * Scale shape: near-unique prices make a (flag, cents) histogram
    * row-sized (594k distinct at sf0.1), so neither a histogram
    * group-by nor a per-flag CDF window may ever materialize — the
    * median comes from a two-level drill-down straight off the
    * cached fact projection: count coarse 4096-cent buckets
    * (domain-sized, map-side combined), find the bucket straddling
    * ⌈n/2⌉ from the tiny bucket CDF, then run the exact ordered walk
    * only over the rows INSIDE that bucket (~1/2600 of the data).
    * The MAD reuses the same drill-down over |cents − med| computed
    * map-side under a broadcast of the medians; the outlier count is
    * one conditional aggregate. No row-sized shuffle exists at any
    * step, and no reducer sorts more than one bucket.
    */
  val q68MadOutliers = GraftQuery(
    "q68_mad_outliers",
    (s, dir) => {
      val t = Tables(s, dir)
      val cents = round(col("l_extendedprice") * 100).cast("long")
      // NOT fanned out: ABAB at sf0.1 measured 3.6 s (plain) vs 5.5 s
      // (fanOut before cache) — the drill-down's own exchanges already
      // parallelize the heavy passes, so the extra round-robin shuffle
      // of the whole projection is pure cost here
      val li = t.lineitem
        .select(col("l_returnflag"), cents.as("cents"))
        .cache()
      // exact type-1 median of `vcol` per flag via bucket drill-down
      def typed1Median(rows: DataFrame, vcol: String): DataFrame = {
        val bucket = (col(vcol) / 4096L).cast("long")
        val bucketed = rows.groupBy(col("l_returnflag"), bucket.as("b"))
          .agg(count(lit(1)).as("bcnt"))
        val wB = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val target = bucketed
          .withColumn("cumB", sum(col("bcnt")).over(wB))
          .withColumn("n", sum(col("bcnt"))
            .over(Window.partitionBy(col("l_returnflag"))))
          .filter(col("cumB") >= ceil(col("n") / 2.0))
          .groupBy(col("l_returnflag"))
          .agg(min(struct(col("b"), (col("cumB") - col("bcnt")).as("below"),
            col("n"))).as("t"))
          .select(col("l_returnflag"), col("t.b").as("b"),
            col("t.below").as("below"), col("t.n").as("n"))
        val wIn = Window.partitionBy(col("l_returnflag")).orderBy(col(vcol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rows.withColumn("b", bucket)
          .join(broadcast(target), Seq("l_returnflag", "b"))
          .withColumn("cum", col("below") + sum(lit(1L)).over(wIn))
          .groupBy(col("l_returnflag"))
          .agg(min(when(col("cum") >= ceil(col("n") / 2.0), col(vcol)))
            .as("med"), first(col("n")).as("n"))
      }
      val med = typed1Median(li, "cents")
        .select(col("l_returnflag"), col("med").as("median_cents"), col("n"))
      val devRows = li.join(broadcast(med), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          abs(col("cents") - col("median_cents")).as("dev"))
      val mad = typed1Median(devRows, "dev")
        .select(col("l_returnflag"), col("med").as("mad_cents"))
      val out = devRows.join(broadcast(mad), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(first(col("mad_cents")).as("mad_cents"),
          sum(when(col("dev") > lit(3) * col("mad_cents"), lit(1L))
            .otherwise(lit(0L))).as("n_outliers"))
        .join(med.select(col("l_returnflag"), col("median_cents"), col("n")),
          Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"), col("median_cents"),
          col("mad_cents"), col("n_outliers"))
        .orderBy(col("l_returnflag"))
      out.persist().count()
      li.unpersist(false)
      out
    },
    Some("""
      WITH hist AS (
        SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2),
      cdf AS (
        SELECT l_returnflag, cents, cnt,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY cents
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        FROM hist),
      med AS (
        SELECT l_returnflag, MIN(cents) AS median_cents, MIN(n) AS n
        FROM cdf WHERE cum >= ceil(n / 2.0) GROUP BY 1),
      dev AS (
        SELECT h.l_returnflag, abs(h.cents - m.median_cents) AS d,
               SUM(h.cnt) AS cnt
        FROM hist h JOIN med m USING (l_returnflag)
        GROUP BY 1, 2),
      dcdf AS (
        SELECT l_returnflag, d, cnt,
               SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
        FROM dev),
      mad AS (
        SELECT l_returnflag, MIN(d) AS mad_cents
        FROM dcdf WHERE cum >= ceil(n / 2.0) GROUP BY 1)
      SELECT m.l_returnflag,
             CAST(m.n AS BIGINT) AS n,
             m.median_cents,
             x.mad_cents,
             CAST(SUM(CASE WHEN dev.d > 3 * x.mad_cents THEN dev.cnt
                           ELSE 0 END) AS BIGINT) AS n_outliers
      FROM med m
      JOIN mad x USING (l_returnflag)
      JOIN dev USING (l_returnflag)
      GROUP BY 1, 2, 3, 4
      ORDER BY m.l_returnflag
    """)
  )

  /** Two-sample Welch t-test: does mean extended price differ between
    * returned ('R') and acknowledged ('A') lineitems? The standard
    * A/B-test primitive, computed entirely from per-group exact
    * moments: n (BIGINT), Σcents (BIGINT), Σcents² (DECIMAL(38) —
    * cents² alone reaches 10¹⁴, so the sum overflows BIGINT at sf≥1).
    * One map-side-combined aggregation over the fact scan; the t
    * statistic and Welch–Satterthwaite df are a fixed correctly-
    * rounded double op chain over those exact moments (sqrt is
    * IEEE-correctly-rounded in both engines), so the doubles hash
    * identically. No sort, no window, no second pass.
    */
  val q71WelchTtest = GraftQuery(
    "q71_welch_ttest",
    (s, dir) => {
      val t = Tables(s, dir)
      val m = t.lineitem
        .filter(col("l_returnflag").isin("R", "A"))
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("cents")).as("s"),
          sum((col("cents") * col("cents")).cast(DecimalType(38, 0))).as("q"))
      // pivot the two groups side by side (tiny frame: 2 rows)
      val r = m.filter(col("l_returnflag") === "R")
        .select(col("n").as("n1"), col("s").as("s1"), col("q").as("q1"))
      val a = m.filter(col("l_returnflag") === "A")
        .select(col("n").as("n2"), col("s").as("s2"), col("q").as("q2"))
      val j = r.crossJoin(a)
      def dbl(c: Column): Column = c.cast(DoubleType)
      def meanC(sc: Column, nc: Column): Column = dbl(sc) / dbl(nc)
      def varC(qc: Column, sc: Column, nc: Column): Column =
        (dbl(qc) - dbl(sc) * dbl(sc) / dbl(nc)) / (dbl(nc) - lit(1.0))
      val se1 = varC(col("q1"), col("s1"), col("n1")) / dbl(col("n1"))
      val se2 = varC(col("q2"), col("s2"), col("n2")) / dbl(col("n2"))
      val se = se1 + se2
      j.select(
        col("n1"), col("n2"),
        (meanC(col("s1"), col("n1")) / lit(100.0)).as("mean_r"),
        (meanC(col("s2"), col("n2")) / lit(100.0)).as("mean_a"),
        ((meanC(col("s1"), col("n1")) - meanC(col("s2"), col("n2"))) /
          sqrt(se)).as("t_stat"),
        ((se * se) /
          (se1 * se1 / (dbl(col("n1")) - lit(1.0)) +
            se2 * se2 / (dbl(col("n2")) - lit(1.0)))).as("welch_df"))
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s,
               SUM(CAST(round(l_extendedprice * 100) AS HUGEINT)
                   * CAST(round(l_extendedprice * 100) AS HUGEINT)) AS q
        FROM lineitem WHERE l_returnflag IN ('R', 'A')
        GROUP BY 1),
      j AS (
        SELECT r.n AS n1, CAST(r.s AS DOUBLE) AS s1, CAST(r.q AS DOUBLE) AS q1,
               a.n AS n2, CAST(a.s AS DOUBLE) AS s2, CAST(a.q AS DOUBLE) AS q2
        FROM (SELECT * FROM m WHERE l_returnflag = 'R') r,
             (SELECT * FROM m WHERE l_returnflag = 'A') a),
      v AS (
        SELECT n1, n2, s1, s2,
               (q1 - s1 * s1 / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
                 / CAST(n1 AS DOUBLE) AS se1,
               (q2 - s2 * s2 / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)
                 / CAST(n2 AS DOUBLE) AS se2
        FROM j)
      SELECT n1, n2,
             s1 / CAST(n1 AS DOUBLE) / 100.0 AS mean_r,
             s2 / CAST(n2 AS DOUBLE) / 100.0 AS mean_a,
             (s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
               / sqrt(se1 + se2) AS t_stat,
             ((se1 + se2) * (se1 + se2))
               / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
                  + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)) AS welch_df
      FROM v
    """)
  )

  /** RFM customer segmentation: score every customer 1–5 on Recency
    * (days since last order), Frequency (order count), and Monetary
    * (lifetime spend), then profile the resulting segments. Scores
    * come from exact quintile THRESHOLDS (the `percentile` aggregate
    * over the customer-metric frame — same type-7 interpolation as
    * DuckDB's `quantile_cont`, the q25-proven pairing) rather than a
    * global ntile window: a whole-table ntile is one reducer, while
    * thresholds are one aggregate + a broadcast of 12 doubles, so the
    * scoring pass stays embarrassingly parallel at any customer
    * count. Ties at a threshold share a score (standard quantile-RFM
    * semantics, identical in both engines over identical doubles).
    * All metrics are exact integers (epoch-day, counts, cents) before
    * the one cast into the comparison.
    */
  val q73RfmSegments = GraftQuery(
    "q73_rfm_segments",
    (s, dir) => {
      val t = Tables(s, dir)
      val rfm = t.orders
        .groupBy(col("o_custkey"))
        .agg(
          max(unix_date(col("o_orderdate").cast("date"))).cast("long").as("last_day"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val th = rfm.agg(
        expr("percentile(last_day, 0.2)").as("r20"),
        expr("percentile(last_day, 0.4)").as("r40"),
        expr("percentile(last_day, 0.6)").as("r60"),
        expr("percentile(last_day, 0.8)").as("r80"),
        expr("percentile(freq, 0.2)").as("f20"),
        expr("percentile(freq, 0.4)").as("f40"),
        expr("percentile(freq, 0.6)").as("f60"),
        expr("percentile(freq, 0.8)").as("f80"),
        expr("percentile(cents, 0.2)").as("m20"),
        expr("percentile(cents, 0.4)").as("m40"),
        expr("percentile(cents, 0.6)").as("m60"),
        expr("percentile(cents, 0.8)").as("m80"))
      def score(v: Column, q1: Column, q2: Column, q3: Column, q4: Column) =
        (lit(1L) + (v > q1).cast("long") + (v > q2).cast("long") +
          (v > q3).cast("long") + (v > q4).cast("long"))
      val scored = rfm.crossJoin(broadcast(th))
        .select(col("o_custkey"), col("cents"),
          score(col("last_day").cast(DoubleType),
            col("r20"), col("r40"), col("r60"), col("r80")).as("r_score"),
          score(col("freq").cast(DoubleType),
            col("f20"), col("f40"), col("f60"), col("f80")).as("f_score"),
          score(col("cents").cast(DoubleType),
            col("m20"), col("m40"), col("m60"), col("m80")).as("m_score"))
      scored
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("seg_cents"))
        .select(col("r_score"), col("f_score"), col("m_score"),
          col("n_customers"),
          (col("seg_cents").cast(DoubleType) / lit(100.0)).as("seg_revenue"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },
    Some("""
      WITH rfm2 AS (
        SELECT o_custkey,
               CAST(MAX(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE))) AS BIGINT) AS last_day,
               COUNT(*) AS freq,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
      ), th AS (
        SELECT quantile_cont(last_day, 0.2) AS r20, quantile_cont(last_day, 0.4) AS r40,
               quantile_cont(last_day, 0.6) AS r60, quantile_cont(last_day, 0.8) AS r80,
               quantile_cont(freq, 0.2) AS f20, quantile_cont(freq, 0.4) AS f40,
               quantile_cont(freq, 0.6) AS f60, quantile_cont(freq, 0.8) AS f80,
               quantile_cont(cents, 0.2) AS m20, quantile_cont(cents, 0.4) AS m40,
               quantile_cont(cents, 0.6) AS m60, quantile_cont(cents, 0.8) AS m80
        FROM rfm2
      ), scored AS (
        SELECT o_custkey, cents,
               1 + CAST(CAST(last_day AS DOUBLE) > r20 AS BIGINT)
                 + CAST(CAST(last_day AS DOUBLE) > r40 AS BIGINT)
                 + CAST(CAST(last_day AS DOUBLE) > r60 AS BIGINT)
                 + CAST(CAST(last_day AS DOUBLE) > r80 AS BIGINT) AS r_score,
               1 + CAST(CAST(freq AS DOUBLE) > f20 AS BIGINT)
                 + CAST(CAST(freq AS DOUBLE) > f40 AS BIGINT)
                 + CAST(CAST(freq AS DOUBLE) > f60 AS BIGINT)
                 + CAST(CAST(freq AS DOUBLE) > f80 AS BIGINT) AS f_score,
               1 + CAST(CAST(cents AS DOUBLE) > m20 AS BIGINT)
                 + CAST(CAST(cents AS DOUBLE) > m40 AS BIGINT)
                 + CAST(CAST(cents AS DOUBLE) > m60 AS BIGINT)
                 + CAST(CAST(cents AS DOUBLE) > m80 AS BIGINT) AS m_score
        FROM rfm2 CROSS JOIN th
      )
      SELECT r_score, f_score, m_score,
             COUNT(*) AS n_customers,
             CAST(SUM(cents) AS DOUBLE) / 100.0 AS seg_revenue
      FROM scored
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """)
  )

  /** PSI drift parameters: equal-width bins over the price domain,
    * reference period = orders before [[PsiPivotYear]], Laplace +1
    * smoothing so empty bins stay finite, and the conventional 0.1
    * "investigate" threshold.
    */
  val PsiPivotYear = 1998
  val PsiBinWidth = 50000.0
  val PsiBins = 10
  val PsiThreshold = 0.1

  /** Population-stability-index drift monitor — the numeric complement
    * of q74's schema drift: bucket a metric (order value) into fixed
    * equal-width bins, compare the reference-period distribution to
    * the current period, and report per-bin PSI terms plus the total
    * and the alert bit. PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref) with
    * Laplace-smoothed proportions.
    *
    * Scale: one scan + one partial-aggregated group-by on a 10-value
    * key; the totals and the PSI sum ride broadcast cross joins of
    * single-row frames. Fixed bin EDGES (not quantiles) keep the
    * monitor O(scan) and make bucket ids bit-identical across
    * engines; per-bin terms are rounded then decimal-summed so the
    * total is add-order-free.
    */
  val q75PsiDrift = GraftQuery(
    "q75_psi_drift",
    (s, dir) => {
      import graft.functions.GraftFunctions.sumDec
      val t = Tables(s, dir)
      val o = t.orders.select(
        (year(col("o_orderdate")) >= PsiPivotYear).as("cur"),
        least(floor(col("o_totalprice") / PsiBinWidth), lit(PsiBins - 1.0))
          .cast("long").as("bucket"))
      // full bin spine: a bin empty in BOTH periods still carries a
      // (smoothed) PSI term whenever the period sizes differ, and the
      // monitor's row count must be PsiBins regardless of the data
      val spine = s.range(PsiBins.toLong).select(col("id").as("bucket"))
      val counts = spine.join(
        o.groupBy(col("bucket")).agg(
          count(when(!col("cur"), 1)).as("r0"),
          count(when(col("cur"), 1)).as("c0")),
        Seq("bucket"), "left_outer")
        .select(col("bucket"),
          coalesce(col("r0"), lit(0L)).as("n_ref"),
          coalesce(col("c0"), lit(0L)).as("n_cur"))
      val tot = counts.agg(sum(col("n_ref")).as("nr"), sum(col("n_cur")).as("nc"))
      val pc = (col("n_cur") + 1).cast("double") /
        (col("nc") + PsiBins).cast("double")
      val pr = (col("n_ref") + 1).cast("double") /
        (col("nr") + PsiBins).cast("double")
      val terms = counts.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          round((pc - pr) * log(pc / pr), 6).as("psi_term"))
      val total = terms.agg(sumDec(col("psi_term")).as("psi_total"))
      terms.crossJoin(broadcast(total))
        .select(col("bucket"), col("n_ref"), col("n_cur"), col("psi_term"),
          col("psi_total"), (col("psi_total") >= PsiThreshold).as("drifted"))
        .orderBy(col("bucket"))
    },
    Some(s"""
      WITH o AS (
        SELECT year(o_orderdate) >= $PsiPivotYear AS cur,
               CAST(least(floor(o_totalprice / $PsiBinWidth),
                          ${PsiBins - 1}.0) AS BIGINT) AS bucket
        FROM orders),
      observed AS (
        SELECT bucket,
               COUNT(*) FILTER (WHERE NOT cur) AS n_ref,
               COUNT(*) FILTER (WHERE cur) AS n_cur
        FROM o GROUP BY bucket),
      counts AS (
        SELECT r.range AS bucket,
               coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
        FROM range(0, $PsiBins) r LEFT JOIN observed ON observed.bucket = r.range),
      tot AS (SELECT SUM(n_ref) AS nr, SUM(n_cur) AS nc FROM counts),
      terms AS (
        SELECT bucket, n_ref, n_cur,
               round((CAST(n_cur + 1 AS DOUBLE) / CAST(nc + $PsiBins AS DOUBLE)
                      - CAST(n_ref + 1 AS DOUBLE) / CAST(nr + $PsiBins AS DOUBLE))
                 * ln((CAST(n_cur + 1 AS DOUBLE) / CAST(nc + $PsiBins AS DOUBLE))
                      / (CAST(n_ref + 1 AS DOUBLE) / CAST(nr + $PsiBins AS DOUBLE))), 6)
                 AS psi_term
        FROM counts CROSS JOIN tot),
      total AS (SELECT CAST(SUM(CAST(psi_term AS DECIMAL(25,6))) AS DOUBLE)
                  AS psi_total FROM terms)
      SELECT bucket, CAST(n_ref AS BIGINT) AS n_ref,
             CAST(n_cur AS BIGINT) AS n_cur, psi_term, psi_total,
             psi_total >= $PsiThreshold AS drifted
      FROM terms CROSS JOIN total
      ORDER BY bucket
    """)
  )

  /** Marketing attribution over sessionized events: each converting
    * session (one with a purchase) credits its purchase revenue to a
    * channel under TWO models computed from one session frame —
    * first-touch (the session's opening event type) and last-touch
    * (the last event type strictly before the first purchase;
    * 'direct' when the purchase opens the session). Output is one row
    * per (model, channel): conversions + money-exact attributed
    * revenue. Plan shape: the same single user_id exchange as the
    * sessionized funnel feeds the lag window, the session-id running
    * sum, both per-session windows, and the per-session rollup; the
    * two model aggregations then reduce a session-grain frame (tiny)
    * and union. Nothing scans events twice.
    */
  val q83Attribution = GraftQuery(
    "q83_attribution",
    (s, dir) => {
      val t = Tables(s, dir)
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = t.events
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts"), col("value"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
        .withColumn("new_session",
          (col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > SessionGapMicros)
            .cast("long"))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
      val wSess = Window.partitionBy(col("user_id"), col("session_id"))
      val wSessOrd = wSess.orderBy(col("ts"), col("event_id"))
      val perSession = sess
        .withColumn("first_ch", first(col("event_type")).over(
          wSessOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("t_fp",
          min(when(col("event_type") === "purchase", col("ts"))).over(wSess))
        .withColumn("last_pre", max(when(col("ts") < col("t_fp"),
          struct(col("ts"), col("event_id"), col("event_type")))).over(wSess))
        .filter(col("t_fp").isNotNull)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          first(col("first_ch")).as("first_touch"),
          coalesce(first(col("last_pre.event_type")), lit("direct"))
            .as("last_touch"),
          sum(when(col("event_type") === "purchase", dec2(col("value"))))
            .as("rev"))
      val byFirst = perSession.groupBy(col("first_touch").as("channel"))
        .agg(count(lit(1)).as("n_conv"),
          sum(col("rev")).cast(DoubleType).as("revenue"))
        .withColumn("model", lit("first_touch"))
      val byLast = perSession.groupBy(col("last_touch").as("channel"))
        .agg(count(lit(1)).as("n_conv"),
          sum(col("rev")).cast(DoubleType).as("revenue"))
        .withColumn("model", lit("last_touch"))
      byFirst.unionByName(byLast)
        .select(col("model"), col("channel"), col("n_conv"), col("revenue"))
        .orderBy(col("model"), col("channel"))
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, event_id, event_type, ts, value,
               lag(epoch_us(ts)) OVER w AS prev_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT *, CAST(SUM(CASE WHEN prev_us IS NULL
                      OR epoch_us(ts) - prev_us > $SessionGapMicros
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM e),
      marked AS (
        SELECT *,
               first_value(event_type) OVER (
                 PARTITION BY user_id, session_id
                 ORDER BY ts, event_id) AS first_ch,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
                 PARTITION BY user_id, session_id) AS t_fp,
               max(CASE WHEN ts < t_fp_pre THEN
                     {t: ts, i: event_id, c: event_type} END) OVER (
                 PARTITION BY user_id, session_id) AS last_pre
        FROM (SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                OVER (PARTITION BY user_id, session_id) AS t_fp_pre
              FROM sess)),
      per_session AS (
        SELECT user_id, session_id,
               MIN(first_ch) AS first_touch,
               coalesce(MIN(last_pre.c), 'direct') AS last_touch,
               SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(12,2)) END) AS rev
        FROM marked
        WHERE t_fp IS NOT NULL
        GROUP BY 1, 2)
      SELECT model, channel, n_conv, revenue FROM (
        SELECT 'first_touch' AS model, first_touch AS channel,
               COUNT(*) AS n_conv, CAST(SUM(rev) AS DOUBLE) AS revenue
        FROM per_session GROUP BY 2
        UNION ALL
        SELECT 'last_touch', last_touch,
               COUNT(*), CAST(SUM(rev) AS DOUBLE)
        FROM per_session GROUP BY 2)
      ORDER BY model, channel
    """)
  )

  /** User-journey Markov transitions: per-user event streams (ordered
    * by ts with event_id tie-break) yield (state → next-state) pairs
    * via one lead window; transition counts and row-normalized
    * probabilities follow from two hash aggregations. The transition
    * matrix is the input to journey simulation, removal-effect
    * attribution, and next-event prediction. One shuffle on user_id
    * for the window, then aggregation on the (from,to) pair — at
    * 100 TB both keys are low-cardinality relative to events, so the
    * second agg is map-side-combined to almost nothing. Probabilities
    * are exact-integer counts divided once and rounded — bit-stable.
    */
  val q84MarkovTransitions = GraftQuery(
    "q84_markov_transitions",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = t.events
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
      val counts = pairs.groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val wFrom = Window.partitionBy(col("from_type"))
      counts
        .withColumn("n_from", sum(col("n")).over(wFrom))
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast(DoubleType) / col("n_from"), 6).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""
      WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
        FROM events),
      c AS (
        SELECT event_type AS from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2)
      SELECT from_type, to_type, n,
             round(CAST(n AS DOUBLE) /
               SUM(n) OVER (PARTITION BY from_type), 6) AS p
      FROM c
      ORDER BY from_type, to_type
    """)
  )

  /** Point-in-time (PIT) SCD2 dimension lookup: every lineitem (fact,
    * keyed by ship date) is joined to the customer dimension VERSION
    * that was open at that instant — the version chain being the q49
    * SCD2 frame (one version per order, tie-broken by order key, so
    * the dimension is deduped to one row per (custkey, valid_from)
    * with the max order key winning the tie). This is the warehouse
    * "repeatable training snapshot" join — a feature-store
    * point-in-time lookup is exactly this shape — and it runs on the
    * engine's NATIVE as-of operator ([[graft.plans.AsOfJoin]]): both
    * sides hash-partition by customer and sort by time once, then a
    * single merge pass carries O(1) state; no interval blow-up, no
    * window over the fact table. DuckDB's built-in ASOF LEFT JOIN is
    * the oracle.
    */
  val q86PitScd2Join = GraftQuery(
    "q86_pit_scd2_join",
    (s, dir) => {
      import graft.plans.AsOf
      val t = Tables(s, dir)
      val dim = t.orders
        .groupBy(col("o_custkey").as("v_custkey"),
          col("o_orderdate").as("valid_from"))
        .agg(max(col("o_orderkey")).as("version_order"))
      val fact = t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_shipdate"))
      AsOf.join(fact, dim,
        leftKeys = Seq("o_custkey"), rightKeys = Seq("v_custkey"),
        leftTime = "l_shipdate", rightTime = "valid_from")
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          tsString(col("l_shipdate")).as("ship_s"),
          col("version_order"),
          tsString(col("valid_from")).as("valid_from_s"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      WITH dim AS (
        SELECT o_custkey AS v_custkey, o_orderdate AS valid_from,
               MAX(o_orderkey) AS version_order
        FROM orders GROUP BY 1, 2),
      fact AS (
        SELECT o.o_custkey, l.l_orderkey,
               CAST(l.l_linenumber AS BIGINT) AS l_linenumber, l.l_shipdate
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      SELECT f.l_orderkey, f.l_linenumber, f.o_custkey,
             strftime(f.l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_s,
             d.version_order,
             strftime(d.valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from_s
      FROM fact f ASOF LEFT JOIN dim d
        ON f.o_custkey = d.v_custkey AND f.l_shipdate >= d.valid_from
      ORDER BY f.l_orderkey, f.l_linenumber
    """)
  )

  /** CUPED variance-reduced experiment readout (Deng et al. 2013):
    * users are split into deterministic arms (user_id parity), the
    * pre-period covariate is each user's spend before the cutoff and
    * the outcome their spend after it. θ = cov(pre, post)/var(pre)
    * comes from EXACT integer-cent moments accumulated in one pass
    * (the q51 discipline: Σx, Σy BIGINT; Σxy, Σx² through
    * DECIMAL(38,0); doubles only in the closed-form tail, where both
    * engines evaluate the identical correctly-rounded expression), so
    * the adjusted effect
    * `(post̄_T − post̄_C) − θ·(prē_T − prē_C)` is bit-identical
    * across engines. Shape at 100 TB: one user-keyed partial
    * aggregation then a single-row reduce — no second scan, no
    * per-user double arithmetic.
    */
  val q87Cuped = GraftQuery(
    "q87_cuped",
    (s, dir) => {
      val t = Tables(s, dir)
      val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
      val cents = round(col("value") * 100).cast("long")
      val perUser = t.events
        .select(col("user_id"), cents.as("cents"),
          (col("ts") < cutoff).as("is_pre"))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("is_pre"), col("cents")).otherwise(0L)).as("pre"),
          sum(when(!col("is_pre"), col("cents")).otherwise(0L)).as("post"))
        .withColumn("arm", pmod(col("user_id"), lit(2L)))
      val dec = DecimalType(38, 0)
      val m = perUser.agg(
        count(lit(1)).as("n"),
        sum(col("pre")).as("spre"),
        sum(col("post")).as("spost"),
        // cast an operand BEFORE the multiply: a long·long product
        // wraps silently past 2⁶³ (per-user cent sums at real scale),
        // while decimal·long widens exactly
        sum(col("pre").cast(dec) * col("post")).as("spp"),
        sum(col("pre").cast(dec) * col("pre")).as("spre2"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("arm") === 1, col("post")).otherwise(0L)).as("spost_t"),
        sum(when(col("arm") === 0, col("post")).otherwise(0L)).as("spost_c"),
        sum(when(col("arm") === 1, col("pre")).otherwise(0L)).as("spre_t"),
        sum(when(col("arm") === 0, col("pre")).otherwise(0L)).as("spre_c"))
      val d = DoubleType
      m.select(col("n_t"), col("n_c"), col("spost_t"), col("spost_c"),
          col("spre_t"), col("spre_c"),
          col("n").cast(d).as("n_d"),
          col("spre").cast(d).as("spre_d"), col("spost").cast(d).as("spost_d"),
          col("spp").cast(d).as("spp_d"), col("spre2").cast(d).as("spre2_d"))
        .withColumn("theta",
          (col("n_d") * col("spp_d") - col("spre_d") * col("spost_d")) /
          (col("n_d") * col("spre2_d") - col("spre_d") * col("spre_d")))
        .withColumn("effect_raw",
          col("spost_t").cast(d) / col("n_t").cast(d) -
          col("spost_c").cast(d) / col("n_c").cast(d))
        .withColumn("effect_cuped",
          col("effect_raw") - col("theta") *
            (col("spre_t").cast(d) / col("n_t").cast(d) -
             col("spre_c").cast(d) / col("n_c").cast(d)))
        .select(col("n_t"), col("n_c"), col("spost_t"), col("spost_c"),
          col("spre_t"), col("spre_c"), col("theta"),
          col("effect_raw"), col("effect_cuped"))
    },
    Some("""
      WITH e AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               ts < TIMESTAMP '2024-01-15 00:00:00' AS is_pre
        FROM events),
      u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN is_pre THEN cents ELSE 0 END) AS BIGINT) AS pre,
               CAST(SUM(CASE WHEN NOT is_pre THEN cents ELSE 0 END) AS BIGINT) AS post,
               user_id % 2 AS arm
        FROM e GROUP BY user_id),
      m AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(pre) AS BIGINT) AS spre,
               CAST(SUM(post) AS BIGINT) AS spost,
               SUM(CAST(pre AS DECIMAL(38,0)) * post) AS spp,
               SUM(CAST(pre AS DECIMAL(38,0)) * pre) AS spre2,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN arm = 1 THEN post ELSE 0 END) AS BIGINT) AS spost_t,
               CAST(SUM(CASE WHEN arm = 0 THEN post ELSE 0 END) AS BIGINT) AS spost_c,
               CAST(SUM(CASE WHEN arm = 1 THEN pre ELSE 0 END) AS BIGINT) AS spre_t,
               CAST(SUM(CASE WHEN arm = 0 THEN pre ELSE 0 END) AS BIGINT) AS spre_c
        FROM u)
      SELECT n_t, n_c, spost_t, spost_c, spre_t, spre_c,
             (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                - CAST(spre AS DOUBLE) * CAST(spost AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(spre2 AS DOUBLE)
                - CAST(spre AS DOUBLE) * CAST(spre AS DOUBLE)) AS theta,
             CAST(spost_t AS DOUBLE) / CAST(n_t AS DOUBLE)
               - CAST(spost_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS effect_raw,
             (CAST(spost_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                - CAST(spost_c AS DOUBLE) / CAST(n_c AS DOUBLE))
             - ((CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                  - CAST(spre AS DOUBLE) * CAST(spost AS DOUBLE)) /
                (CAST(n AS DOUBLE) * CAST(spre2 AS DOUBLE)
                  - CAST(spre AS DOUBLE) * CAST(spre AS DOUBLE)))
               * (CAST(spre_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                  - CAST(spre_c AS DOUBLE) / CAST(n_c AS DOUBLE)) AS effect_cuped
      FROM m
    """)
  )

  /** Model-eval gains/lift curve over a deterministic propensity
    * score: users are scored by pre-cutoff activity (event count),
    * labelled by whether they purchased after the cutoff, and the
    * curve reports, AT EACH DISTINCT SCORE THRESHOLD walking down the
    * score, the cumulative population, captured positives, capture
    * rate and lift vs the base rate. The scale shape matters: a
    * global ntile window is one reducer over every user, so instead
    * users partial-aggregate BY SCORE LEVEL (map-side combined) and
    * the running sums run over the distinct score levels — a frame
    * whose size is the score cardinality (dozens), not the user
    * count. All counts integer; lift/capture are single divisions of
    * exact integer products, bit-identical across engines.
    */
  val q88ScoreLift = GraftQuery(
    "q88_score_lift",
    (s, dir) => {
      val t = Tables(s, dir)
      val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
      val perUser = t.events.groupBy(col("user_id")).agg(
        sum(when(col("ts") < cutoff, 1L).otherwise(0L)).as("score"),
        max(when(col("ts") >= cutoff && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("label"))
      val byScore = perUser.groupBy(col("score")).agg(
        count(lit(1)).as("n_at"), sum(col("label")).as("pos_at"))
      val tot = perUser.agg(count(lit(1)).as("n_total"),
        sum(col("label")).as("pos_total"))
      // unpartitioned window is safe HERE: its input is one row per
      // distinct score level, already aggregated
      val w = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byScore
        .withColumn("cum_n", sum(col("n_at")).over(w))
        .withColumn("cum_pos", sum(col("pos_at")).over(w))
        .crossJoin(tot)
        .select(col("score"), col("n_at"), col("pos_at"),
          col("cum_n"), col("cum_pos"),
          (col("cum_pos").cast(DoubleType) / col("pos_total").cast(DoubleType))
            .as("capture"),
          ((col("cum_pos") * col("n_total")).cast(DoubleType) /
            (col("cum_n") * col("pos_total")).cast(DoubleType)).as("lift"))
        .orderBy(col("score").desc)
    },
    Some("""
      WITH u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                             THEN 1 ELSE 0 END) AS BIGINT) AS score,
               CAST(MAX(CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00'
                              AND event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS label
        FROM events GROUP BY user_id),
      by_score AS (
        SELECT score, COUNT(*) AS n_at, CAST(SUM(label) AS BIGINT) AS pos_at
        FROM u GROUP BY score),
      tot AS (
        SELECT COUNT(*) AS n_total, CAST(SUM(label) AS BIGINT) AS pos_total
        FROM u),
      c AS (
        SELECT score, n_at, pos_at,
               CAST(SUM(n_at) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
               CAST(SUM(pos_at) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
        FROM by_score)
      SELECT c.score, c.n_at, c.pos_at, c.cum_n, c.cum_pos,
             CAST(c.cum_pos AS DOUBLE) / CAST(t.pos_total AS DOUBLE) AS capture,
             CAST(c.cum_pos * t.n_total AS DOUBLE) /
               CAST(c.cum_n * t.pos_total AS DOUBLE) AS lift
      FROM c CROSS JOIN tot t
      ORDER BY c.score DESC
    """)
  )

  /** Weighted percentiles (median and p90 of price, weighted by
    * quantity) per return flag, EXACT and integer end-to-end — the
    * lower weighted quantile: the smallest cent value whose
    * cumulative weight crosses the threshold (`2·cum ≥ tot` for the
    * median, `10·cum ≥ 9·tot` for p90), an integer compare with no
    * interpolation ambiguity. Near-unique prices make a (flag, cents)
    * level frame row-sized (~198k levels PER FLAG at sf0.1), so a
    * per-flag CDF window is one reducer over the partition — instead
    * this runs the WEIGHTED analog of q68's bucket drill-down: coarse
    * 4096-cent buckets accumulate weight MASS (domain-sized,
    * map-side combined), the tiny bucket CDF locates the straddling
    * bucket per flag, and the exact ordered walk runs only over the
    * rows inside that bucket (~1/2600 of the data), seeded with the
    * mass below it. No reducer ever sorts more than one bucket. The
    * crossing value is order-stable under ties (the cumulative weight
    * after a run of equal cents is permutation-invariant, and the
    * crossing row always lies inside the crossing value's run), so
    * the oracle can state the plain level-CDF definition.
    */
  val q90WeightedMedian = GraftQuery(
    "q90_weighted_median",
    (s, dir) => {
      val t = Tables(s, dir)
      val li = t.lineitem
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          round(col("l_quantity")).cast("long").as("wgt"))
        .cache()
      // ONE bucket CDF serves both quantiles: each (num, den)
      // threshold contributes a tagged target-bucket row, and the
      // in-bucket exact walks run in one window partitioned by
      // (quantile tag, flag)
      val bucket = (col("cents") / 4096L).cast("long")
      val bucketed = li.groupBy(col("l_returnflag"), bucket.as("b"))
        .agg(sum(col("wgt")).as("bw"))
      val wB = Window.partitionBy(col("l_returnflag")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cdf = bucketed
        .withColumn("cumB", sum(col("bw")).over(wB))
        .withColumn("tot", sum(col("bw"))
          .over(Window.partitionBy(col("l_returnflag"))))
        .persist()
      def target(num: Int, den: Int): DataFrame = cdf
        .filter(col("cumB") * den >= col("tot") * num)
        .groupBy(col("l_returnflag"))
        .agg(min(struct(col("b"), (col("cumB") - col("bw")).as("below"),
          col("tot"))).as("t"))
        .select(col("l_returnflag"), col("t.b").as("b"),
          col("t.below").as("below"), col("t.tot").as("tot"),
          lit(num.toLong).as("qnum"), lit(den.toLong).as("qden"))
      val targets = target(1, 2).union(target(9, 10))
      val wIn = Window.partitionBy(col("qnum"), col("l_returnflag"))
        .orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val crossings = li.withColumn("b", bucket)
        .join(broadcast(targets), Seq("l_returnflag", "b"))
        .withColumn("cum", col("below") + sum(col("wgt")).over(wIn))
        .groupBy(col("l_returnflag"), col("qnum"))
        .agg(min(when(col("cum") * col("qden") >= col("tot") * col("qnum"),
          col("cents"))).as("v"), first(col("tot")).as("tot"))
      val out = crossings
        .groupBy(col("l_returnflag"))
        .agg(first(col("tot")).as("total_weight"),
          min(when(col("qnum") === 1, col("v"))).as("median_cents"),
          min(when(col("qnum") === 9, col("v"))).as("p90_cents"))
        .orderBy(col("l_returnflag"))
      out.persist().count()
      cdf.unpersist(false)
      li.unpersist(false)
      out
    },
    Some("""
      WITH levels AS (
        SELECT l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w_at
        FROM lineitem GROUP BY 1, 2),
      c AS (
        SELECT l_returnflag, cents, w_at,
               CAST(SUM(w_at) OVER (PARTITION BY l_returnflag ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(SUM(w_at) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
        FROM levels)
      SELECT l_returnflag,
             MAX(tot) AS total_weight,
             MIN(CASE WHEN cum * 2 >= tot THEN cents END) AS median_cents,
             MIN(CASE WHEN cum * 10 >= tot * 9 THEN cents END) AS p90_cents
      FROM c
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """)
  )

  /** Kaplan-Meier life table for repeat-purchase survival: per market
    * segment, time-to-second-order in days from each customer's first
    * order, right-censored at the global last order date for one-time
    * buyers. The life table is the survival computation proper — at
    * each observed event time t: n_risk (customers still un-converted
    * and un-censored at t), d_events (conversions at exactly t),
    * n_censored (censoring at t), hazard d/n (a single integer-ratio
    * division, so the doubles agree bit-for-bit with the oracle; the
    * KM product over these rows is a trivial client-side fold of the
    * emitted hazards). Shapes: ONE o_custkey exchange extracts the
    * (first, second) distinct order dates via a sorted collect_set
    * head (bounded by orders-per-customer, partial-aggregated
    * map-side); the life table itself is domain-sized (segments ×
    * distinct days), so the descending-cumulative n_risk window runs
    * over a tiny frame. At 100 TB only the per-customer head
    * extraction touches data scale, and it is a single shuffle.
    */
  val q92SurvivalKm = GraftQuery(
    "q92_survival_km",
    (s, dir) => {
      val t = Tables(s, dir)
      // ONE o_custkey exchange: the distinct-date head is a sorted
      // collect_set (bounded by orders-per-customer, partial-
      // aggregated map-side) instead of distinct + row_number window
      // (two exchanges over the same key)
      val firstTwo = t.orders
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
        .groupBy(col("o_custkey"))
        .agg(sort_array(collect_set(col("od"))).as("ds"))
        .select(col("o_custkey"), col("ds").getItem(0).as("d1"),
          when(size(col("ds")) >= 2, col("ds").getItem(1)).as("d2"))
      val maxD = t.orders.agg(to_date(max(col("o_orderdate"))).as("dmax"))
      val times = firstTwo.crossJoin(broadcast(maxD))
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          when(col("d2").isNotNull, datediff(col("d2"), col("d1")))
            .otherwise(datediff(col("dmax"), col("d1")))
            .cast("long").as("t_days"),
          col("d2").isNotNull.cast("long").as("is_event"))
      val life = times.groupBy(col("segment"), col("t_days"))
        .agg(sum(col("is_event")).as("d_events"),
          sum(lit(1L) - col("is_event")).as("n_censored"))
      // n_risk: everyone whose (event or censor) time is >= t — a
      // descending cumulative over the domain-sized life table
      val wDesc = Window.partitionBy(col("segment"))
        .orderBy(col("t_days").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      life
        .withColumn("n_risk",
          sum(col("d_events") + col("n_censored")).over(wDesc))
        .filter(col("d_events") > 0)
        .select(col("segment"), col("t_days"), col("n_risk"),
          col("d_events"), col("n_censored"),
          round(col("d_events").cast(DoubleType) /
            col("n_risk").cast(DoubleType), 6).as("hazard"))
        .orderBy(col("segment"), col("t_days"))
    },
    Some("""
      WITH od AS (
        SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
      r AS (
        SELECT o_custkey, od,
               row_number() OVER (PARTITION BY o_custkey ORDER BY od) AS rn
        FROM od),
      ft AS (
        SELECT o_custkey,
               MIN(CASE WHEN rn = 1 THEN od END) AS d1,
               MIN(CASE WHEN rn = 2 THEN od END) AS d2
        FROM r WHERE rn <= 2 GROUP BY 1),
      mx AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS dmax FROM orders),
      times AS (
        SELECT c.c_mktsegment AS segment,
               CAST(CASE WHEN f.d2 IS NOT NULL
                         THEN date_diff('day', f.d1, f.d2)
                         ELSE date_diff('day', f.d1, mx.dmax) END AS BIGINT)
                 AS t_days,
               CASE WHEN f.d2 IS NOT NULL THEN 1 ELSE 0 END AS is_event
        FROM ft f CROSS JOIN mx
        JOIN customer c ON c.c_custkey = f.o_custkey),
      life AS (
        SELECT segment, t_days,
               CAST(SUM(is_event) AS BIGINT) AS d_events,
               CAST(SUM(1 - is_event) AS BIGINT) AS n_censored
        FROM times GROUP BY 1, 2),
      cum AS (
        SELECT segment, t_days, d_events, n_censored,
               CAST(SUM(d_events + n_censored) OVER (
                 PARTITION BY segment ORDER BY t_days DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_risk
        FROM life)
      SELECT segment, t_days, n_risk, d_events, n_censored,
             round(CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE), 6)
               AS hazard
      FROM cum WHERE d_events > 0
      ORDER BY segment, t_days
    """)
  )

  /** Exact ROC AUC (Mann-Whitney rank-sum with tie correction) for a
    * heavy-buyer scorer: score = pre-cutoff purchase count per user,
    * label = (post-cutoff purchases ≥ [[HeavyBuyerMin]]) — a label
    * with real class balance (the q88 any-purchase label saturates:
    * every user purchases in a 15-day window). The whole statistic
    * stays in
    * integers until ONE final division: group users by score level,
    * take the ascending cumulative count window over the tiny
    * score-level frame, and accumulate 2×(sum of average ranks of
    * positives) as Σ pos_at·(2·below + n_at + 1) — the ×2 keeps the
    * tie-averaged half-ranks integral. AUC = (rank2 − n_pos(n_pos+1))
    * / (2·n_pos·n_neg), bit-identical across engines. Scale: one
    * user_id exchange; everything after is score-domain-sized.
    */
  val HeavyBuyerMin = 8L

  /** Cutoff splitting the scorer's observation and outcome windows —
    * shared by q93 and q99 (and aligned with q88's gains curve).
    */
  private val ScorerCutoff = "2024-01-15 00:00:00"

  /** Shared heavy-buyer scorer: per-score-level (n_at, pos_at) counts
    * — score = pre-cutoff purchases, label = post-cutoff purchases ≥
    * [[HeavyBuyerMin]]. ONE user_id exchange; the returned frame is
    * score-domain-sized. q93 (ROC AUC) and q99 (PR curve) both rank
    * THIS frame, so the scorer cannot drift between them.
    */
  private def heavyBuyerScoreLevels(
      s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(ScorerCutoff).cast("timestamp")
    val isPurch = col("event_type") === "purchase"
    Tables(s, dir).events.groupBy(col("user_id")).agg(
        sum(when(col("ts") < cutoff && isPurch, 1L).otherwise(0L)).as("score"),
        (sum(when(col("ts") >= cutoff && isPurch, 1L).otherwise(0L)) >=
          HeavyBuyerMin).cast("long").as("label"))
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n_at"), sum(col("label")).as("pos_at"))
  }

  /** Shared oracle CTE prefix for the heavy-buyer score levels. */
  private val ScoreLevelsSql = s"""
      u AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '$ScorerCutoff'
                              AND event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS score,
               CASE WHEN SUM(CASE WHEN ts >= TIMESTAMP '$ScorerCutoff'
                                   AND event_type = 'purchase'
                                  THEN 1 ELSE 0 END) >= $HeavyBuyerMin
                    THEN 1 ELSE 0 END AS label
        FROM events GROUP BY user_id),
      by_score AS (
        SELECT score, COUNT(*) AS n_at, CAST(SUM(label) AS BIGINT) AS pos_at
        FROM u GROUP BY score)"""

  val q93RocAuc = GraftQuery(
    "q93_roc_auc",
    (s, dir) => {
      val byScore = heavyBuyerScoreLevels(s, dir)
      // unpartitioned window is safe HERE: one row per score level
      val w = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = byScore
        .withColumn("below", sum(col("n_at")).over(w) - col("n_at"))
      val agg = ranked.agg(
        sum(col("pos_at") * (lit(2L) * col("below") + col("n_at") + lit(1L)))
          .as("rank2"),
        sum(col("pos_at")).as("n_pos"),
        sum(col("n_at")).as("n_total"))
      // degenerate-label guard: a saturated label (all-positive or
      // all-negative after a data refresh) must yield NULL, not a
      // Spark ANSI divide-by-zero vs DuckDB inf mismatch
      val defined = col("n_pos") > 0 && col("n_total") > col("n_pos")
      val auc = when(defined,
        (col("rank2") - col("n_pos") * (col("n_pos") + lit(1L)))
          .cast(DoubleType) /
          (lit(2L) * col("n_pos") * (col("n_total") - col("n_pos")))
            .cast(DoubleType))
      agg.select(
        col("n_pos"),
        (col("n_total") - col("n_pos")).as("n_neg"),
        auc.as("auc"),
        (lit(2.0) * auc - lit(1.0)).as("gini"))
    },
    Some(s"""
      WITH $ScoreLevelsSql,
      r AS (
        SELECT score, n_at, pos_at,
               CAST(SUM(n_at) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_at
                 AS BIGINT) AS below
        FROM by_score),
      a AS (
        SELECT CAST(SUM(pos_at * (2 * below + n_at + 1)) AS BIGINT) AS rank2,
               CAST(SUM(pos_at) AS BIGINT) AS n_pos,
               CAST(SUM(n_at) AS BIGINT) AS n_total
        FROM r)
      SELECT n_pos, n_total - n_pos AS n_neg,
             CASE WHEN n_pos > 0 AND n_total > n_pos
                  THEN CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE)
                    / CAST(2 * n_pos * (n_total - n_pos) AS DOUBLE) END AS auc,
             2.0 * (CASE WHEN n_pos > 0 AND n_total > n_pos
                  THEN CAST(rank2 - n_pos * (n_pos + 1) AS DOUBLE)
                    / CAST(2 * n_pos * (n_total - n_pos) AS DOUBLE) END)
               - 1.0 AS gini
      FROM a
    """)
  )

  /** Precision-recall curve + average precision for the q93 scorer,
    * one row per distinct score threshold (predict positive when
    * score ≥ t, thresholds descending): tp/fp/fn from ONE descending
    * cumulative window over the score-level frame, precision/recall/
    * F1 as fixed IEEE chains on exact integers, and AP as the
    * step-integral Σ Δrecall·precision — per-term doubles rounded to
    * 6 and decimal-summed (the chi2 rule), replicated on every row.
    * Scale: identical to q93 — one user exchange, then score-domain-
    * sized everything.
    */
  val q99PrCurve = GraftQuery(
    "q99_pr_curve",
    (s, dir) => {
      val byScore = heavyBuyerScoreLevels(s, dir)
      // unpartitioned windows are safe HERE: one row per score level
      val wDesc = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      val cum = byScore
        .withColumn("tp", sum(col("pos_at")).over(wDesc))
        .withColumn("pp", sum(col("n_at")).over(wDesc))
        .withColumn("pos_total", sum(col("pos_at")).over(wAll))
      val precision = col("tp").cast(DoubleType) / col("pp").cast(DoubleType)
      // degenerate-label guard, as in q93: all-negative data would
      // make every recall a div-by-zero under ANSI
      val recall = when(col("pos_total") > 0,
        col("tp").cast(DoubleType) / col("pos_total").cast(DoubleType))
      val prevRecall = when(col("pos_total") > 0,
        (col("tp") - col("pos_at")).cast(DoubleType) /
          col("pos_total").cast(DoubleType))
      val apTerm = round((recall - prevRecall) * precision, 6)
      cum
        .withColumn("ap_term", apTerm)
        .withColumn("avg_precision",
          sum(dec6(col("ap_term"))).over(wAll).cast(DoubleType))
        .select(col("score").as("threshold"),
          col("tp"), (col("pp") - col("tp")).as("fp"),
          (col("pos_total") - col("tp")).as("fn"),
          round(precision, 6).as("precision"),
          round(recall, 6).as("recall"),
          when(col("tp") > 0,
            round(lit(2.0) * precision * recall / (precision + recall), 6))
            .as("f1"),
          col("avg_precision"))
        .orderBy(col("threshold").desc)
    },
    Some(s"""
      WITH $ScoreLevelsSql,
      c AS (
        SELECT score, n_at, pos_at,
               CAST(SUM(pos_at) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS tp,
               CAST(SUM(n_at) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS pp,
               CAST(SUM(pos_at) OVER () AS BIGINT) AS pos_total
        FROM by_score),
      d AS (
        SELECT score, pos_at, tp, pp, pos_total,
               CAST(tp AS DOUBLE) / CAST(pp AS DOUBLE) AS prec,
               CASE WHEN pos_total > 0 THEN
                 CAST(tp AS DOUBLE) / CAST(pos_total AS DOUBLE) END AS rec,
               CASE WHEN pos_total > 0 THEN
                 CAST(tp - pos_at AS DOUBLE) / CAST(pos_total AS DOUBLE) END
                 AS prev_rec
        FROM c)
      SELECT score AS threshold, tp, pp - tp AS fp, pos_total - tp AS fn,
             round(prec, 6) AS precision,
             round(rec, 6) AS recall,
             CASE WHEN tp > 0
                  THEN round(2.0 * prec * rec / (prec + rec), 6) END AS f1,
             CAST(SUM(CAST(round((rec - prev_rec) * prec, 6)
               AS DECIMAL(25,6))) OVER () AS DOUBLE) AS avg_precision
      FROM d
      ORDER BY threshold DESC
    """)
  )

  /** Chi-square test of independence between customer market segment
    * and order priority: the full contingency-table readout — observed
    * counts, row/col marginals, expected counts, per-cell
    * contributions, and the chi-square statistic. Expected = row·col/N
    * is one integer-ratio division; per-cell contribution is the same
    * (obs − exp)²/exp IEEE chain both engines evaluate on identical
    * inputs; the statistic total crosses engines through the
    * decimal-sum rule (contributions rounded to 6, decimal-summed).
    * Scale: the only data-scale operation is the orders⋈customer
    * count aggregation; the contingency frame is |segments|×|priorities|
    * rows, so every window here is domain-sized.
    */
  val q96ChiSquare = GraftQuery(
    "q96_chi_square",
    (s, dir) => {
      val t = Tables(s, dir)
      val cells = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
        .groupBy(col("segment"), col("priority"))
        .agg(count(lit(1)).as("obs"))
      // windows below run over the ~25-cell contingency frame
      val withTot = cells
        .withColumn("row_tot",
          sum(col("obs")).over(Window.partitionBy(col("segment"))))
        .withColumn("col_tot",
          sum(col("obs")).over(Window.partitionBy(col("priority"))))
        .withColumn("n_tot", sum(col("obs")).over(Window.partitionBy()))
      val expRaw = (col("row_tot") * col("col_tot")).cast(DoubleType) /
        col("n_tot").cast(DoubleType)
      val contrib = round(
        (col("obs").cast(DoubleType) - expRaw) *
          (col("obs").cast(DoubleType) - expRaw) / expRaw, 6)
      withTot
        .withColumn("expected", round(expRaw, 6))
        .withColumn("contrib", contrib)
        .withColumn("chi2",
          sum(dec6(col("contrib"))).over(Window.partitionBy())
            .cast(DoubleType))
        .select(col("segment"), col("priority"), col("obs"), col("row_tot"),
          col("col_tot"), col("expected"), col("contrib"), col("chi2"))
        .orderBy(col("segment"), col("priority"))
    },
    Some("""
      WITH cells AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               COUNT(*) AS obs
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      tot AS (
        SELECT segment, priority, CAST(obs AS BIGINT) AS obs,
               CAST(SUM(obs) OVER (PARTITION BY segment) AS BIGINT) AS row_tot,
               CAST(SUM(obs) OVER (PARTITION BY priority) AS BIGINT) AS col_tot,
               CAST(SUM(obs) OVER () AS BIGINT) AS n_tot
        FROM cells),
      e AS (
        SELECT segment, priority, obs, row_tot, col_tot,
               CAST(row_tot * col_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)
                 AS exp_raw
        FROM tot),
      f AS (
        SELECT segment, priority, obs, row_tot, col_tot,
               round(exp_raw, 6) AS expected,
               round((CAST(obs AS DOUBLE) - exp_raw)
                 * (CAST(obs AS DOUBLE) - exp_raw) / exp_raw, 6) AS contrib
        FROM e)
      SELECT segment, priority, obs, row_tot, col_tot, expected, contrib,
             CAST(SUM(CAST(contrib AS DECIMAL(25,6))) OVER () AS DOUBLE)
               AS chi2
      FROM f
      ORDER BY segment, priority
    """)
  )

  /** Maximum drawdown of the daily-revenue series, per year: running
    * peak minus current value, all in EXACT integer cents over the
    * date-domain-sized daily frame (~350 rows/year — the windows here
    * never see row-scale data; the only data-scale operation is the
    * day-level cents aggregation, one map-side-combined shuffle).
    * The peak-to-trough readout (worst day, depth, peak it fell
    * from) is the classic risk/health metric over any KPI series.
    */
  val q97MaxDrawdown = GraftQuery(
    "q97_max_drawdown",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = t.orders
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val wRun = Window.partitionBy(col("yr")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily
        .withColumn("peak", max(col("cents")).over(wRun))
        .withColumn("drawdown", col("peak") - col("cents"))
      dd.groupBy(col("yr"))
        .agg(count(lit(1)).as("n_days"),
          max(col("cents")).as("best_day_cents"),
          max(col("drawdown")).as("max_drawdown_cents"),
          min(when(col("drawdown") > 0, col("cents"))).as("worst_below_peak_cents"))
        .orderBy(col("yr"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1, 2),
      dd AS (
        SELECT yr, day, cents,
               CAST(MAX(cents) OVER (PARTITION BY yr ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS peak
        FROM daily)
      SELECT yr, COUNT(*) AS n_days,
             MAX(cents) AS best_day_cents,
             MAX(peak - cents) AS max_drawdown_cents,
             MIN(CASE WHEN peak - cents > 0 THEN cents END)
               AS worst_below_peak_cents
      FROM dd
      GROUP BY yr
      ORDER BY yr
    """)
  )

  /** CUSUM changepoint screen over the per-year daily-revenue series:
    * the classic drift detector for KPI monitoring — cumulative sum of
    * deviations from the year mean, its peak |CUSUM| with the day it
    * occurs (the changepoint candidate), and how many days breach a
    * 5%-of-annual-revenue band. Exactness: with S_t the cents prefix
    * sum, T the year total and n the day count, n·CUSUM_t = n·S_t −
    * t·T is a pure LONG, so the argmax, the flag count
    * (20·|num| > n·T) and the tie-break (earliest day) are integer
    * compares; the readout is one double division by n. Scale: the
    * only data-scale work is the day-level cents aggregation
    * (map-side combined); every window is partitioned by year over
    * the ~365-row daily frame, and the year-totals join is a
    * broadcast of a years-sized frame.
    */
  val q122CusumChangepoint = GraftQuery(
    "q122_cusum_changepoint",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = dailyRevenueCents(t)
        .withColumn("yr", year(col("day")).cast("long"))
      val tot = daily.groupBy(col("yr"))
        .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("total_cents"))
      val wRun = Window.partitionBy(col("yr")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val num = daily
        .join(broadcast(tot), Seq("yr"))
        .withColumn("t", row_number().over(
          Window.partitionBy(col("yr")).orderBy(col("day"))).cast("long"))
        .withColumn("s", sum(col("cents")).over(wRun))
        .withColumn("num",
          col("n_days") * col("s") - col("t") * col("total_cents"))
        .cache()
      val peaks = num.groupBy(col("yr"))
        .agg(first(col("n_days")).as("n_days"),
          first(col("total_cents")).as("total_cents"),
          max(abs(col("num"))).as("max_abs_num"),
          sum(when(abs(col("num")) * 20L > col("n_days") * col("total_cents"),
            1L).otherwise(0L)).as("n_breach_days"))
      peaks
        .join(num.select(col("yr"), col("day"), abs(col("num")).as("a")),
          Seq("yr"))
        .filter(col("a") === col("max_abs_num"))
        .groupBy(col("yr"), col("n_days"), col("total_cents"),
          col("max_abs_num"), col("n_breach_days"))
        .agg(min(col("day")).as("cpd"))
        .select(col("yr"), col("n_days"), col("total_cents"),
          (col("max_abs_num").cast(DoubleType) /
            col("n_days").cast(DoubleType)).as("max_abs_cusum"),
          date_format(col("cpd"), "yyyy-MM-dd").as("changepoint_day"),
          col("n_breach_days"))
        .orderBy(col("yr"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1, 2),
      tot AS (
        SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM daily GROUP BY 1),
      c AS (
        SELECT d.yr, d.day, t.n_days, t.total_cents,
               CAST(row_number() OVER (PARTITION BY d.yr ORDER BY d.day)
                 AS BIGINT) AS t,
               CAST(SUM(d.cents) OVER (PARTITION BY d.yr ORDER BY d.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS s
        FROM daily d JOIN tot t ON t.yr = d.yr),
      n AS (
        SELECT yr, day, n_days, total_cents,
               ABS(n_days * s - t * total_cents) AS a
        FROM c),
      p AS (
        SELECT yr, n_days, total_cents,
               CAST(MAX(a) AS BIGINT) AS max_abs_num,
               CAST(SUM(CASE WHEN a * 20 > n_days * total_cents
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_breach_days
        FROM n GROUP BY 1, 2, 3)
      SELECT p.yr, p.n_days, p.total_cents,
             CAST(p.max_abs_num AS DOUBLE) / CAST(p.n_days AS DOUBLE)
               AS max_abs_cusum,
             CAST(MIN(n.day) AS VARCHAR) AS changepoint_day,
             p.n_breach_days
      FROM p JOIN n ON n.yr = p.yr AND n.a = p.max_abs_num
      GROUP BY p.yr, p.n_days, p.total_cents, p.max_abs_num, p.n_breach_days
      ORDER BY 1
    """)
  )

  /** Top-k customers counted into the concentration ratio. */
  val ConcentrationTopK = 4

  /** Market-concentration profile per customer segment: the
    * Herfindahl–Hirschman index Σ shareᵢ² of lifetime revenue across a
    * segment's customers plus the CR-k concentration ratio (revenue
    * share of the top-k customers) — the antitrust/portfolio
    * concentration readout, and the "is one customer carrying this
    * segment" health check. Exactness: HHI = Σ centsᵢ² / T² with the
    * numerator summed in DECIMAL(38,0) (cents² ≈ 10¹⁴ per customer —
    * far inside 38 digits at any segment size) and ONE double division
    * of two exactly-rendered operands; CR-k's top-k is integer-ranked
    * with custkey tie-break, its share one division of exact longs.
    * Scale: per-customer rollup is the one data-scale shuffle
    * (map-side combined); the rank window runs per segment over the
    * customer-sized aggregate, and the segment totals re-aggregate
    * that same frame — nothing row-scale crosses an executor twice.
    */
  val q123HhiConcentration = GraftQuery(
    "q123_hhi_concentration",
    (s, dir) => {
      val t = Tables(s, dir)
      val perCust = segmentCustomerCents(t)
      val ranked = perCust.withColumn("rk", row_number().over(
        Window.partitionBy(col("segment"))
          .orderBy(col("cents").desc, col("o_custkey"))))
      ranked
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("total_cents"),
          sum(col("cents").cast(DecimalType(38, 0)) * col("cents"))
            .as("sum_sq"),
          sum(when(col("rk") <= ConcentrationTopK, col("cents"))
            .otherwise(0L)).as("topk_cents"))
        .select(col("segment"), col("n_customers"), col("total_cents"),
          (col("sum_sq").cast(DoubleType) /
            (col("total_cents").cast(DecimalType(38, 0)) *
              col("total_cents")).cast(DoubleType)).as("hhi"),
          (col("topk_cents").cast(DoubleType) /
            col("total_cents").cast(DoubleType)).as(s"cr$ConcentrationTopK"))
        .orderBy(col("segment"))
    },
    Some(s"""
      WITH pc AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      rk AS (
        SELECT segment, cents,
               row_number() OVER (PARTITION BY segment
                 ORDER BY cents DESC, o_custkey) AS rk
        FROM pc)
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(CAST(SUM(CAST(cents AS HUGEINT) * cents)
                 AS VARCHAR) AS DOUBLE)
               / CAST(CAST(CAST(SUM(cents) AS HUGEINT)
                   * SUM(cents) AS VARCHAR) AS DOUBLE)
               AS hhi,
             CAST(SUM(CASE WHEN rk <= $ConcentrationTopK THEN cents
                 ELSE 0 END) AS DOUBLE)
               / CAST(SUM(cents) AS DOUBLE) AS cr$ConcentrationTopK
      FROM rk
      GROUP BY segment
      ORDER BY segment
    """)
  )

  /** Lorenz curve / grouped Gini of customer lifetime revenue per
    * market segment, at 2¹⁶-cent bucket granularity: cumulative
    * customer share vs cumulative revenue share along the sorted
    * bucket spine, plus the exact trapezoid Gini OVER THE BUCKETED
    * distribution. Bucketing is what keeps this 100 TB-shaped: the
    * per-customer rollup is one shuffle, the bucket frame is
    * domain-sized (value range / 2¹⁶), and no window ever sees a
    * row-scale partition — the q90 drill-down lesson applied to
    * inequality profiling. Shares and the Gini tail are single
    * divisions / fixed IEEE chains over exact longs, rounded to 6.
    */
  val q98LorenzGini = GraftQuery(
    "q98_lorenz_gini",
    (s, dir) => {
      val t = Tables(s, dir)
      val perCust = t.orders
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
      val bucket = (col("cents") / 65536L).cast("long")
      val buckets = perCust
        .groupBy(col("c_mktsegment").as("segment"), bucket.as("b"))
        .agg(count(lit(1)).as("n_cust"), sum(col("cents")).as("mass"))
      val wCum = Window.partitionBy(col("segment")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy(col("segment"))
      val cum = buckets
        .withColumn("cum_n", sum(col("n_cust")).over(wCum))
        .withColumn("cum_mass", sum(col("mass")).over(wCum))
        .withColumn("tot_n", sum(col("n_cust")).over(wTot))
        .withColumn("tot_mass", sum(col("mass")).over(wTot))
      // trapezoid Gini over the bucketed distribution:
      // G = 1 - Σ Δpop·(L(i-1)+L(i)) with everything scaled through
      // exact longs; the only doubles are the final divisions
      // decimal-widened: the n·(L(i-1)+L(i)) PRODUCT (not just its
      // sum) overflows 2⁶³ around SF100 (the CUPED-moments lesson),
      // so the operands widen to decimal BEFORE the multiply and the
      // denominator multiplies as doubles
      val prevMass = col("cum_mass") - col("mass")
      val gTerm = col("n_cust").cast(DecimalType(19, 0)) *
        (prevMass + col("cum_mass")).cast(DecimalType(19, 0))
      val cum2 = cum.withColumn("g_sum", sum(gTerm).over(wTot))
      cum2.select(col("segment"), col("b"), col("n_cust"),
          col("cum_n"), col("cum_mass"),
          round(col("cum_n").cast(DoubleType) / col("tot_n").cast(DoubleType), 6)
            .as("pop_share"),
          round(col("cum_mass").cast(DoubleType) / col("tot_mass").cast(DoubleType), 6)
            .as("revenue_share"),
          round(lit(1.0) - col("g_sum").cast(DoubleType) /
            (col("tot_n").cast(DoubleType) * col("tot_mass").cast(DoubleType)),
            6).as("gini_grouped"))
        .orderBy(col("segment"), col("b"))
    },
    Some("""
      WITH per_cust AS (
        SELECT o.o_custkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders o GROUP BY 1),
      joined AS (
        SELECT c.c_mktsegment AS segment, p.cents,
               CAST(p.cents // 65536 AS BIGINT) AS b
        FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey),
      buckets AS (
        SELECT segment, b, COUNT(*) AS n_cust,
               CAST(SUM(cents) AS BIGINT) AS mass
        FROM joined GROUP BY 1, 2),
      cum AS (
        SELECT segment, b, n_cust, mass,
               CAST(SUM(n_cust) OVER (PARTITION BY segment ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_n,
               CAST(SUM(mass) OVER (PARTITION BY segment ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_mass,
               CAST(SUM(n_cust) OVER (PARTITION BY segment) AS BIGINT) AS tot_n,
               CAST(SUM(mass) OVER (PARTITION BY segment) AS BIGINT) AS tot_mass
        FROM buckets),
      g AS (
        SELECT *,
               CAST(SUM(CAST(n_cust AS DECIMAL(19,0))
                   * CAST((cum_mass - mass) + cum_mass AS DECIMAL(19,0)))
                 OVER (PARTITION BY segment) AS DECIMAL(38,0)) AS g_sum
        FROM cum)
      SELECT segment, b, n_cust, cum_n, cum_mass,
             round(CAST(cum_n AS DOUBLE) / CAST(tot_n AS DOUBLE), 6)
               AS pop_share,
             round(CAST(cum_mass AS DOUBLE) / CAST(tot_mass AS DOUBLE), 6)
               AS revenue_share,
             round(1.0 - CAST(g_sum AS DOUBLE)
               / (CAST(tot_n AS DOUBLE) * CAST(tot_mass AS DOUBLE)), 6)
               AS gini_grouped
      FROM g
      ORDER BY segment, b
    """)
  )

  /** Two-sample Kolmogorov-Smirnov test (distribution drift between
    * two customer segments' order values) — EXACT, via the integer
    * rational: at every distinct value v, the ECDF gap is
    * |c1·n2 − c2·n1| / (n1·n2), so the max is found over exact
    * integer arithmetic (cross-products widened through
    * DECIMAL(38,0)/HUGEINT — long would wrap past ~3·10⁹-row
    * samples) and the statistic is ONE double division at the end.
    * No log/exp, no float accumulation — bit-stable vs the oracle.
    *
    * Scale shape: the global ordered cumsum is the q68/q90 bucket
    * drill-down, not a one-reducer window — per-(bucket,value) counts
    * first, a cumsum over the ≤500 fixed-width bucket totals (the
    * only single-partition step, O(buckets)), then a within-bucket
    * cumsum on the bucket-partitioned exchange. At 100 TB every
    * sample-sized stage is hash- or range-parallel. The oracle states
    * the naive one-window spelling — same rationals.
    */
  val q105KsTest = GraftQuery(
    "q105_ks_test",
    (s, dir) => {
      val t = Tables(s, dir)
      val samples = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("o_totalprice").as("v"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("is1"))
      // persist the distinct-value aggregate: totals, the bucket
      // prefix, AND the final argmax gate all re-reference it — without
      // the cache each gate frame would re-run the fact join
      val perValue = samples.groupBy(col("v"))
        .agg(sum(col("is1")).as("cnt1"),
          (count(lit(1)) - sum(col("is1"))).as("cnt2"))
        .withColumn("b", floor(col("v") / 1000.0).cast("long"))
        .persist()
      val bucketPrefix = perValue.groupBy(col("b"))
        .agg(sum(col("cnt1")).as("bt1"), sum(col("cnt2")).as("bt2"))
        .select(col("b"),
          coalesce(sum(col("bt1")).over(Window.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("p1"),
          coalesce(sum(col("bt2")).over(Window.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("p2"))
      val within = Window.partitionBy(col("b")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = perValue.join(bucketPrefix, Seq("b"))
        .select(col("v"),
          (col("p1") + sum(col("cnt1")).over(within)).as("c1"),
          (col("p2") + sum(col("cnt2")).over(within)).as("c2"))
      val totals = perValue.agg(sum(col("cnt1")).as("n1"),
        sum(col("cnt2")).as("n2"))
      // cross-products widen through DECIMAL(38,0) (the q98 rule):
      // c1·n2 wraps Long silently once a sample passes ~3e9 rows —
      // exactly the scale this operator claims to survive
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val diffs = cum.crossJoin(broadcast(totals))
        .withColumn("dnum",
          abs(d38(col("c1")) * col("n2") - d38(col("c2")) * col("n1")))
      val dmax = diffs.agg(max(col("dnum")).as("d_num"))
      val out = diffs.crossJoin(broadcast(dmax))
        .filter(col("dnum") === col("d_num"))
        .groupBy(col("n1"), col("n2"), col("d_num"))
        .agg(min(col("v")).as("ks_at"))
        .select(col("n1"), col("n2"), col("d_num").cast("long").as("d_num"),
          (col("d_num").cast(DoubleType) /
            (d38(col("n1")) * col("n2")).cast(DoubleType)).as("d_stat"),
          col("ks_at"))
      out.persist().count()
      perValue.unpersist(false)
      out
    },
    Some("""
      WITH s AS (
        SELECT o_totalprice AS v,
               CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is1
        FROM orders JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      pv AS (
        SELECT v, CAST(SUM(is1) AS BIGINT) AS cnt1,
               CAST(COUNT(*) - SUM(is1) AS BIGINT) AS cnt2
        FROM s GROUP BY 1),
      cum AS (
        SELECT v,
               CAST(SUM(cnt1) OVER (ORDER BY v) AS BIGINT) AS c1,
               CAST(SUM(cnt2) OVER (ORDER BY v) AS BIGINT) AS c2
        FROM pv),
      tot AS (
        SELECT CAST(SUM(cnt1) AS BIGINT) AS n1,
               CAST(SUM(cnt2) AS BIGINT) AS n2
        FROM pv),
      d AS (SELECT c.v,
                   abs(CAST(c.c1 AS HUGEINT) * t.n2
                     - CAST(c.c2 AS HUGEINT) * t.n1) AS dnum
            FROM cum c, tot t),
      m AS (SELECT MAX(dnum) AS d_num FROM d)
      SELECT t.n1, t.n2, CAST(m.d_num AS BIGINT) AS d_num,
             CAST(m.d_num AS DOUBLE)
               / CAST(CAST(t.n1 AS HUGEINT) * t.n2 AS DOUBLE) AS d_stat,
             (SELECT MIN(v) FROM d WHERE d.dnum = m.d_num) AS ks_at
      FROM tot t, m
    """)
  )

  /** Benford first-digit expectations log10(1+1/d), d=1..9, as FIXED
    * double literals — computing them via log10 at runtime would race
    * two libm implementations (log10 is not required to be correctly
    * rounded); literals are bit-identical by construction.
    */
  val BenfordP: Seq[(Long, Double)] = Seq(
    1L -> 0.3010299956639812, 2L -> 0.17609125905568124,
    3L -> 0.12493873660829993, 4L -> 0.09691001300805642,
    5L -> 0.07918124604762482, 6L -> 0.06694678963061322,
    7L -> 0.05799194697768673, 8L -> 0.05115252244738129,
    9L -> 0.04575749056067514)

  /** Benford first-digit profile of order values — the
    * fraud/synthetic-data screen auditors run on financial columns.
    * The first significant digit comes from the DECIMAL string render
    * (both engines print "1001.91" identically; no log10/pow float
    * path), counts are exact longs, the observed share is ONE
    * division, and the Benford expectation joins as a broadcast
    * 9-row literal spine. One scan, digit-domain-sized everything.
    */
  val q106BenfordProfile = GraftQuery(
    "q106_benford",
    (s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val spine = BenfordP.toDF("digit", "benford_p")
      val counts = t.orders
        .select(substring(dec2(col("o_totalprice")).cast("string"), 1, 1)
          .cast("long").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("obs"))
      val total = counts.agg(sum(col("obs")).as("n_total"))
      broadcast(spine).join(counts, Seq("digit"), "left")
        .na.fill(0L, Seq("obs"))
        .crossJoin(broadcast(total))
        .select(col("digit"), col("obs"), col("n_total"),
          (col("obs").cast(DoubleType) / col("n_total").cast(DoubleType))
            .as("share"),
          col("benford_p"))
        .withColumn("excess", col("share") - col("benford_p"))
        .orderBy(col("digit"))
    },
    Some("""
      -- e-notation: DuckDB types bare decimal literals as DECIMAL and
      -- its DECIMAL→DOUBLE conversion lands 1 ulp off the IEEE string
      -- parse Spark does; scientific literals are DOUBLE directly
      WITH spine(digit, benford_p) AS (VALUES
        (1, 0.3010299956639812e0), (2, 0.17609125905568124e0),
        (3, 0.12493873660829993e0), (4, 0.09691001300805642e0),
        (5, 0.07918124604762482e0), (6, 0.06694678963061322e0),
        (7, 0.05799194697768673e0), (8, 0.05115252244738129e0),
        (9, 0.04575749056067514e0)),
      c AS (
        SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
                 1, 1) AS BIGINT) AS digit,
               CAST(COUNT(*) AS BIGINT) AS obs
        FROM orders GROUP BY 1),
      tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_total FROM c)
      SELECT CAST(s.digit AS BIGINT) AS digit,
             COALESCE(c.obs, 0) AS obs, t.n_total,
             CAST(COALESCE(c.obs, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
               AS share,
             s.benford_p,
             CAST(COALESCE(c.obs, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
               - s.benford_p AS excess
      FROM spine s LEFT JOIN c ON c.digit = s.digit, tot t
      ORDER BY 1
    """)
  )

  /** k threshold for the anonymity audit (HIPAA-style small-cell
    * suppression commonly uses k = 5).
    */
  val AnonymityK = 5L

  /** Width of the n_chars quasi-identifier bucket. */
  val AnonymityCharsBucket = 100L

  /** k-anonymity audit over the documents table — the privacy gate a
    * training-data release runs before publishing: group by the
    * quasi-identifier tuple (lang, source, size bucket) and flag every
    * cell smaller than k, since those records are re-identifiable by
    * their QI combination alone. Pure integer arithmetic (the bucket
    * is an integer floor-divide, the flag an integer compare).
    * Scale: ONE hash aggregation with map-side combine; the output is
    * |QI cells|-sized, never |documents|-sized. The remediation path
    * (suppress or generalize flagged cells) is a broadcast semi-join
    * of this frame back onto the corpus.
    */
  val q113KAnonymity = GraftQuery(
    "q113_k_anonymity",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("lang"), col("source"),
          floor(col("n_chars") / AnonymityCharsBucket).cast("long")
            .as("chars_bucket"))
        .groupBy(col("lang"), col("source"), col("chars_bucket"))
        .agg(count(lit(1)).as("group_n"))
        .withColumn("at_risk", col("group_n") < AnonymityK)
        .orderBy(col("lang"), col("source"), col("chars_bucket"))
    },
    Some(s"""
      SELECT lang, source, n_chars // $AnonymityCharsBucket AS chars_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_n,
             CAST(COUNT(*) AS BIGINT) < $AnonymityK AS at_risk
      FROM documents
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """)
  )

  /** l threshold for the diversity audit. */
  val DiversityL = 2L

  /** l-diversity audit — k-anonymity's complement: a QI cell can be
    * large (k-safe) yet still leak if every member shares the same
    * SENSITIVE value, so per (source, size-bucket) cell this reports
    * the number of DISTINCT sensitive values (lang) and flags cells
    * below l. Pure integer arithmetic; scale: one aggregation with
    * map-side partial count-distinct, |cells|-sized output — at
    * larger sensitive domains the exact count-distinct swaps for the
    * theta sketch (q38) with the flag compared against the estimate's
    * lower bound.
    */
  val q120LDiversity = GraftQuery(
    "q120_l_diversity",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(col("source"),
          floor(col("n_chars") / AnonymityCharsBucket).cast("long")
            .as("chars_bucket"),
          col("lang"))
        .groupBy(col("source"), col("chars_bucket"))
        .agg(count(lit(1)).as("group_n"),
          countDistinct(col("lang")).as("distinct_sensitive"))
        .withColumn("below_l", col("distinct_sensitive") < DiversityL)
        .orderBy(col("source"), col("chars_bucket"))
    },
    Some(s"""
      SELECT source, n_chars // $AnonymityCharsBucket AS chars_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_n,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS distinct_sensitive,
             CAST(COUNT(DISTINCT lang) AS BIGINT) < $DiversityL AS below_l
      FROM documents
      GROUP BY 1, 2
      ORDER BY 1, 2
    """)
  )

  /** Numerator threshold for the t-closeness flag: tvd > 1/5. */
  val ClosenessT5: Long = 5L

  /** t-closeness audit — the third leg of the release-privacy triple
    * (k-anonymity q113, l-diversity q120): a QI cell can be k-large
    * AND l-diverse yet still leak if its sensitive-value DISTRIBUTION
    * differs sharply from the corpus-wide one (e.g. a cell that is 95%
    * one language in a 50/50 corpus). Per (source, size-bucket) cell
    * this reports the total-variation distance ½·Σ|p_i − q_i| between
    * the cell's lang distribution and the global one — the categorical
    * EMD under uniform ground distance, which is the t-closeness
    * metric for unordered sensitive attributes — and flags cells with
    * tvd > 1/5. Exactness: both distributions stay rational over the
    * common denominator cell_n·N, so each term is the INTEGER
    * |cnt_i·N − g_i·cell_n|; the statistic is one double division of
    * the integer sum by 2·cell_n·N, and the flag compares
    * 5·Σ > 2·cell_n·N in pure integers — engine-identical. Scale: the
    * (cell × lang) spine is |cells|·|langs|-sized (domain, not data);
    * the only data-scale work is the one map-side-combined
    * (source, bucket, lang) count, and the global lang frame
    * broadcasts.
    */
  val q121TCloseness = GraftQuery(
    "q121_t_closeness",
    (s, dir) => {
      val t = Tables(s, dir)
      val cellLang = t.documents
        .select(col("source"),
          floor(col("n_chars") / AnonymityCharsBucket).cast("long")
            .as("chars_bucket"),
          col("lang"))
        .groupBy(col("source"), col("chars_bucket"), col("lang"))
        .agg(count(lit(1)).as("cnt"))
        .cache()
      val cells = cellLang.groupBy(col("source"), col("chars_bucket"))
        .agg(sum(col("cnt")).as("group_n"))
      val globLang = cellLang.groupBy(col("lang"))
        .agg(sum(col("cnt")).as("g_cnt"))
      val totalN = cellLang.agg(sum(col("cnt")).as("n_total"))
      cells
        .crossJoin(broadcast(globLang))
        .crossJoin(broadcast(totalN))
        .join(cellLang, Seq("source", "chars_bucket", "lang"), "left")
        .select(col("source"), col("chars_bucket"), col("group_n"),
          col("n_total"),
          abs(coalesce(col("cnt"), lit(0L)) * col("n_total") -
            col("g_cnt") * col("group_n")).as("term"))
        .groupBy(col("source"), col("chars_bucket"))
        .agg(first(col("group_n")).as("group_n"),
          sum(col("term")).as("num"),
          (lit(2L) * first(col("group_n")) * first(col("n_total")))
            .as("den"))
        .select(col("source"), col("chars_bucket"), col("group_n"),
          (col("num").cast(DoubleType) / col("den").cast(DoubleType))
            .as("tvd"),
          (col("num") * ClosenessT5 > col("den")).as("above_t"))
        .orderBy(col("source"), col("chars_bucket"))
    },
    Some(s"""
      WITH cl AS (
        SELECT source, n_chars // $AnonymityCharsBucket AS chars_bucket,
               lang, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM documents GROUP BY 1, 2, 3),
      cells AS (
        SELECT source, chars_bucket, CAST(SUM(cnt) AS BIGINT) AS group_n
        FROM cl GROUP BY 1, 2),
      gl AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS g_cnt
             FROM cl GROUP BY 1),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM cl),
      terms AS (
        SELECT c.source, c.chars_bucket, c.group_n, t.n_total,
               ABS(COALESCE(x.cnt, 0) * t.n_total - g.g_cnt * c.group_n)
                 AS term
        FROM cells c CROSS JOIN gl g CROSS JOIN tot t
        LEFT JOIN cl x ON x.source = c.source
          AND x.chars_bucket = c.chars_bucket AND x.lang = g.lang)
      SELECT source, chars_bucket, group_n,
             CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
               / CAST(2 * group_n * n_total AS DOUBLE) AS tvd,
             CAST(SUM(term) AS BIGINT) * $ClosenessT5
               > 2 * group_n * n_total AS above_t
      FROM terms
      GROUP BY source, chars_bucket, group_n, n_total
      ORDER BY 1, 2
    """)
  )

  /** Distribution-free 95% confidence interval for the MEDIAN of
    * customer lifetime revenue per market segment, from order
    * statistics: ranks l = ⌊(n − 1.96√n)/2⌋ and u = ⌈1 + (n +
    * 1.96√n)/2⌉ (clamped to [1, n]) bracket the median with ≥95%
    * coverage by the binomial argument — no distributional assumption,
    * the way a data profiler should report "the median is X ± what?".
    * Exactness: cents are exact longs, the rank formulas are a fixed
    * IEEE chain (sqrt/·/÷ all correctly rounded, so both engines floor
    * the SAME double), and the three order statistics are picked by
    * integer rank compares; the even-n median is (a+b)/2 of exact
    * longs. Scale: one per-customer rollup (the only data-scale
    * shuffle), then the rank window runs per segment over the
    * customer-DIMENSION frame; at corpus scale the same three ranks
    * come out of the q90 bucket drill-down instead of a sort.
    */
  val q125MedianCi = GraftQuery(
    "q125_median_ci",
    (s, dir) => {
      val t = Tables(s, dir)
      val perCust = segmentCustomerCents(t)
      val withN = perCust
        .join(broadcast(perCust.groupBy(col("segment"))
          .agg(count(lit(1)).as("n"))), Seq("segment"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("segment"))
            .orderBy(col("cents"), col("o_custkey"))).cast("long"))
      val nD = col("n").cast(DoubleType)
      val lo = greatest(lit(1L),
        floor((nD - lit(1.96) * sqrt(nD)) / lit(2.0)))
      val hi = least(col("n"),
        ceil(lit(1.0) + (nD + lit(1.96) * sqrt(nD)) / lit(2.0)))
      withN
        .withColumn("lo_rank", lo).withColumn("hi_rank", hi)
        .groupBy(col("segment"))
        .agg(first(col("n")).as("n_customers"),
          sum(when(col("r") === col("lo_rank"), col("cents"))).as("ci_lo"),
          sum(when(col("r") === col("hi_rank"), col("cents"))).as("ci_hi"),
          (sum(when(col("r") === ((col("n") + 1L) / lit(2L)).cast("long"),
            col("cents"))).cast(DoubleType) / lit(2.0) +
            sum(when(col("r") === (col("n") / lit(2L)).cast("long") + 1L,
              col("cents"))).cast(DoubleType) / lit(2.0)).as("median_cents"))
        .select(col("segment"), col("n_customers"), col("median_cents"),
          col("ci_lo"), col("ci_hi"))
        .orderBy(col("segment"))
    },
    Some("""
      WITH pc AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      rk AS (
        SELECT segment, o_custkey, cents,
               CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n,
               CAST(row_number() OVER (PARTITION BY segment
                 ORDER BY cents, o_custkey) AS BIGINT) AS r
        FROM pc),
      b AS (
        SELECT segment, cents, n, r,
               GREATEST(1, CAST(FLOOR((CAST(n AS DOUBLE)
                 - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT))
                 AS lo_rank,
               LEAST(n, CAST(CEIL(1.0 + (CAST(n AS DOUBLE)
                 + 1.96 * sqrt(CAST(n AS DOUBLE))) / 2.0) AS BIGINT))
                 AS hi_rank
        FROM rk)
      SELECT segment, n AS n_customers,
             CAST(SUM(CASE WHEN r = (n + 1) // 2 THEN cents END) AS DOUBLE)
               / 2.0
               + CAST(SUM(CASE WHEN r = n // 2 + 1 THEN cents END) AS DOUBLE)
               / 2.0 AS median_cents,
             CAST(SUM(CASE WHEN r = lo_rank THEN cents END) AS BIGINT)
               AS ci_lo,
             CAST(SUM(CASE WHEN r = hi_rank THEN cents END) AS BIGINT)
               AS ci_hi
      FROM b
      GROUP BY segment, n
      ORDER BY segment
    """)
  )

  /** Two-proportion z-test between order cohorts — the A/B readout
    * every experimentation pipeline ships: does the URGENT-priority
    * cohort finalize (status F) at a different rate than the rest?
    * z = (p₁ − p₂)/√(p̂(1−p̂)(1/n₁ + 1/n₂)) with p̂ the pooled rate.
    * Exactness: the four cell counts are integers from ONE map-side-
    * combined conditional aggregation; everything after is a fixed
    * IEEE chain on those integers (÷, √, ×, − are all correctly
    * rounded, so both engines produce the bit-identical z), and the
    * significance flag compares that identical double against 1.96.
    * Scale: one aggregation to a 1-row frame — nothing else.
    */
  val q126AbProportions = GraftQuery(
    "q126_ab_proportions",
    (s, dir) => {
      val t = Tables(s, dir)
      val cells = t.orders.agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("n1"),
        sum(when(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F", 1L).otherwise(0L)).as("s1"),
        sum(when(col("o_orderpriority") =!= "1-URGENT", 1L).otherwise(0L))
          .as("n2"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderstatus") === "F", 1L).otherwise(0L)).as("s2"))
      def d(c: Column): Column = c.cast(DoubleType)
      val p1 = d(col("s1")) / d(col("n1"))
      val p2 = d(col("s2")) / d(col("n2"))
      val pPool = d(col("s1") + col("s2")) / d(col("n1") + col("n2"))
      val z = (p1 - p2) /
        sqrt(pPool * (lit(1.0) - pPool) *
          (lit(1.0) / d(col("n1")) + lit(1.0) / d(col("n2"))))
      cells.select(col("n1"), col("s1"), col("n2"), col("s2"),
        p1.as("p1"), p2.as("p2"), z.as("z"),
        (abs(z) > lit(1.96)).as("significant"))
    },
    Some("""
      WITH c AS (
        SELECT
          CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
              THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
              AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS s1,
          CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
              THEN 1 ELSE 0 END) AS BIGINT) AS n2,
          CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
              AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS s2
        FROM orders)
      SELECT n1, s1, n2, s2,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
             CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
             (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt((CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 - CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
               AS z,
             ABS((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt((CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 - CAST(s1 + s2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                 * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))))
               > 1.96 AS significant
      FROM c
    """)
  )

  /** Pixel-width of the M4 downsample (number of time buckets). */
  val M4Buckets = 50L

  /** M4 time-series downsampling of the daily-revenue series — the
    * published error-free line-chart reduction (min, max, first, last
    * per pixel-bucket reproduces the exact rendered polyline at any
    * corpus size): the serving op between a 100 TB time series and a
    * dashboard. Exactness: the bucket index is a TRUE integer
    * division over epoch-day offsets, and all four witnesses are
    * picked by integer struct/tuple ordering with the EARLIEST day
    * breaking value ties — every output is an exact long or a date
    * string. Scale: the day-level cents rollup is the only data-scale
    * shuffle; the bucket spine is ≤ [[M4Buckets]] rows and the global
    * day range joins as a broadcast 1-row frame.
    */
  val q127M4Downsample = GraftQuery(
    "q127_m4_downsample",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = dailyRevenueCents(t)
        .select(col("day"), col("cents"),
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .cast("long").as("ed"),
          date_format(col("day"), "yyyy-MM-dd").as("ds"))
      val span = daily.agg(min(col("ed")).as("mn"), max(col("ed")).as("mx"))
      val bucketed = daily.crossJoin(broadcast(span))
        .withColumn("bucket",
          expr(s"((ed - mn) * $M4Buckets) div (mx - mn + 1)"))
      bucketed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_days"),
          min(struct(col("ed"), col("cents"), col("ds"))).as("f"),
          max(struct(col("ed"), col("cents"), col("ds"))).as("l"),
          min(struct(col("cents"), col("ed"), col("ds"))).as("lo"),
          min(struct((-col("cents")).as("negc"), col("ed"), col("ds")))
            .as("hi"))
        .select(col("bucket"), col("n_days"),
          col("f.ds").as("t_first"), col("f.cents").as("v_first"),
          col("l.ds").as("t_last"), col("l.cents").as("v_last"),
          col("lo.ds").as("t_min"), col("lo.cents").as("v_min"),
          col("hi.ds").as("t_max"), (-col("hi.negc")).as("v_max"))
        .orderBy(col("bucket"))
    },
    Some(s"""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      sp AS (
        SELECT MIN(day - DATE '1970-01-01') AS mn,
               MAX(day - DATE '1970-01-01') AS mx
        FROM daily),
      b AS (
        SELECT d.day, d.cents,
               ((day - DATE '1970-01-01' - mn) * $M4Buckets) // (mx - mn + 1)
                 AS bucket
        FROM daily d, sp),
      r AS (
        SELECT bucket, day, cents,
               row_number() OVER (PARTITION BY bucket ORDER BY day) AS rf,
               row_number() OVER (PARTITION BY bucket ORDER BY day DESC)
                 AS rl,
               row_number() OVER (PARTITION BY bucket ORDER BY cents, day)
                 AS rmin,
               row_number() OVER (PARTITION BY bucket
                 ORDER BY cents DESC, day) AS rmax,
               CAST(COUNT(*) OVER (PARTITION BY bucket) AS BIGINT) AS n_days
        FROM b)
      SELECT CAST(bucket AS BIGINT) AS bucket, n_days,
             MAX(CASE WHEN rf = 1 THEN CAST(day AS VARCHAR) END) AS t_first,
             MAX(CASE WHEN rf = 1 THEN cents END) AS v_first,
             MAX(CASE WHEN rl = 1 THEN CAST(day AS VARCHAR) END) AS t_last,
             MAX(CASE WHEN rl = 1 THEN cents END) AS v_last,
             MAX(CASE WHEN rmin = 1 THEN CAST(day AS VARCHAR) END) AS t_min,
             MAX(CASE WHEN rmin = 1 THEN cents END) AS v_min,
             MAX(CASE WHEN rmax = 1 THEN CAST(day AS VARCHAR) END) AS t_max,
             MAX(CASE WHEN rmax = 1 THEN cents END) AS v_max
      FROM r
      GROUP BY bucket, n_days
      ORDER BY bucket
    """)
  )

  /** Capped (floored-at-zero) running balance per segment — the
    * inventory-position / cash-balance fold b_t = max(0, b_{t-1} +
    * revenue_t − burn) that NO window function can express (the clamp
    * makes each step depend on the clamped previous step, not on a
    * prefix aggregate — the classic "running sum with reset"). The
    * engine runs it as a true SECONDARY SORT: repartition by segment,
    * sortWithinPartitions by (segment, day), one mapPartitions fold
    * with O(1) state per segment and segment-change detection — no
    * in-memory group materialization, the 100 TB shape for any keyed
    * sequential fold. Burn = ⌊segment total / days⌋ so the clamp
    * genuinely engages. All arithmetic is exact longs; the DuckDB
    * oracle restates the fold as a WITH RECURSIVE chain over the
    * day-ranked frame — full cross-engine parity for a stateful
    * recurrence.
    */
  val q128CappedRunningSum = GraftQuery(
    "q128_capped_running_sum",
    (s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val daily = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val withBurn = daily
        .join(broadcast(daily.groupBy(col("segment"))
          .agg(sum(col("cents")).as("sc"), count(lit(1)).as("nd"))
          .select(col("segment"), expr("sc div nd").as("burn"))),
          Seq("segment"))
        .select(col("segment"),
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
            .as("ed"),
          col("cents"), col("burn"))
      val folded = withBurn
        .repartition(col("segment"))
        .sortWithinPartitions(col("segment"), col("ed"))
        .as[(String, Long, Long, Long)]
        .mapPartitions { it =>
          val out = Seq.newBuilder[(String, Long, Long, Long, Long, Long)]
          var seg: String = null
          var n = 0L; var burn = 0L; var bal = 0L; var mx = 0L; var hits = 0L
          def emit(): Unit =
            if (seg != null) out += ((seg, n, burn, bal, mx, hits))
          while (it.hasNext) {
            val (sg, _, cents, b) = it.next()
            if (sg != seg) { emit(); seg = sg; n = 0L; burn = b
              bal = 0L; mx = 0L; hits = 0L }
            val raw = bal + cents - burn
            bal = if (raw < 0L) { hits += 1L; 0L } else raw
            if (bal > mx) mx = bal
            n += 1L
          }
          emit()
          out.result().iterator
        }
        .toDF("segment", "n_days", "burn", "final_balance", "max_balance",
          "n_floor_hits")
      folded.orderBy(col("segment"))
    },
    Some("""
      WITH RECURSIVE daily AS (
        SELECT c.c_mktsegment AS segment, CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      k AS (
        SELECT segment, CAST(SUM(cents) // COUNT(*) AS BIGINT) AS burn,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1),
      r AS (
        SELECT d.segment, d.cents, k.burn, k.n_days,
               CAST(row_number() OVER (PARTITION BY d.segment ORDER BY d.day)
                 AS BIGINT) AS rn
        FROM daily d JOIN k ON k.segment = d.segment),
      rec AS (
        SELECT segment, rn, n_days, burn,
               GREATEST(0, cents - burn) AS bal,
               GREATEST(0, cents - burn) AS mx,
               CASE WHEN cents - burn < 0 THEN 1 ELSE 0 END AS hits
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.segment, r.rn, r.n_days, r.burn,
               GREATEST(0, rec.bal + r.cents - r.burn),
               GREATEST(rec.mx, GREATEST(0, rec.bal + r.cents - r.burn)),
               rec.hits + CASE WHEN rec.bal + r.cents - r.burn < 0
                 THEN 1 ELSE 0 END
        FROM rec JOIN r ON r.segment = rec.segment AND r.rn = rec.rn + 1)
      SELECT segment, n_days, burn,
             CAST(bal AS BIGINT) AS final_balance,
             CAST(mx AS BIGINT) AS max_balance,
             CAST(hits AS BIGINT) AS n_floor_hits
      FROM rec WHERE rn = n_days
      ORDER BY segment
    """)
  )

  /** Cohort LTV accumulation curves — q47's retention counts upgraded
    * to the revenue readout growth teams actually plot: customers
    * cohorted by first-order month, each cohort's revenue accumulated
    * by month-age, normalized per cohort member. Exactness: month age
    * is pure integer calendar arithmetic, revenue stays cents-exact
    * through the cumulative window, and the per-member curve is one
    * division of exact longs. Scale: the first-order rollup and the
    * order join are the two custkey exchanges; the cumulative window
    * runs over the |cohorts|·|ages| DOMAIN frame, never rows.
    */
  val q129CohortLtvCurve = GraftQuery(
    "q129_cohort_ltv_curve",
    (s, dir) => {
      val t = Tables(s, dir)
      val first = t.orders.groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("fd"))
        .select(col("o_custkey").as("ck"),
          monthIndex(col("fd")).as("cm"),
          date_format(col("fd"), "yyyy-MM").as("cohort_month"))
      val sizes = first.groupBy(col("cohort_month"))
        .agg(count(lit(1)).as("cohort_size"))
      val cells = t.orders
        .join(first, col("o_custkey") === col("ck"))
        .groupBy(col("cohort_month"),
          (monthIndex(col("o_orderdate")) - col("cm")).as("age_months"))
        .agg(countDistinct(col("o_custkey")).as("n_active"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val wCum = Window.partitionBy(col("cohort_month"))
        .orderBy(col("age_months"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .join(broadcast(sizes), Seq("cohort_month"))
        .withColumn("cum_cents", sum(col("cents")).over(wCum))
        .select(col("cohort_month"), col("age_months"), col("n_active"),
          col("cents"), col("cum_cents"), col("cohort_size"),
          (col("cum_cents").cast(DoubleType) /
            col("cohort_size").cast(DoubleType)).as("ltv_per_member"))
        .orderBy(col("cohort_month"), col("age_months"))
    },
    Some("""
      WITH f AS (
        SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS fd
        FROM orders GROUP BY 1),
      fc AS (
        SELECT o_custkey, strftime(fd, '%Y-%m') AS cohort_month,
               year(fd) * 12 + month(fd) AS cm
        FROM f),
      cells AS (
        SELECT fc.cohort_month,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                 - fc.cm AS BIGINT) AS age_months,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM orders o JOIN fc ON fc.o_custkey = o.o_custkey
        GROUP BY 1, 2),
      sz AS (
        SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM fc GROUP BY 1)
      SELECT c.cohort_month, c.age_months, c.n_active, c.cents,
             CAST(SUM(c.cents) OVER (PARTITION BY c.cohort_month
               ORDER BY c.age_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_cents,
             s.cohort_size,
             CAST(CAST(SUM(c.cents) OVER (PARTITION BY c.cohort_month
               ORDER BY c.age_months
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS DOUBLE) / CAST(s.cohort_size AS DOUBLE) AS ltv_per_member
      FROM cells c JOIN sz s ON s.cohort_month = c.cohort_month
      ORDER BY 1, 2
    """)
  )

  /** Growth-accounting matrix over customer order activity — the
    * standard MAU decomposition every growth team reports: per month,
    * active customers split into NEW (first-ever month), RETAINED
    * (also active the previous month), and RESURRECTED (active before
    * but not last month), plus CHURNED (active last month, not this
    * one). The accounting identities active = new + retained +
    * resurrected and churned_t = active_{t-1} − retained_t hold
    * exactly and are spec-pinned. Exactness: months are integer
    * calendar indices, every class is an integer count from set
    * relations on the (customer, month) activity frame. Scale: the
    * distinct-activity rollup is the one data-scale shuffle; the
    * self-joins run on the customer×months activity frame keyed by
    * (customer, month) — co-partitioned, and the month spine is
    * domain-sized.
    */
  val q130GrowthAccounting = GraftQuery(
    "q130_growth_accounting",
    (s, dir) => {
      val t = Tables(s, dir)
      val act = t.orders
        .select(col("o_custkey").as("ck"),
          monthIndex(col("o_orderdate")).as("m"))
        .distinct()
        .cache()
      val firstM = act.groupBy(col("ck")).agg(min(col("m")).as("fm"))
      val prev = act.select(col("ck"), (col("m") + 1L).as("m"),
        lit(1L).as("was_prev"))
      val classified = act
        .join(broadcast(firstM), Seq("ck"))
        .join(prev, Seq("ck", "m"), "left")
        .select(col("ck"), col("m"),
          when(col("m") === col("fm"), "new")
            .when(col("was_prev").isNotNull, "retained")
            .otherwise("resurrected").as("cls"))
      val counts = classified.groupBy(col("m"))
        .agg(count(lit(1)).as("active"),
          sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when(col("cls") === "retained", 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
            .as("n_resurrected"))
      val churn = counts.select((col("m") + 1L).as("m"),
        (col("active")).as("prev_active"))
      counts.join(churn, Seq("m"), "left")
        .select(col("m"),
          format_string("%04d-%02d", expr("(m - 1) div 12"),
            pmod(col("m") - 1, lit(12L)) + 1).as("month"),
          col("active"), col("n_new"), col("n_retained"),
          col("n_resurrected"),
          (coalesce(col("prev_active"), lit(0L)) - col("n_retained"))
            .as("n_churned"))
        .drop(col("m"))
        .orderBy(col("month"))
    },
    Some("""
      WITH act AS (
        SELECT DISTINCT o_custkey AS ck,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                 AS m
        FROM orders),
      fm AS (SELECT ck, MIN(m) AS fm FROM act GROUP BY 1),
      cls AS (
        SELECT a.ck, a.m,
               CASE WHEN a.m = f.fm THEN 'new'
                    WHEN p.ck IS NOT NULL THEN 'retained'
                    ELSE 'resurrected' END AS cls
        FROM act a
        JOIN fm f ON f.ck = a.ck
        LEFT JOIN act p ON p.ck = a.ck AND p.m = a.m - 1),
      cnt AS (
        SELECT m, CAST(COUNT(*) AS BIGINT) AS active,
               CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_new,
               CAST(SUM(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_resurrected
        FROM cls GROUP BY 1)
      SELECT printf('%04d-%02d', (c.m - 1) // 12, (c.m - 1) % 12 + 1)
               AS month,
             c.active, c.n_new, c.n_retained, c.n_resurrected,
             COALESCE(p.active, 0) - c.n_retained AS n_churned
      FROM cnt c LEFT JOIN cnt p ON p.m = c.m - 1
      ORDER BY month
    """)
  )

  /** Difference-in-differences estimate — the workhorse quasi-
    * experimental readout (q87's CUPED sibling): average order value
    * for the BUILDING-segment "treatment" cohort vs the rest, before
    * and after a 1996-01-01 policy cutoff; DiD = (T,post − T,pre) −
    * (C,post − C,pre) nets out both the level difference between the
    * cohorts and the common time trend. Exactness: the four cells'
    * sums are exact decimals and their counts integers from ONE
    * map-side-combined conditional aggregation; each mean is one
    * division and the DiD a fixed IEEE chain on those four doubles —
    * bit-identical cross-engine. Scale: one broadcast dim join + one
    * aggregation to a single row.
    */
  val q131DidEffect = GraftQuery(
    "q131_did_effect",
    (s, dir) => {
      val t = Tables(s, dir)
      val cut = lit("1996-01-01 00:00:00").cast("timestamp")
      val treated = col("c_mktsegment") === "BUILDING"
      val post = col("o_orderdate") >= cut
      def cell(p: Column, nm: String): Seq[Column] = Seq(
        sum(when(p, 1L).otherwise(0L)).as(s"n_$nm"),
        sum(when(p, dec2(col("o_totalprice")))).as(s"s_$nm"))
      val cs = cell(treated && !post, "t_pre") ++
        cell(treated && post, "t_post") ++
        cell(!treated && !post, "c_pre") ++
        cell(!treated && post, "c_post")
      val cells = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
        .agg(cs.head, cs.tail: _*)
      def mean(nm: String): Column =
        col(s"s_$nm").cast(DoubleType) / col(s"n_$nm").cast(DoubleType)
      cells.select(
        col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        mean("t_pre").as("avg_t_pre"), mean("t_post").as("avg_t_post"),
        mean("c_pre").as("avg_c_pre"), mean("c_post").as("avg_c_post"),
        ((mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre")))
          .as("did"))
    },
    Some("""
      WITH j AS (
        SELECT o.o_totalprice, o.o_orderdate,
               c.c_mktsegment = 'BUILDING' AS treated,
               o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AS post
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      m AS (
        SELECT
          CAST(SUM(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END)
            AS BIGINT) AS n_t_pre,
          CAST(SUM(CASE WHEN treated AND post THEN 1 ELSE 0 END)
            AS BIGINT) AS n_t_post,
          CAST(SUM(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END)
            AS BIGINT) AS n_c_pre,
          CAST(SUM(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END)
            AS BIGINT) AS n_c_post,
          CAST(CAST(SUM(CASE WHEN treated AND NOT post
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS VARCHAR)
            AS DOUBLE) AS s_t_pre,
          CAST(CAST(SUM(CASE WHEN treated AND post
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS VARCHAR)
            AS DOUBLE) AS s_t_post,
          CAST(CAST(SUM(CASE WHEN NOT treated AND NOT post
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS VARCHAR)
            AS DOUBLE) AS s_c_pre,
          CAST(CAST(SUM(CASE WHEN NOT treated AND post
            THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS VARCHAR)
            AS DOUBLE) AS s_c_post
        FROM j)
      SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
             s_t_pre / CAST(n_t_pre AS DOUBLE) AS avg_t_pre,
             s_t_post / CAST(n_t_post AS DOUBLE) AS avg_t_post,
             s_c_pre / CAST(n_c_pre AS DOUBLE) AS avg_c_pre,
             s_c_post / CAST(n_c_post AS DOUBLE) AS avg_c_post,
             (s_t_post / CAST(n_t_post AS DOUBLE)
              - s_t_pre / CAST(n_t_pre AS DOUBLE))
             - (s_c_post / CAST(n_c_post AS DOUBLE)
                - s_c_pre / CAST(n_c_pre AS DOUBLE)) AS did
      FROM m
    """)
  )

  /** Price-volume bridge (the FP&A revenue waterfall): per part brand,
    * the 1996→1997 revenue change decomposed into a PRICE effect
    * ((p̄₉₇ − p̄₉₆)·q₉₇) and a VOLUME effect (p̄₉₆·(q₉₇ − q₉₆)) with
    * the exact algebraic identity price + volume = ΔRev (spec-pinned:
    * rev₉₇ − rev₉₆ = (p̄₉₇−p̄₉₆)·q₉₇ + p̄₉₆·(q₉₇−q₉₆) holds for
    * realized average prices by construction). Exactness: revenue
    * sums are exact decimals, quantities exact longs, both from ONE
    * conditional aggregation per brand; the effects are a fixed IEEE
    * chain on those exact operands — bit-identical cross-engine.
    * Scale: one broadcast part join + one map-side-combined
    * aggregation to a |brands|-sized frame.
    */
  val q132PvmBridge = GraftQuery(
    "q132_pvm_bridge",
    (s, dir) => {
      val t = Tables(s, dir)
      def yr(y: Int): Column = year(col("l_shipdate")) === y
      val cells = t.lineitem
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(when(yr(1996), dec2(col("l_extendedprice")))).as("r96"),
          sum(when(yr(1996), col("l_quantity").cast("long"))
            .otherwise(0L)).as("q96"),
          sum(when(yr(1997), dec2(col("l_extendedprice")))).as("r97"),
          sum(when(yr(1997), col("l_quantity").cast("long"))
            .otherwise(0L)).as("q97"))
      def d(c: Column): Column = c.cast(DoubleType)
      val p96 = d(col("r96")) / d(col("q96"))
      val p97 = d(col("r97")) / d(col("q97"))
      cells.select(col("p_brand"),
        d(col("r96")).as("rev_1996"), col("q96").as("qty_1996"),
        d(col("r97")).as("rev_1997"), col("q97").as("qty_1997"),
        ((p97 - p96) * d(col("q97"))).as("price_effect"),
        (p96 * d(col("q97") - col("q96"))).as("volume_effect"))
        .orderBy(col("p_brand"))
    },
    Some("""
      WITH cells AS (
        SELECT p.p_brand,
          CAST(CAST(SUM(CASE WHEN year(l.l_shipdate) = 1996
            THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) END) AS VARCHAR)
            AS DOUBLE) AS r96,
          CAST(SUM(CASE WHEN year(l.l_shipdate) = 1996
            THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q96,
          CAST(CAST(SUM(CASE WHEN year(l.l_shipdate) = 1997
            THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) END) AS VARCHAR)
            AS DOUBLE) AS r97,
          CAST(SUM(CASE WHEN year(l.l_shipdate) = 1997
            THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q97
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1)
      SELECT p_brand, r96 AS rev_1996, q96 AS qty_1996,
             r97 AS rev_1997, q97 AS qty_1997,
             (r97 / CAST(q97 AS DOUBLE) - r96 / CAST(q96 AS DOUBLE))
               * CAST(q97 AS DOUBLE) AS price_effect,
             (r96 / CAST(q96 AS DOUBLE)) * CAST(q97 - q96 AS DOUBLE)
               AS volume_effect
      FROM cells
      ORDER BY p_brand
    """)
  )

  /** ABC cumulative-share cutoffs (permille of total revenue). */
  val AbcCutA = 800L
  val AbcCutB = 950L

  /** ABC inventory classification: parts ranked by lifetime revenue,
    * class A = the head of the ranking up to 80% cumulative revenue
    * share, B to 95%, C the tail — the Pareto workhorse of inventory
    * and catalog management (class from the cumulative BEFORE each
    * part, so a dominant head item stays in A). Exactness: shares
    * never become floats —
    * the class compare is (cum−cents)·1000 < cutoff·total in exact LONGS
    * (headroom to ~$9·10¹³ lifetime revenue; widen to decimal past
    * that), with
    * revenue-desc + partkey ranking making the cumulative total tie-
    * free. Scale: the per-part rollup is the one data-scale shuffle;
    * the cumulative runs through the range-partitioned two-pass
    * cumsum ([[graft.functions.DistributedRank.withPartitionedCumsum]]
    * — no single-partition ordered window even if parts outgrow the
    * dimension), and the output is 3 class rows.
    */
  val q133AbcClassification = GraftQuery(
    "q133_abc_classification",
    (s, dir) => {
      val t = Tables(s, dir)
      val perPart = t.lineitem
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val tot = perPart.agg(sum(col("cents")).as("total"))
      // the revenue cumulative runs through the range-partitioned
      // two-pass cumsum (graft.functions.DistributedRank) — |parts|
      // is bounded at TPC-H cardinalities, but the row-scale form
      // costs the same here and removes the one unpartitioned
      // ordered window this query used to carry
      val (cumd, release) = graft.functions.DistributedRank
        .withPartitionedCumsum(perPart,
          Seq(col("cents").desc, col("l_partkey")), "cents", "cum", 32)
      // class from the cumulative BEFORE the current part (standard
      // ABC: the head item belongs to A even when it alone carries
      // more than the A cutoff — review finding: the
      // cumulative-inclusive compare would push a dominant head item
      // out of A on skewed data)
      val classed = cumd.crossJoin(broadcast(tot))
        .withColumn("cls",
          when((col("cum") - col("cents")) * 1000L <
            lit(AbcCutA) * col("total"), "A")
            .when((col("cum") - col("cents")) * 1000L <
              lit(AbcCutB) * col("total"), "B")
            .otherwise("C"))
      val out = classed.groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("cents"),
          first(col("total")).as("total"))
        .select(col("cls"), col("n_parts"), col("cents"),
          (col("cents").cast(DoubleType) / col("total").cast(DoubleType))
            .as("revenue_share"))
        .orderBy(col("cls"))
      out.persist().count()
      release()
      out
    },
    Some(s"""
      WITH pp AS (
        SELECT l_partkey,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM lineitem GROUP BY 1),
      t AS (SELECT CAST(SUM(cents) AS BIGINT) AS total FROM pp),
      c AS (
        SELECT pp.cents, t.total,
               CAST(SUM(pp.cents) OVER (ORDER BY pp.cents DESC, pp.l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum
        FROM pp, t),
      k AS (
        SELECT CASE WHEN (cum - cents) * 1000 < $AbcCutA * total THEN 'A'
                    WHEN (cum - cents) * 1000 < $AbcCutB * total THEN 'B'
                    ELSE 'C' END AS cls,
               cents, total
        FROM c)
      SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(SUM(cents) AS BIGINT) AS cents,
             CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE)
               / CAST(total AS DOUBLE) AS revenue_share
      FROM k
      GROUP BY cls, total
      ORDER BY cls
    """)
  )

  /** Session gap (micros) for the concurrency sweep — 30 minutes,
    * matching the streaming sessionization. */
  val ConcurrencyGapMicros: Long = 30L * 60L * 1000000L

  /** Peak concurrent sessions per day — the interval-overlap sweep
    * (capacity planning's "how many users were online at once"):
    * sessionize events per user by 30-min gaps, emit +1 at each
    * session start and −1 just after its end, and take the daily
    * maximum of the running boundary sum. The sweep is decomposed the
    * way a 100 TB scan must be: per-day windows (partitioned, never a
    * global single-partition ordered scan) plus a day-level CARRY-IN
    * from the cumulative of per-day net sums over the day-DOMAIN
    * frame — the classic two-phase prefix-scan. Tie discipline: at an
    * equal microsecond, +1s order before −1s (delta DESC), which
    * makes the daily MAX deterministic under any permutation of equal
    * boundaries (a +1 run's intermediate values are dominated by its
    * last, a −1 run's by its first). The day-start concurrency
    * (carry-in itself) participates in the max. All integers.
    */
  val q134MaxConcurrency = GraftQuery(
    "q134_max_concurrency",
    (s, dir) => {
      val t = Tables(s, dir)
      val ev = t.events.select(col("user_id"),
        unix_micros(col("ts")).as("us"))
      val wU = Window.partitionBy(col("user_id")).orderBy(col("us"))
      val sess = ev
        .withColumn("prev", lag(col("us"), 1).over(wU))
        .withColumn("brk",
          when(col("prev").isNull ||
            col("us") - col("prev") > ConcurrencyGapMicros, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(
          wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
      val bounds = sess.select(col("start_us").as("us"), lit(1L).as("d"))
        .unionAll(sess.select((col("end_us") + 1L).as("us"),
          lit(-1L).as("d")))
        .withColumn("day", to_date(timestamp_micros(col("us"))))
      val wDay = Window.partitionBy(col("day"))
        .orderBy(col("us"), col("d").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withinMax = bounds
        .withColumn("run", sum(col("d")).over(wDay))
        .groupBy(col("day"))
        .agg(max(col("run")).as("in_day_max"),
          sum(col("d")).as("net"),
          sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"),
          sum(when(col("d") === -1L, 1L).otherwise(0L)).as("n_ends"))
      val carried = withinMax
        .withColumn("carry_in",
          coalesce(sum(col("net")).over(
            Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      carried
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_starts"), col("n_ends"), col("carry_in"),
          greatest(col("carry_in"),
            col("carry_in") + col("in_day_max")).as("max_concurrency"))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) AS us FROM events),
      m AS (
        SELECT user_id, us,
               CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
                      IS NULL
                     OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                      > $ConcurrencyGapMicros
                    THEN 1 ELSE 0 END AS brk
        FROM ev),
      sid AS (
        SELECT user_id, us,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM m),
      sess AS (
        SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us
        FROM sid GROUP BY 1, 2),
      b AS (
        SELECT start_us AS us, 1 AS d FROM sess
        UNION ALL
        SELECT end_us + 1, -1 FROM sess),
      bd AS (
        SELECT us, d, CAST(make_timestamp(us) AS DATE) AS day FROM b),
      w AS (
        SELECT day, us, d,
               SUM(d) OVER (PARTITION BY day ORDER BY us, d DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        FROM bd),
      dday AS (
        SELECT day, CAST(MAX(run) AS BIGINT) AS in_day_max,
               CAST(SUM(d) AS BIGINT) AS net,
               CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_starts,
               CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_ends
        FROM w GROUP BY 1),
      c AS (
        SELECT day, n_starts, n_ends, in_day_max,
               CAST(COALESCE(SUM(net) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS carry_in
        FROM dday)
      SELECT CAST(day AS VARCHAR) AS day, n_starts, n_ends, carry_in,
             GREATEST(carry_in, carry_in + in_day_max) AS max_concurrency
      FROM c
      ORDER BY day
    """)
  )

  /** Rolling window length (days) for the rolling correlation. */
  val RollCorrDays = 30

  /** Rolling Pearson correlation over the trailing 30 OBSERVED days
    * of daily view and purchase event counts (a ROWS frame over the
    * active-day spine — on a feed with gap days it spans more than 30
    * calendar days; a RANGE-interval frame is the calendar-strict
    * variant) — the co-movement monitor behind "did the
    * funnel decouple this month": per day over the trailing window,
    * corr from the five exact-integer moments (Σx, Σy, Σxy, Σx², Σy²
    * — daily counts are longs, products fit trivially), each readout
    * a fixed IEEE chain on those integers, NO rounding — the q116
    * exact-moment rule applied per window frame. Windows run over the
    * day-DOMAIN frame (≤ a few thousand rows; single ordered spine —
    * at corpus scale the same moments come from the q134 two-phase
    * prefix decomposition). Degenerate frames (zero variance) emit
    * NULL in both engines.
    */
  val q136RollingCorrelation = GraftQuery(
    "q136_rolling_correlation",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = t.events
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(-(RollCorrDays - 1).toLong, Window.currentRow)
      def d(c: Column): Column = c.cast(DoubleType)
      val n = count(lit(1)).over(w).cast("long")
      val sx = sum(col("x")).over(w)
      val sy = sum(col("y")).over(w)
      val sxy = sum(col("x") * col("y")).over(w)
      val sxx = sum(col("x") * col("x")).over(w)
      val syy = sum(col("y") * col("y")).over(w)
      val num = d(n) * d(sxy) - d(sx) * d(sy)
      val den = sqrt(d(n) * d(sxx) - d(sx) * d(sx)) *
        sqrt(d(n) * d(syy) - d(sy) * d(sy))
      daily
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("x").as("views"), col("y").as("purchases"),
          n.as("win_n"),
          when(den === 0.0, lit(null).cast(DoubleType))
            .otherwise(num / den).as("roll_corr"))
        .orderBy(col("day"))
    },
    Some(s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                 AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS BIGINT) AS y
        FROM events GROUP BY 1),
      m AS (
        SELECT day, x, y,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
               CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
               CAST(SUM(y * y) OVER w AS BIGINT) AS syy
        FROM daily
        WINDOW w AS (ORDER BY day
          ROWS BETWEEN ${RollCorrDays - 1} PRECEDING AND CURRENT ROW))
      SELECT CAST(day AS VARCHAR) AS day, x AS views, y AS purchases,
             n AS win_n,
             CASE WHEN (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) = 0
                  THEN NULL
                  ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             END AS roll_corr
      FROM m
      ORDER BY day
    """)
  )

  /** Equi-width histogram buckets. */
  val HistBuckets = 40L

  /** Equi-width histogram of order values — dask.array.histogram /
    * numpy.histogram parity next to the equi-DEPTH q43 binning:
    * bucket = (cents − min)·k div (max − min + 1), a TRUE integer
    * division on exact cents, with the (possibly empty) bucket spine
    * densified by a sequence join so the output is always exactly k
    * rows — absent buckets report 0, the way a plotting library
    * expects. One aggregation to the min/max frame (broadcast), one
    * map-side-combined bucket count, one ≤k-row spine join.
    */
  val q137Histogram = GraftQuery(
    "q137_histogram",
    (s, dir) => {
      val t = Tables(s, dir)
      val cents = t.orders.select(
        round(col("o_totalprice") * 100).cast("long").as("c"))
      val mm = cents.agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
      val counts = cents.crossJoin(broadcast(mm))
        .select(expr(s"((c - mn) * $HistBuckets) div (mx - mn + 1)")
          .as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      val spine = s.range(0, HistBuckets).toDF("bucket")
      spine.join(counts, Seq("bucket"), "left")
        .crossJoin(broadcast(mm))
        .select(col("bucket"),
          (col("mn") + expr(s"(bucket * (mx - mn + 1)) div $HistBuckets"))
            .as("lo_cents"),
          coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("bucket"))
    },
    Some(s"""
      WITH c AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      mm AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM c),
      b AS (
        SELECT ((c.c - mm.mn) * $HistBuckets) // (mm.mx - mm.mn + 1)
                 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM c, mm GROUP BY 1),
      spine AS (SELECT unnest(range(0, $HistBuckets)) AS bucket)
      SELECT CAST(s.bucket AS BIGINT) AS bucket,
             CAST(mm.mn + (s.bucket * (mm.mx - mm.mn + 1)) // $HistBuckets
               AS BIGINT) AS lo_cents,
             COALESCE(b.n, 0) AS n
      FROM spine s CROSS JOIN mm LEFT JOIN b ON b.bucket = s.bucket
      ORDER BY bucket
    """)
  )

  /** One-way ANOVA across weekday groups of daily revenue — "does the
    * day of week move revenue at all": F = (SSB/(k−1)) / (SSW/(n−k))
    * from per-group exact moments. Completes the hypothesis-test
    * family (Welch t q71, χ² q96, KS q105, two-proportion z q126)
    * with the k-group omnibus test. Exactness: daily cents are exact
    * longs; per-group Σx and Σx² widen through DECIMAL (cents² ≈ 10¹⁷
    * per day — past 2⁶³ when summed at corpus scale); SSB/SSW are a
    * fixed IEEE chain on the VARCHAR-routed exact renders —
    * bit-identical cross-engine. Scale: one day rollup, one 7-row
    * group aggregate, one 1-row readout.
    */
  val q138AnovaWeekday = GraftQuery(
    "q138_anova_weekday",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = dailyRevenueCents(t)
        .select((weekday(col("day")) + 1).cast("long").as("dow"),
          col("cents").as("c"))
      val g = daily.groupBy(col("dow"))
        .agg(count(lit(1)).as("n"),
          sum(col("c")).as("sx"),
          sum(col("c").cast(DecimalType(38, 0)) * col("c")).as("sxx"))
      def d(c: Column): Column = c.cast(DoubleType)
      // Σ_g (Σx_g)²/n_g must NOT be a floating aggregate (partition-
      // order-dependent ulps): with exactly 7 dow groups, pivot the
      // per-group terms into columns and add them in EXPLICIT
      // syntactic order — the oracle spells the identical chain
      val term = d(col("sx").cast(DecimalType(38, 0)) * col("sx")) /
        d(col("n"))
      val pivots = (1 to 7).map(i =>
        sum(when(col("dow") === i.toLong, term)).as(s"t$i"))
      val aggs = Seq(count(lit(1)).as("k"), sum(col("n")).as("n_tot"),
        sum(col("sx")).as("sx_tot"), sum(col("sxx")).as("sxx_tot")) ++ pivots
      val m = g.agg(aggs.head, aggs.tail: _*)
      val sumSqOverN = (1 to 7).map(i => coalesce(col(s"t$i"), lit(0.0)))
        .reduceLeft(_ + _)
      val msb = (sumSqOverN -
        d(col("sx_tot").cast(DecimalType(38, 0)) * col("sx_tot")) /
          d(col("n_tot"))) / d(col("k") - 1)
      val msw = (d(col("sxx_tot")) - sumSqOverN) / d(col("n_tot") - col("k"))
      m.select(col("k"), col("n_tot"), msb.as("msb"), msw.as("msw"),
        (msb / msw).as("f_stat"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS c
        FROM orders GROUP BY 1),
      dw AS (SELECT isodow(day) AS dow, c FROM daily),
      g AS (
        SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS sx,
               SUM(CAST(c AS HUGEINT) * c) AS sxx
        FROM dw GROUP BY 1),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS n_tot,
               CAST(SUM(sx) AS BIGINT) AS sx_tot,
               CAST(CAST(SUM(sxx) AS VARCHAR) AS DOUBLE) AS sxx_tot,
               COALESCE(MAX(CASE WHEN dow = 1 THEN
                 CAST(CAST(CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) END), 0.0)
               + COALESCE(MAX(CASE WHEN dow = 2 THEN
                 CAST(CAST(CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) END), 0.0)
               + COALESCE(MAX(CASE WHEN dow = 3 THEN
                 CAST(CAST(CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) END), 0.0)
               + COALESCE(MAX(CASE WHEN dow = 4 THEN
                 CAST(CAST(CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) END), 0.0)
               + COALESCE(MAX(CASE WHEN dow = 5 THEN
                 CAST(CAST(CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) END), 0.0)
               + COALESCE(MAX(CASE WHEN dow = 6 THEN
                 CAST(CAST(CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) END), 0.0)
               + COALESCE(MAX(CASE WHEN dow = 7 THEN
                 CAST(CAST(CAST(sx AS HUGEINT) * sx AS VARCHAR) AS DOUBLE)
                   / CAST(n AS DOUBLE) END), 0.0) AS sum_sq_over_n
        FROM g)
      SELECT k, n_tot,
             (sum_sq_over_n
              - CAST(CAST(CAST(sx_tot AS HUGEINT) * sx_tot AS VARCHAR)
                  AS DOUBLE) / CAST(n_tot AS DOUBLE))
               / CAST(k - 1 AS DOUBLE) AS msb,
             (sxx_tot - sum_sq_over_n) / CAST(n_tot - k AS DOUBLE) AS msw,
             ((sum_sq_over_n
               - CAST(CAST(CAST(sx_tot AS HUGEINT) * sx_tot AS VARCHAR)
                   AS DOUBLE) / CAST(n_tot AS DOUBLE))
               / CAST(k - 1 AS DOUBLE))
             / ((sxx_tot - sum_sq_over_n) / CAST(n_tot - k AS DOUBLE))
               AS f_stat
      FROM m
    """)
  )

  /** Mann-Kendall trend test on the daily-revenue series — the
    * nonparametric "is this KPI actually trending" monitor (no
    * linearity or normality assumption, robust to spikes — the
    * monotone complement of the parametric q117 OLS slope):
    * S = Σ_{i<j} sign(x_j − x_i) over the day-ordered series, tie-
    * corrected variance, continuity-corrected z. Exactness: S and
    * both variance terms are pure integer arithmetic (n(n−1)(2n+5)
    * ≈ 3·10¹⁰ at a decade of days — long-safe); z is one fixed IEEE
    * chain. Scale: the pair comparison is a self-join of the
    * day-DOMAIN frame (days², not rows² — bounded by the calendar,
    * ~3M pairs a decade); the tie spectrum is one value-group count.
    */
  val q139MannKendall = GraftQuery(
    "q139_mann_kendall",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = dailyRevenueCents(t)
        .select(col("day"), col("cents").as("c"))
        .cache()
      val a = daily.select(col("day").as("di"), col("c").as("xi"))
      val b = daily.select(col("day").as("dj"), col("c").as("xj"))
      val sPairs = a.join(b, col("di") < col("dj"))
        .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"))
      val nTies = daily.groupBy(col("c")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5L))
          .as("tie_term"),
          sum(col("t")).as("n"))
      def d(c: Column): Column = c.cast(DoubleType)
      val varNum = col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5L) -
        col("tie_term")
      sPairs.crossJoin(broadcast(nTies))
        .select(col("n").as("n_days"), col("s_stat"),
          varNum.as("var18_num"),
          when(col("s_stat") > 0,
            (d(col("s_stat")) - 1.0) / sqrt(d(varNum) / 18.0))
            .when(col("s_stat") < 0,
              (d(col("s_stat")) + 1.0) / sqrt(d(varNum) / 18.0))
            .otherwise(0.0).as("z"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS c
        FROM orders GROUP BY 1),
      sp AS (
        SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
                             WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
                 AS s_stat
        FROM daily a JOIN daily b ON a.day < b.day),
      tt AS (
        SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
               CAST(SUM(t) AS BIGINT) AS n
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c))
      SELECT tt.n AS n_days, sp.s_stat,
             CAST(tt.n * (tt.n - 1) * (2 * tt.n + 5) - tt.tie_term
               AS BIGINT) AS var18_num,
             CASE WHEN sp.s_stat > 0 THEN
                    (CAST(sp.s_stat AS DOUBLE) - 1.0)
                    / sqrt(CAST(tt.n * (tt.n - 1) * (2 * tt.n + 5)
                        - tt.tie_term AS DOUBLE) / 18.0)
                  WHEN sp.s_stat < 0 THEN
                    (CAST(sp.s_stat AS DOUBLE) + 1.0)
                    / sqrt(CAST(tt.n * (tt.n - 1) * (2 * tt.n + 5)
                        - tt.tie_term AS DOUBLE) / 18.0)
                  ELSE 0.0 END AS z
      FROM sp, tt
    """)
  )

  /** Movers reported by the week-over-week screen. */
  val TopMovers = 20

  /** Week-over-week top movers: the brands whose weekly revenue moved
    * most vs the prior week — the screening readout behind every
    * "what changed" dashboard. Delta is exact cents via lag() over
    * the (brand × week) DOMAIN frame (weeks are calendar-bounded);
    * the top-k is |Δ| desc with (brand, week) tie-breaks making the
    * LIMIT deterministic, TakeOrderedAndProject at plan level. Weeks
    * with no prior observation are excluded (lag null), and "prior
    * week" means the brand's previous OBSERVED week (a zero-sale gap
    * week makes the delta span it) — both engines state that.
    * Monday-start weeks via date_trunc.
    */
  val q140TopMovers = GraftQuery(
    "q140_top_movers",
    (s, dir) => {
      val t = Tables(s, dir)
      val weekly = t.lineitem
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          date_format(date_trunc("week", col("l_shipdate")), "yyyy-MM-dd")
            .as("week"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("cents"))
      val wk = Window.partitionBy(col("p_brand")).orderBy(col("week"))
      weekly
        .withColumn("prev", lag(col("cents"), 1).over(wk))
        .filter(col("prev").isNotNull)
        .withColumn("delta", col("cents") - col("prev"))
        .select(col("p_brand"), col("week"), col("prev").as("prev_cents"),
          col("cents"), col("delta"))
        .orderBy(abs(col("delta")).desc, col("p_brand"), col("week"))
        .limit(TopMovers)
    },
    Some(s"""
      WITH weekly AS (
        SELECT p.p_brand,
               strftime(date_trunc('week', l.l_shipdate), '%Y-%m-%d')
                 AS week,
               CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2),
      d AS (
        SELECT p_brand, week,
               lag(cents) OVER (PARTITION BY p_brand ORDER BY week)
                 AS prev_cents,
               cents
        FROM weekly)
      SELECT p_brand, week, CAST(prev_cents AS BIGINT) AS prev_cents,
             cents, CAST(cents - prev_cents AS BIGINT) AS delta
      FROM d WHERE prev_cents IS NOT NULL
      ORDER BY ABS(cents - prev_cents) DESC, p_brand, week
      LIMIT $TopMovers
    """)
  )

  /** New-vs-repeat revenue split per month — the first-order BI
    * decomposition of any revenue line (acquisition vs retention
    * dollars), the revenue companion of q130's customer counts: an
    * order is NEW revenue iff it falls in its customer's first-ever
    * order month. Exactness: pure integer month indices and exact
    * cents from one conditional aggregation. Scale: the first-month
    * rollup and the order join are the two custkey exchanges
    * (co-partitioned); output is month-domain-sized.
    */
  val q141NewVsRepeat = GraftQuery(
    "q141_new_vs_repeat",
    (s, dir) => {
      val t = Tables(s, dir)
      val first = t.orders.groupBy(col("o_custkey").as("ck"))
        .agg(min(monthIndex(col("o_orderdate"))).as("fm"))
      t.orders
        .join(first, col("o_custkey") === col("ck"))
        .withColumn("m", monthIndex(col("o_orderdate")))
        .groupBy(col("m"))
        .agg(
          sum(when(col("m") === col("fm"),
            round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
            .as("new_cents"),
          sum(when(col("m") =!= col("fm"),
            round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
            .as("repeat_cents"),
          sum(when(col("m") === col("fm"), 1L).otherwise(0L))
            .as("n_new_orders"),
          sum(when(col("m") =!= col("fm"), 1L).otherwise(0L))
            .as("n_repeat_orders"))
        .select(
          format_string("%04d-%02d", expr("(m - 1) div 12"),
            pmod(col("m") - 1, lit(12L)) + 1).as("month"),
          col("new_cents"), col("repeat_cents"),
          col("n_new_orders"), col("n_repeat_orders"))
        .orderBy(col("month"))
    },
    Some("""
      WITH f AS (
        SELECT o_custkey AS ck,
               CAST(MIN(year(o_orderdate) * 12 + month(o_orderdate))
                 AS BIGINT) AS fm
        FROM orders GROUP BY 1),
      j AS (
        SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                 AS BIGINT) AS m,
               f.fm, CAST(round(o.o_totalprice * 100) AS BIGINT) AS c
        FROM orders o JOIN f ON f.ck = o.o_custkey)
      SELECT printf('%04d-%02d', (m - 1) // 12, (m - 1) % 12 + 1) AS month,
             CAST(SUM(CASE WHEN m = fm THEN c ELSE 0 END) AS BIGINT)
               AS new_cents,
             CAST(SUM(CASE WHEN m <> fm THEN c ELSE 0 END) AS BIGINT)
               AS repeat_cents,
             CAST(SUM(CASE WHEN m = fm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new_orders,
             CAST(SUM(CASE WHEN m <> fm THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat_orders
      FROM j
      GROUP BY m
      ORDER BY month
    """)
  )

  /** Era boundary for the value-segment migration matrix. */
  val RfmEraCutoff = "1996-01-01 00:00:00"

  /** Spend-quintile migration matrix across two eras — the customer-
    * level drift readout (which value tiers are upgrading or
    * churning) next to q84's event-type Markov chain: customers are
    * quintiled by exact-cents spend WITHIN each era (ntile over the
    * customer-dimension frame, spend-desc + custkey tie-break so the
    * bucketing is total and engine-identical), customers absent from
    * an era carry tier 0 ("none"), and the matrix counts every
    * (from_tier, to_tier) cell. Scale: two conditional per-customer
    * rollups from ONE cached scan, a full-outer dimension join, and
    * a 6×6-sized count — the quintiles come from the rank-derived
    * exact ntile ([[graft.functions.DistributedRank.withNtile]]), so
    * no customer-scale single-partition ordering exists anywhere.
    */
  val q142RfmTransition = GraftQuery(
    "q142_rfm_transition",
    (s, dir) => {
      val t = Tables(s, dir)
      val cut = lit(RfmEraCutoff).cast("timestamp")
      // cache the per-customer rollup: both ntile builds and both
      // era filters read it — ONE orders scan total
      val spend = t.orders.groupBy(col("o_custkey"))
        .agg(
          sum(when(col("o_orderdate") < cut,
            round(col("o_totalprice") * 100).cast("long"))).as("s1"),
          sum(when(col("o_orderdate") >= cut,
            round(col("o_totalprice") * 100).cast("long"))).as("s2"))
        .cache()
      // tiers over |customers| are row-scale at a 100 TB SF: both
      // ntiles run through the rank-derived exact form
      // (DistributedRank.withNtile — identical tile sizing, no
      // single-partition ordered window)
      val (q1t, rel1) = graft.functions.DistributedRank.withNtile(
        spend.filter(col("s1").isNotNull)
          .select(col("o_custkey"), col("s1")),
        Seq(col("s1").desc, col("o_custkey")), 5, "t1", 32)
      val q1 = q1t.select(col("o_custkey"), col("t1"))
      val (q2t, rel2) = graft.functions.DistributedRank.withNtile(
        spend.filter(col("s2").isNotNull)
          .select(col("o_custkey"), col("s2")),
        Seq(col("s2").desc, col("o_custkey")), 5, "t2", 32)
      val q2 = q2t.select(col("o_custkey").as("ck2"), col("t2"))
      val out = q1.join(q2, col("o_custkey") === col("ck2"), "full_outer")
        .select(coalesce(col("t1"), lit(0L)).as("from_tier"),
          coalesce(col("t2"), lit(0L)).as("to_tier"))
        .groupBy(col("from_tier"), col("to_tier"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("from_tier"), col("to_tier"))
      out.persist().count()
      rel1(); rel2()
      spend.unpersist(false)
      out
    },
    Some(s"""
      WITH sp AS (
        SELECT o_custkey,
               SUM(CASE WHEN o_orderdate < TIMESTAMP '$RfmEraCutoff'
                   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS s1,
               SUM(CASE WHEN o_orderdate >= TIMESTAMP '$RfmEraCutoff'
                   THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS s2
        FROM orders GROUP BY 1),
      q1 AS (
        SELECT o_custkey,
               CAST(ntile(5) OVER (ORDER BY s1 DESC, o_custkey) AS BIGINT)
                 AS t1
        FROM sp WHERE s1 IS NOT NULL),
      q2 AS (
        SELECT o_custkey,
               CAST(ntile(5) OVER (ORDER BY s2 DESC, o_custkey) AS BIGINT)
                 AS t2
        FROM sp WHERE s2 IS NOT NULL)
      SELECT COALESCE(q1.t1, 0) AS from_tier, COALESCE(q2.t2, 0) AS to_tier,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM q1 FULL OUTER JOIN q2 ON q2.o_custkey = q1.o_custkey
      GROUP BY 1, 2
      ORDER BY 1, 2
    """)
  )

  /** Staleness threshold (days behind the freshest table) for the
    * freshness audit. */
  val FreshnessSlaDays = 30L

  /** Cross-table freshness audit — the data-quality gate a warehouse
    * runs before publishing: every time-bearing table's watermark
    * (max event/order/ship time and row count) compared against the
    * freshest table, flagging any feed more than
    * [[FreshnessSlaDays]] days behind (a silently-stalled upstream
    * is the most common production data fault). Exactness: raw-micros
    * max/count per table, day lag a true integer division, flag an
    * integer compare. Scale: one max/count aggregation per table
    * (map-side combined, no shuffle beyond the 1-row combines) and a
    * 3-row union.
    */
  val q143FreshnessAudit = GraftQuery(
    "q143_freshness_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      def probe(df: org.apache.spark.sql.DataFrame, tsCol: String,
          name: String) =
        df.agg(count(lit(1)).as("n_rows"),
          // NTZ columns (orders/lineitem) cast to TIMESTAMP first — a
          // wall-clock no-op under the pinned UTC session
          max(unix_micros(col(tsCol).cast("timestamp"))).as("max_us"))
          .select(lit(name).as("table_name"), col("n_rows"), col("max_us"))
      val probes = probe(t.events, "ts", "events")
        .unionAll(probe(t.orders, "o_orderdate", "orders"))
        .unionAll(probe(t.lineitem, "l_shipdate", "lineitem"))
        .cache()
      val freshest = probes.agg(max(col("max_us")).as("global_max_us"))
      probes.crossJoin(broadcast(freshest))
        .select(col("table_name"), col("n_rows"),
          date_format(timestamp_micros(col("max_us")), "yyyy-MM-dd")
            .as("watermark_day"),
          expr("(global_max_us - max_us) div 86400000000").as("days_behind"),
          (expr("(global_max_us - max_us) div 86400000000") >
            FreshnessSlaDays).as("stale"))
        .orderBy(col("table_name"))
    },
    Some(s"""
      WITH p AS (
        SELECT 'events' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
               MAX(epoch_us(ts)) AS max_us FROM events
        UNION ALL
        SELECT 'orders', CAST(COUNT(*) AS BIGINT), MAX(epoch_us(o_orderdate))
        FROM orders
        UNION ALL
        SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
               MAX(epoch_us(l_shipdate))
        FROM lineitem),
      g AS (SELECT MAX(max_us) AS global_max_us FROM p)
      SELECT p.table_name, p.n_rows,
             strftime(make_timestamp(p.max_us), '%Y-%m-%d') AS watermark_day,
             CAST((g.global_max_us - p.max_us) // 86400000000 AS BIGINT)
               AS days_behind,
             (g.global_max_us - p.max_us) // 86400000000
               > $FreshnessSlaDays AS stale
      FROM p, g
      ORDER BY p.table_name
    """)
  )

  /** Seasonal percentile envelope: exact p25/p50/p75 of daily revenue
    * per ISO weekday — the control-band chart behind "is today's
    * number normal for a Tuesday". Percentiles are TYPE-1 order
    * statistics (rank ⌈q·n⌉, value at that rank) — pure integer rank
    * selection, NO interpolation, so every band edge is an exact
    * cents value both engines pick identically. Scale: one day
    * rollup; the rank windows run per dow over the day-DOMAIN frame.
    */
  val q144PercentileBands = GraftQuery(
    "q144_percentile_bands",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = dailyRevenueCents(t)
        .select((weekday(col("day")) + 1).cast("long").as("dow"),
          col("cents").as("c"))
      val ranked = daily.withColumn("r", row_number().over(
          Window.partitionBy(col("dow")).orderBy(col("c"))).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("dow"))).cast("long"))
      def pick(q25: Long): Column =
        // rank ⌈q·n/100⌉ with integer ceiling division
        sum(when(col("r") ===
          expr(s"(n * $q25 + 99) div 100"), col("c"))).as(s"p$q25")
      ranked.groupBy(col("dow"))
        .agg(first(col("n")).as("n_days"), pick(25L), pick(50L), pick(75L))
        .orderBy(col("dow"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS c
        FROM orders GROUP BY 1),
      r AS (
        SELECT isodow(day) AS dow, c,
               CAST(row_number() OVER (PARTITION BY isodow(day) ORDER BY c)
                 AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY isodow(day)) AS BIGINT) AS n
        FROM daily)
      SELECT CAST(dow AS BIGINT) AS dow, n AS n_days,
             CAST(MAX(CASE WHEN r = (n * 25 + 99) // 100 THEN c END)
               AS BIGINT) AS p25,
             CAST(MAX(CASE WHEN r = (n * 50 + 99) // 100 THEN c END)
               AS BIGINT) AS p50,
             CAST(MAX(CASE WHEN r = (n * 75 + 99) // 100 THEN c END)
               AS BIGINT) AS p75
      FROM r
      GROUP BY dow, n
      ORDER BY dow
    """)
  )

  /** DAU/MAU stickiness per month — the engagement-frequency ratio
    * every growth report carries (what fraction of the month's users
    * show up on an average day). Exactness: stickiness =
    * Σ_day DAU / (n_days · MAU) — one division of exact longs
    * (multiplying n_days into the denominator avoids averaging
    * doubles). Scale: both distinct rollups come from the same
    * (user, day) distinct frame — one data-scale exchange; output is
    * month-domain-sized. Exact count-distinct at this domain; the
    * theta sketch (q38) is the named path when user cardinality
    * outgrows it.
    */
  val q145DauMau = GraftQuery(
    "q145_dau_mau",
    (s, dir) => {
      val t = Tables(s, dir)
      val userDay = t.events
        .select(col("user_id"), to_date(col("ts")).as("day"),
          date_format(col("ts"), "yyyy-MM").as("month"))
        .distinct()
        .cache()
      val dau = userDay.groupBy(col("month"), col("day"))
        .agg(count(lit(1)).as("dau"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      val mau = userDay.groupBy(col("month"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(mau, Seq("month"))
        .select(col("month"), col("n_days"), col("sum_dau"), col("mau"),
          (col("sum_dau").cast(DoubleType) /
            (col("n_days") * col("mau")).cast(DoubleType))
            .as("stickiness"))
        .orderBy(col("month"))
    },
    Some("""
      WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
               strftime(ts, '%Y-%m') AS month
        FROM events),
      dau AS (
        SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(dau) AS BIGINT) AS sum_dau
        FROM (SELECT month, day, CAST(COUNT(*) AS BIGINT) AS dau
              FROM ud GROUP BY 1, 2)
        GROUP BY 1),
      mau AS (
        SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
        FROM ud GROUP BY 1)
      SELECT d.month, d.n_days, d.sum_dau, m.mau,
             CAST(d.sum_dau AS DOUBLE) / CAST(d.n_days * m.mau AS DOUBLE)
               AS stickiness
      FROM dau d JOIN mau m ON m.month = d.month
      ORDER BY d.month
    """)
  )

  /** Seasonal adjustment of the daily-revenue series (X-11-lite):
    * subtract each weekday's mean effect and re-center on the global
    * mean, so trend/anomaly readers (q117 OLS, q48/q68 outlier
    * screens) see the series WITHOUT the weekly cycle q138 proved is
    * there. Exactness: dow and global means are single divisions of
    * exact longs; the adjusted value is one fixed IEEE chain per row
    * on those exact operands — engine-identical. Scale: one day
    * rollup; the 7-row dow-mean frame and 1-row global mean
    * broadcast onto the day-DOMAIN spine.
    */
  val q146SeasonalAdjust = GraftQuery(
    "q146_seasonal_adjust",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = dailyRevenueCents(t)
        .withColumn("dow", (weekday(col("day")) + 1).cast("long"))
        .cache()
      val dowMean = daily.groupBy(col("dow"))
        .agg(sum(col("cents")).as("sx"), count(lit(1)).as("n"))
      val glob = daily.agg(sum(col("cents")).as("gx"),
        count(lit(1)).as("gn"))
      def d(c: Column): Column = c.cast(DoubleType)
      daily
        .join(broadcast(dowMean), Seq("dow"))
        .crossJoin(broadcast(glob))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dow"), col("cents"),
          (d(col("sx")) / d(col("n"))).as("dow_mean"),
          (d(col("cents")) - d(col("sx")) / d(col("n")) +
            d(col("gx")) / d(col("gn"))).as("deseasonalized"))
        .orderBy(col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM orders GROUP BY 1),
      dw AS (SELECT day, isodow(day) AS dow, cents FROM daily),
      dm AS (
        SELECT dow, CAST(SUM(cents) AS BIGINT) AS sx,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dw GROUP BY 1),
      g AS (SELECT CAST(SUM(cents) AS BIGINT) AS gx,
                   CAST(COUNT(*) AS BIGINT) AS gn
            FROM dw)
      SELECT CAST(d.day AS VARCHAR) AS day, CAST(d.dow AS BIGINT) AS dow,
             d.cents,
             CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE) AS dow_mean,
             CAST(d.cents AS DOUBLE)
               - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE)
               + CAST(g.gx AS DOUBLE) / CAST(g.gn AS DOUBLE)
               AS deseasonalized
      FROM dw d JOIN dm m ON m.dow = d.dow, g
      ORDER BY day
    """)
  )

  /** Calendar seasonality heatmap over events: ISO-weekday × hour
    * cell counts plus each cell's load relative to a uniform week
    * (ratio = n·168 / total — busier-than-average cells exceed 1).
    * The capacity-planning / traffic-shaping readout. Exactness:
    * counts are integers, the ratio is ONE division of two exactly-
    * rounded doubles (n·168 fits long trivially). Spark's `weekday`
    * is 0=Monday, so +1 aligns it with DuckDB's isodow. Scale: one
    * map-side-combined aggregation to ≤168 cells; the total joins
    * back as a broadcast 1-row frame, never a global window.
    */
  val q114DowHourHeatmap = GraftQuery(
    "q114_dow_hour_heatmap",
    (s, dir) => {
      val t = Tables(s, dir)
      // cache the ≤168-row cell frame: without it the broadcast total
      // re-scans and re-aggregates the whole events fact a second time
      val cells = t.events
        .select((weekday(col("ts")) + 1).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hr"))
        .groupBy(col("dow"), col("hr"))
        .agg(count(lit(1)).as("n"))
        .cache()
      val total = cells.agg(sum(col("n")).as("total"))
      cells.crossJoin(broadcast(total))
        .select(col("dow"), col("hr"), col("n"),
          ((col("n") * lit(168L)).cast(DoubleType) /
            col("total").cast(DoubleType)).as("load_vs_uniform"))
        .orderBy(col("dow"), col("hr"))
    },
    Some("""
      WITH cells AS (
        SELECT isodow(ts) AS dow, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY 1, 2),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
      SELECT CAST(dow AS BIGINT) AS dow, hr, n,
             CAST(n * 168 AS DOUBLE) / CAST(total AS DOUBLE) AS load_vs_uniform
      FROM cells, tot
      ORDER BY 1, 2
    """)
  )

  /** Pairwise Pearson correlation + sample covariance matrix over the
    * four numeric lineitem measures — the dataframe `corr()` parity
    * op every feature-engineering pass runs. Exactness: ALL moments
    * (Σx, Σx², Σxy per pair) accumulate as exact decimals in ONE
    * scan; each is cast to double once and the corr/cov formulas are
    * spelled with identical parenthesization in both engines, so
    * every float op is the same IEEE instruction on the same operands
    * (sqrt is correctly rounded per IEEE-754 — deterministic).
    * Scale: one map-side-combined aggregation to a single moment row;
    * the 6-pair matrix assembles driver-free via inline() over that
    * row. At 100 TB nothing changes — the scan dominates and the
    * moment row is constant-sized.
    */
  val q116CorrMatrix = GraftQuery(
    "q116_corr_matrix",
    (s, dir) => {
      val t = Tables(s, dir)
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val moments = t.lineitem.agg(
        count(lit(1)).as("n"),
        cols.flatMap(c => Seq(
          sum(dec2(col(c))).as(s"s_$c"),
          sum(dec2(col(c)) * dec2(col(c))).as(s"s2_$c"))) ++
        cols.combinations(2).toSeq.map { case Seq(x, y) =>
          sum(dec2(col(x)) * dec2(col(y))).as(s"sp_${x}_$y")
        }: _*)
      val nD = col("n").cast(DoubleType)
      def sD(c: String) = col(s"s_$c").cast(DoubleType)
      def s2D(c: String) = col(s"s2_$c").cast(DoubleType)
      val pairs = cols.combinations(2).toSeq.map { case Seq(x, y) =>
        val num = nD * col(s"sp_${x}_$y").cast(DoubleType) - sD(x) * sD(y)
        val den = sqrt(nD * s2D(x) - sD(x) * sD(x)) *
          sqrt(nD * s2D(y) - sD(y) * sD(y))
        struct(lit(x).as("col_x"), lit(y).as("col_y"),
          (num / den).as("corr"),
          (num / (nD * (nD - lit(1.0)))).as("cov_sample"))
      }
      moments.select(inline(array(pairs: _*)))
        .orderBy(col("col_x"), col("col_y"))
    },
    Some("""
      WITH m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s_q,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s_e,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s_d,
               CAST(CAST(SUM(CAST(l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s_t,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2_q,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2_e,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2_d,
               CAST(CAST(SUM(CAST(l_tax AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS s2_t,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp_qe,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp_qd,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp_qt,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp_ed,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp_et,
               CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sp_dt
        FROM lineitem)
      SELECT col_x, col_y,
             ((n * sp) - (sx * sy))
               / (sqrt((n * s2x) - (sx * sx)) * sqrt((n * s2y) - (sy * sy)))
               AS corr,
             ((n * sp) - (sx * sy)) / (n * (n - 1.0)) AS cov_sample
      FROM (
        SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
               n, sp_qe AS sp, s_q AS sx, s_e AS sy, s2_q AS s2x, s2_e AS s2y FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_discount', n, sp_qd, s_q, s_d, s2_q, s2_d FROM m
        UNION ALL
        SELECT 'l_quantity', 'l_tax', n, sp_qt, s_q, s_t, s2_q, s2_t FROM m
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount', n, sp_ed, s_e, s_d, s2_e, s2_d FROM m
        UNION ALL
        SELECT 'l_extendedprice', 'l_tax', n, sp_et, s_e, s_t, s2_e, s2_t FROM m
        UNION ALL
        SELECT 'l_discount', 'l_tax', n, sp_dt, s_d, s_t, s2_d, s2_t FROM m)
      ORDER BY col_x, col_y
    """)
  )

  /** Closed-form OLS trend of daily order revenue on the epoch-day
    * index — slope, intercept and R² from exact moments: the
    * `lstsq` / trend-line parity op, done as ONE aggregation instead
    * of an iterative solver. x is an exact integer (epoch day), y an
    * exact-decimal daily sum; Σx/Σx² stay in longs, Σy/Σxy/Σy² in
    * decimals, and the slope/intercept/R² formulas run on doubles
    * cast once from exact values with engine-identical
    * parenthesization. Scale: the day rollup is the only data-scale
    * stage (map-side combined); the regression itself reads one
    * |days|-sized frame and emits one row.
    */
  val q117OlsTrend = GraftQuery(
    "q117_ols_trend",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = t.orders
        // o_orderdate reads as TIMESTAMP_NTZ; cast to TimestampType is
        // a wall-clock no-op under the pinned-UTC session
        .select(floor(unix_micros(col("o_orderdate").cast("timestamp"))
            / 86400000000L)
          .cast("long").as("x"), dec2(col("o_totalprice")).as("yd"))
        .groupBy(col("x")).agg(sum(col("yd")).as("y"))
      val m = daily.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("sy2"))
      val nD = col("n").cast(DoubleType)
      val sxD = col("sx").cast(DoubleType)
      val sx2D = col("sx2").cast(DoubleType)
      val syD = col("sy").cast(DoubleType)
      val sxyD = col("sxy").cast(DoubleType)
      val sy2D = col("sy2").cast(DoubleType)
      val num = nD * sxyD - sxD * syD
      val denX = nD * sx2D - sxD * sxD
      val denY = nD * sy2D - syD * syD
      m.select(
        col("n").as("n_days"),
        (num / denX).as("slope"),
        ((syD - (num / denX) * sxD) / nD).as("intercept"),
        ((num * num) / (denX * denY)).as("r2"))
    },
    Some("""
      WITH daily AS (
        -- y re-narrowed to DECIMAL(19,2): DuckDB's SUM widens to
        -- DECIMAL(38,2) and the x*y / y*y products would overflow the
        -- 38-digit cap at plan time; daily totals fit (19,2) with room
        SELECT epoch_us(o_orderdate) // 86400000000 AS x,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                 AS DECIMAL(19,2)) AS y
        FROM orders GROUP BY 1),
      m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sx2,
               SUM(y) AS sy,
               SUM(CAST(x AS DECIMAL(17,0)) * y) AS sxy,
               SUM(y * y) AS sy2
        FROM daily)
      SELECT n AS n_days,
             ((CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE))
               - (CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
               / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE))
                  - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS slope,
             (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
               - (((CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE))
                    - (CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
                  / ((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE))
                     - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
             (((CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE))
                - (CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))
              * ((CAST(n AS DOUBLE) * CAST(CAST(sxy AS VARCHAR) AS DOUBLE))
                 - (CAST(sx AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE))))
               / (((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE))
                   - (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                  * ((CAST(n AS DOUBLE) * CAST(CAST(sy2 AS VARCHAR) AS DOUBLE))
                     - (CAST(CAST(sy AS VARCHAR) AS DOUBLE) * CAST(CAST(sy AS VARCHAR) AS DOUBLE)))) AS r2
      FROM m
    """)
  )

  def all: Seq[GraftQuery] =
    Seq(q46Funnel, q47CohortRetention, q48AnomalyExact, q49Scd2Versions,
      q51StatsProfile, q52ColumnProfile, q56SessionizedFunnel, q55DqConstraints,
      q59Winsorize, q61ApproxGroupbySample, q62PeriodicProfile, q63OrderStreaks,
      q64TargetEncoding, q66ParetoFrontier, q68MadOutliers, q71WelchTtest,
      q73RfmSegments, q75PsiDrift, q83Attribution, q84MarkovTransitions,
      q86PitScd2Join, q87Cuped, q88ScoreLift, q90WeightedMedian,
      q92SurvivalKm, q93RocAuc, q96ChiSquare, q97MaxDrawdown,
      q98LorenzGini, q99PrCurve, q105KsTest, q106BenfordProfile,
      q113KAnonymity, q114DowHourHeatmap, q116CorrMatrix, q117OlsTrend,
      q120LDiversity, q121TCloseness, q122CusumChangepoint,
      q123HhiConcentration, q125MedianCi, q126AbProportions,
      q127M4Downsample, q128CappedRunningSum, q129CohortLtvCurve,
      q130GrowthAccounting, q131DidEffect, q132PvmBridge,
      q133AbcClassification, q134MaxConcurrency, q136RollingCorrelation,
      q137Histogram, q138AnovaWeekday, q139MannKendall, q140TopMovers,
      q141NewVsRepeat, q142RfmTransition, q143FreshnessAudit,
      q144PercentileBands, q145DauMau, q146SeasonalAdjust)
}
