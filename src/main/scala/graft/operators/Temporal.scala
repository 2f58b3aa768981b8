package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.GraftQuery
import graft.sources.Tables
import graft.functions.GraftFunctions._
import graft.functions.VarianceAgg

/** Temporal join operators + custom-aggregate showcase — the
  * remaining SURVEY §2.6 join categories (as-of, range/theta) and the
  * UDAF row, all oracle-checked.
  */
object Temporal {

  /** As-of join (self, per-key): for each event, the timestamp of the
    * most recent prior 'error' event of the same user. Spark has no
    * native ASOF JOIN; the idiomatic formulation is a conditional
    * last-value window scan — one shuffle on the partition key,
    * linear within partition, no join product at all. (DuckDB's
    * native ASOF JOIN would be the oracle's alternative spelling;
    * the window form is used on both sides for exact parity.)
    */
  val q21AsofPrevError = GraftQuery(
    "q21_asof_prev_error",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t.events
        .withColumn("prev_error_ts",
          last(when(col("event_type") === "error", col("ts")), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"), tsString(col("ts")).as("ts_s"),
          tsString(col("prev_error_ts")).as("prev_error_ts_s"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             strftime(last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      '%Y-%m-%d %H:%M:%S') AS prev_error_ts_s
      FROM events
      ORDER BY event_id
    """)
  )

  /** Range (theta) join via bucketing: count events within the next
    * 60 seconds of each event. The naive theta join is O(n²); here
    * each side joins on a 60-second time bucket and its neighbor, so
    * the product is bounded per bucket and the condition is applied
    * only within adjacent buckets — the standard scale formulation of
    * an interval join. The DuckDB oracle states the same semantics as
    * a plain non-equi join, proving the bucketing is lossless.
    */
  val q22RangeJoinNeighbors = GraftQuery(
    "q22_range_join_neighbors",
    (s, dir) => {
      val t = Tables(s, dir)
      val ev = t.events.select(col("event_id"), unix_micros(col("ts")).as("us"))
      val a = ev.select(col("event_id").as("ia"), col("us").as("ua"),
        floor(col("us") / 60000000L).as("bucket"))
      val b = ev.select(col("event_id").as("ib"), col("us").as("ub"))
        .withColumn("bucket", explode(array(
          floor(col("ub") / 60000000L), floor(col("ub") / 60000000L) - 1)))
      a.join(b, Seq("bucket"))
        .filter(col("ub") > col("ua") && col("ub") - col("ua") <= 60000000L)
        .groupBy(col("ia"))
        .agg(countDistinct(col("ib")).as("n_next_minute"))
        .orderBy(col("ia"))
    },
    Some("""
      SELECT a.event_id AS ia, COUNT(DISTINCT b.event_id) AS n_next_minute
      FROM events a JOIN events b
        ON epoch_us(b.ts) > epoch_us(a.ts)
       AND epoch_us(b.ts) - epoch_us(a.ts) <= 60000000
      GROUP BY a.event_id
      ORDER BY ia
    """)
  )

  /** Custom typed Aggregator (UDAF): exact-decimal sample variance of
    * order totals per status, oracle-checked against the same moment
    * formula in DuckDB. Registered as a real UDAF over a column.
    */
  val q23CustomVariance = GraftQuery(
    "q23_custom_variance",
    (s, dir) => {
      val t = Tables(s, dir)
      val varUdaf = udaf(VarianceAgg)
      t.orders
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(varUdaf(col("o_totalprice")), 4).as("var_total")
        )
        .orderBy(col("o_orderstatus"))
    },
    Some("""
      WITH m AS (
        SELECT o_orderstatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sq
        FROM orders GROUP BY o_orderstatus)
      SELECT o_orderstatus, n,
             round((sq - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1), 4) AS var_total
      FROM m
      ORDER BY o_orderstatus
    """)
  )

  /** Two-table as-of join through the NATIVE custom operator
    * (graft.plans.AsOfJoin: logical node + strategy + sort-merge
    * exec): every click joined to the user's most recent purchase at
    * or before it. The oracle is DuckDB's built-in ASOF LEFT JOIN —
    * the two independent implementations must agree row-for-row.
    */
  val q27AsofJoinNative = GraftQuery(
    "q27_asof_join_native",
    (s, dir) => {
      import graft.plans.AsOf
      val t = Tables(s, dir)
      val clicks = t.events.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = t.events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value").as("p_value"))
      AsOf.join(clicks, purchases,
        leftKeys = Seq("user_id"), rightKeys = Seq("p_user"),
        leftTime = "ts", rightTime = "p_ts")
        .select(col("event_id"), col("user_id"),
          tsString(col("ts")).as("ts_s"),
          tsString(col("p_ts")).as("last_purchase_ts_s"),
          col("p_value").as("last_purchase_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      purchases AS (
        SELECT user_id AS p_user, ts AS p_ts, value AS p_value
        FROM events WHERE event_type = 'purchase')
      SELECT c.event_id, c.user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS last_purchase_ts_s,
             p.p_value AS last_purchase_value
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.p_user AND c.ts >= p.p_ts
      ORDER BY c.event_id
    """)
  )

  /** Time-series resample + gap fill: per user, an hourly grid spanning
    * that user's activity, hourly value sums, and forward-fill of empty
    * hours from the last observed hour. The grid is generated per key
    * with `sequence` (narrow — no join product), the fill is one
    * ignore-nulls window scan; the only shuffles are the hourly
    * pre-aggregation and the per-user window, both on user_id. At
    * scale the grid explode is bounded by span/granularity per key,
    * never by corpus size.
    */
  val q36GapfillResample = GraftQuery(
    "q36_gapfill_resample",
    (s, dir) => {
      val t = Tables(s, dir)
      // pin ONE user_id exchange for the whole chain: hash(user_id)
      // satisfies the hourly agg, the span agg, the grid⋈hourly join
      // and the fill window (ClusteredDistribution subsets), so the
      // per-user grid explode and window run on 32 tasks instead of
      // the single AQE-coalesced partition the small agg shuffle
      // otherwise collapses to (two ~1.5 s serial jobs at sf0.1)
      val hourly = t.events
        .select(col("user_id"), col("ts"), col("value"))
        .repartition(s.sparkContext.defaultParallelism, col("user_id"))
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(sumDec(col("value")).as("hour_value"))
      val grid = hourly
        .groupBy(col("user_id"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"),
            make_dt_interval(lit(0), lit(1), lit(0), lit(0)))).as("hour"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "hour"), "left")
        .select(col("user_id"), tsString(col("hour")).as("hour_s"),
          last(col("hour_value"), ignoreNulls = true).over(w).as("filled_value"),
          col("hour_value").isNull.cast("long").as("is_gap"))
        .orderBy(col("user_id"), col("hour_s"))
    },
    Some("""
      WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
               CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS hour_value
        FROM events GROUP BY 1, 2),
      grid AS (
        SELECT user_id, unnest(generate_series(min(hour), max(hour), INTERVAL 1 HOUR)) AS hour
        FROM hourly GROUP BY user_id)
      SELECT g.user_id, strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour_s,
             last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
             CAST(CASE WHEN h.hour_value IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
      FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
      ORDER BY g.user_id, hour_s
    """)
  )

  /** Rolling time-series features per user — the feature-engineering
    * window family (moving average/max over the last 4 observations,
    * delta vs the previous one). One shuffle on user_id serves every
    * frame; order is (ts, event_id) so ties are deterministic. The
    * frame sum goes through an exact decimal: DuckDB evaluates
    * sliding frames with a segment tree whose addition order differs
    * from a running sum, so double accumulation would drift in the
    * last ulp — decimal arithmetic is order-free.
    */
  val q37RollingFeatures = GraftQuery(
    "q37_rolling_features",
    (s, dir) => {
      val t = Tables(s, dir)
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = ord.rowsBetween(-3, Window.currentRow)
      t.events
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .select(col("event_id"), col("user_id"), tsString(col("ts")).as("ts_s"),
          round(sum(dec6(col("value"))).over(frame).cast("double")
            / count(lit(1)).over(frame), 6).as("roll_avg_4"),
          round(max(col("value")).over(frame), 6).as("roll_max_4"),
          round(col("value") - lag(col("value"), 1, 0.0).over(ord), 6)
            .as("delta_prev"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             round(CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)
               / COUNT(*) OVER w, 6) AS roll_avg_4,
             round(MAX(value) OVER w, 6) AS roll_max_4,
             round(value - COALESCE(lag(value) OVER o, 0.0), 6) AS delta_prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
             o AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id
    """)
  )

  /** OHLC candle resampling: per calendar day, the open (first value
    * by (ts, event_id)), high, low, close (last value) and volume of
    * the event value stream — the market-data downsampling shape, in
    * integer cents so all five numbers hash exactly. Open/close are
    * picked by two row_number windows over the SAME (day) exchange —
    * tie-broken on event_id, so first/last are well-defined under
    * timestamp collisions — then everything reduces in one final
    * aggregation. The window partitions on the day key (thousands of
    * partitions, bounded per-day row counts); no whole-table sort.
    */
  val q60OhlcResample = GraftQuery(
    "q60_ohlc_resample",
    (s, dir) => {
      val t = Tables(s, dir)
      val ev = t.events.select(
        to_date(col("ts")).as("day"),
        col("ts"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      val wAsc = Window.partitionBy(col("day"))
        .orderBy(col("ts"), col("event_id"))
      val wDesc = Window.partitionBy(col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      ev
        .withColumn("rn_first", row_number().over(wAsc))
        .withColumn("rn_last", row_number().over(wDesc))
        .groupBy(col("day"))
        .agg(
          min(when(col("rn_first") === 1, col("cents"))).as("open_cents"),
          max(col("cents")).as("high_cents"),
          min(col("cents")).as("low_cents"),
          min(when(col("rn_last") === 1, col("cents"))).as("close_cents"),
          count(lit(1)).as("volume"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          col("open_cents"), col("high_cents"), col("low_cents"),
          col("close_cents"), col("volume"))
        .orderBy(col("day_s"))
    },
    Some("""
      WITH ev AS (
        SELECT CAST(ts AS DATE) AS day, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      rn AS (
        SELECT day, cents,
               row_number() OVER (PARTITION BY day ORDER BY ts, event_id)
                 AS rn_first,
               row_number() OVER (PARTITION BY day ORDER BY ts DESC, event_id DESC)
                 AS rn_last
        FROM ev)
      SELECT strftime(day, '%Y-%m-%d') AS day_s,
             MIN(CASE WHEN rn_first = 1 THEN cents END) AS open_cents,
             MAX(cents) AS high_cents,
             MIN(cents) AS low_cents,
             MIN(CASE WHEN rn_last = 1 THEN cents END) AS close_cents,
             COUNT(*) AS volume
      FROM rn
      GROUP BY day
      ORDER BY day_s
    """)
  )

  /** Time-weighted average value per user over the irregular event
    * stream — the TWAP/step-function mean a metering or pricing
    * pipeline computes: each observation holds until the next one,
    * so its weight is the gap to the successor (the user's last
    * event carries no interval and is excluded).
    *
    * Exactness: the value is 2-decimal data → exact cents BIGINT; the
    * microsecond gap is an exact BIGINT; the weighted numerator stays
    * int64 cents·µs (order-free addition; bounded by
    * max_cents · stream_period_µs ≈ 2e4 · 2.6e12 ≪ 2⁶³, overflowing
    * only past a ~14-year stream). int64→double conversion is
    * correctly rounded per IEEE in both engines — unlike wide
    * DECIMAL→double, which DuckDB rounds twice — so the final fixed
    * division chain is bit-identical. One user-key exchange serves
    * the lead() AND the aggregation; nothing else shuffles.
    */
  val q65Twap = GraftQuery(
    "q65_twap",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val spans = t.events
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("dur_us", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dur_us").isNotNull)
      spans
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_spans"),
          sum(col("dur_us")).as("total_dur_us"),
          sum(col("cents") * col("dur_us")).as("num_cents_us"))
        .select(col("user_id"), col("n_spans"), col("total_dur_us"),
          ((col("num_cents_us").cast(DoubleType) /
            col("total_dur_us").cast(DoubleType)) / lit(100.0)).as("twap"))
        .orderBy(col("user_id"))
    },
    Some("""
      WITH spans AS (
        SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents,
               lead(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) - epoch_us(ts) AS dur_us
        FROM events),
      agg AS (
        SELECT user_id,
               COUNT(*) AS n_spans,
               CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
               CAST(SUM(cents * dur_us) AS BIGINT) AS num_cents_us
        FROM spans WHERE dur_us IS NOT NULL
        GROUP BY user_id)
      SELECT user_id, n_spans, total_dur_us,
             (CAST(num_cents_us AS DOUBLE) / CAST(total_dur_us AS DOUBLE))
               / 100.0 AS twap
      FROM agg
      ORDER BY user_id
    """)
  )

  /** Seasonal-naive forecast backtest: predict each hour's event
    * count per type as the count 24 hours earlier, and score the
    * forecast with MAE over every hour that HAS a day-old
    * counterpart (both hours observed — gaps carry no forecast, the
    * standard backtest convention). The simplest competitive
    * baseline every forecasting pipeline must beat, and the
    * evaluation harness is the operator: exact BIGINT hour numbers,
    * exact count deltas, one correctly-rounded division for the MAE.
    * Scale shape: the hourly rollup is one map-side-combined
    * aggregation; the seasonal lag is a self-join on (type, hour−24)
    * over the DOMAIN-sized hourly frame, not the events.
    */
  val q69SeasonalNaive = GraftQuery(
    "q69_seasonal_naive",
    (s, dir) => {
      val t = Tables(s, dir)
      val hourly = t.events
        .select(col("event_type"),
          floor(unix_micros(col("ts")) / 3600000000L).as("hr"))
        .groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("cnt"))
      val lagged = hourly.select(col("event_type"),
        (col("hr") + 24).as("hr"), col("cnt").as("forecast"))
      hourly.join(lagged, Seq("event_type", "hr"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_eval_hours"),
          sum(abs(col("cnt") - col("forecast"))).as("total_abs_err"),
          (sum(abs(col("cnt") - col("forecast"))).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("mae"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH hourly AS (
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hr,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2)
      SELECT h.event_type,
             COUNT(*) AS n_eval_hours,
             CAST(SUM(abs(h.cnt - f.cnt)) AS BIGINT) AS total_abs_err,
             CAST(SUM(abs(h.cnt - f.cnt)) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mae
      FROM hourly h
      JOIN hourly f ON f.event_type = h.event_type AND f.hr = h.hr - 24
      GROUP BY h.event_type
      ORDER BY h.event_type
    """)
  )

  /** Linear interpolation onto an hourly grid: for each user, resample
    * the irregular `value` series to whole-hour points, each grid
    * value linearly interpolated between its bracketing samples
    * (complementing q36's LOCF gap-fill — LOCF is a step function,
    * this is the piecewise-linear resample every feature pipeline
    * needs for rate-like signals). Duplicate-timestamp samples
    * resolve to the highest event_id (the "latest write wins" rule,
    * stated identically in the oracle).
    *
    * Exactness: sample times are integer micros, values integer
    * cents; each grid value is ONE double op chain
    * `c0 + (c1−c0)·((g−t0)/(t1−t0))` over exactly-representable
    * integers, then one division by 100 — both engines run the same
    * correctly-rounded IEEE chain, so the doubles hash identically.
    * The grid-start index is exact integer ceil-div (no float floor).
    *
    * Scale shape: one user_id exchange serves the dedup window AND
    * the bracketing lead(); grid points explode from a `sequence()`
    * bounded per span — no join against a generated calendar frame,
    * no global window. Per-user output is bounded by the user's time
    * span, so the explode is as partitioned as the input.
    */
  val q70InterpLinear = GraftQuery(
    "q70_interp_linear",
    (s, dir) => {
      val t = Tables(s, dir)
      val H = 3600000000L
      val wDup = Window.partitionBy(col("user_id"), col("us"))
        .orderBy(col("event_id").desc)
      val wLead = Window.partitionBy(col("user_id"))
        .orderBy(col("us"))
      val samples = t.events
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(wDup))
        .filter(col("rn") === 1)
      val spans = samples
        .withColumn("t1", lead(col("us"), 1).over(wLead))
        .withColumn("c1", lead(col("cents"), 1).over(wLead))
        .filter(col("t1").isNotNull)
      // grid hours g with t0 <= g·H < t1 (half-open: each grid point
      // belongs to exactly one span); gLo = ceilDiv(t0, H) exactly.
      // Guard gLo <= gHi BEFORE sequence(): Spark's sequence(a, b)
      // with a > b yields a DESCENDING range (bogus grid points),
      // where DuckDB's generate_series is empty.
      val gLo = ((col("us") + (H - 1) - pmod(col("us") + (H - 1), lit(H))) / H)
        .cast("long")
      val gHi = (((col("t1") - 1) - pmod(col("t1") - 1, lit(H))) / H)
        .cast("long")
      spans
        .withColumn("g_lo", gLo).withColumn("g_hi", gHi)
        .filter(col("g_lo") <= col("g_hi"))
        .withColumn("g", explode(sequence(col("g_lo"), col("g_hi"))))
        .select(col("user_id"), col("g").as("grid_hr"),
          ((col("cents").cast(DoubleType) +
            (col("c1") - col("cents")).cast(DoubleType) *
              ((col("g") * H - col("us")).cast(DoubleType) /
                (col("t1") - col("us")).cast(DoubleType))) /
            lit(100.0)).as("v_interp"))
        .orderBy(col("user_id"), col("grid_hr"))
    },
    Some("""
      WITH s AS (
        SELECT user_id, epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE user_id < 20),
      spans AS (
        SELECT user_id, us, cents,
               lead(us) OVER (PARTITION BY user_id ORDER BY us) AS t1,
               lead(cents) OVER (PARTITION BY user_id ORDER BY us) AS c1
        FROM s WHERE rn = 1),
      grid AS (
        SELECT user_id, us, cents, t1, c1,
               unnest(generate_series(
                 (us + 3599999999) // 3600000000,
                 ((t1 - 1) - ((t1 - 1) % 3600000000)) // 3600000000)) AS g
        FROM spans WHERE t1 IS NOT NULL)
      SELECT user_id, CAST(g AS BIGINT) AS grid_hr,
             (CAST(cents AS DOUBLE) + CAST(c1 - cents AS DOUBLE)
               * (CAST(g * 3600000000 - us AS DOUBLE)
                  / CAST(t1 - us AS DOUBLE))) / 100.0 AS v_interp
      FROM grid
      WHERE g * 3600000000 >= us
      ORDER BY user_id, grid_hr
    """)
  )

  /** RANGE-interval window frame — the time-based sliding frame
    * (`RANGE BETWEEN INTERVAL ... PRECEDING`) that row-count frames
    * cannot express when observations are irregular: each order sees
    * the customer's trailing-30-day order count and spend. One
    * exchange on the customer key serves the whole frame; the sum
    * runs over exact decimals inside the window (order-free), and
    * Spark's numeric `rangeBetween` over epoch seconds is the same
    * frame DuckDB derives from the INTERVAL bound.
    */
  val RangeWindowDays = 30L

  val q76RangeWindow = GraftQuery(
    "q76_range_window",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(unix_timestamp(col("o_orderdate")))
        .rangeBetween(-RangeWindowDays * 86400L, 0L)
      t.orders.select(
          col("o_custkey"), col("o_orderkey"),
          tsString(col("o_orderdate")).as("od"),
          count(lit(1)).over(w).as("n_30d"),
          sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType).as("spend_30d"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some(s"""
      SELECT o_custkey, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS od,
             COUNT(*) OVER w AS n_30d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
               AS spend_30d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL $RangeWindowDays DAYS PRECEDING
                   AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey
    """)
  )

  /** Trailing window for the PIT feature backfill. */
  val PitWindowDays = 7L

  /** Leakage-free point-in-time feature backfill: for every purchase
    * (the training label row), the user's view/click counts and spend
    * over the STRICTLY-PRIOR trailing [[PitWindowDays]] — the feature-
    * store backfill that trains "will they buy" models without future
    * leakage. One user_id exchange serves everything: label rows and
    * feature rows ride the SAME sorted partition, and three RANGE
    * windows ([-7d, -1 µs] over epoch micros — the −1 bound IS the
    * leakage guard) compute the trailing aggregates in place. No
    * self-join, no per-probe scan; at 100 TB this is one shuffle of
    * the event log, which a range-join formulation would pay anyway
    * before the O(|probe|·|window|) product this avoids. Spend stays
    * in cents (exact); the oracle states the identical RANGE frame.
    */
  val featPitBackfill = GraftQuery(
    "feat_pit_backfill",
    (s, dir) => {
      val t = Tables(s, dir)
      val ev = t.events.select(col("event_id"), col("user_id"),
        col("event_type"), col("ts"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      val horizon = PitWindowDays * 86400L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-horizon, -1L)
      def trailing(c: Column): Column = coalesce(sum(c).over(w), lit(0L))
      ev
        .withColumn("n_views_7d",
          trailing(when(col("event_type") === "view", 1L).otherwise(0L)))
        .withColumn("n_clicks_7d",
          trailing(when(col("event_type") === "click", 1L).otherwise(0L)))
        .withColumn("spend_7d_cents",
          trailing(when(col("event_type") === "purchase", col("cents"))
            .otherwise(0L)))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), tsString(col("ts")).as("ts_s"),
          col("n_views_7d"), col("n_clicks_7d"), col("spend_7d_cents"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      WITH ev AS (
        SELECT event_id, user_id, event_type, ts,
               epoch_us(ts) AS us,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      f AS (
        SELECT event_id, user_id, event_type, ts,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1
                                      ELSE 0 END) OVER w, 0) AS BIGINT)
                 AS n_views_7d,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1
                                      ELSE 0 END) OVER w, 0) AS BIGINT)
                 AS n_clicks_7d,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                      THEN cents ELSE 0 END) OVER w, 0)
                 AS BIGINT) AS spend_7d_cents
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us
          RANGE BETWEEN ${PitWindowDays * 86400L * 1000000L} PRECEDING
                    AND 1 PRECEDING))
      SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             n_views_7d, n_clicks_7d, spend_7d_cents
      FROM f
      WHERE event_type = 'purchase'
      ORDER BY event_id
    """)
  )

  /** FORWARD as-of join on the native operator: every purchase joined
    * to the user's NEXT error at/after it — time-to-next-failure, the
    * direction pandas `merge_asof(direction="forward")` ships and the
    * backward-only q27 couldn't express. Same one-pass sort-merge
    * exec, mirrored walk: the matcher parks on the earliest same-key
    * row at/after the probe instead of consuming through it. The
    * right side dedups to unique (user, ts) first so the "earliest
    * at/after" row is well-defined in BOTH engines (DuckDB's ASOF
    * with `<=` is the oracle — the same operator, independently
    * implemented). Scale: identical to q27 — co-partition by user,
    * sort, stream once, O(1) state.
    */
  /** Shared probe/reference frames of the direction queries: the
    * purchase probes and the error reference deduped to unique
    * (user, ts) — the dedup makes "earliest at/after" and the nearest
    * tie rule total in both engines. One definition so q118/q119
    * cannot drift apart.
    */
  private def purchasesAndErrors(t: Tables): (DataFrame, DataFrame) = {
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errs = t.events.filter(col("event_type") === "error")
      .groupBy(col("user_id").as("e_user"), col("ts").as("e_ts"))
      .agg(max(col("event_id")).as("err_id"))
    (purchases, errs)
  }

  val q118AsofForward = GraftQuery(
    "q118_asof_forward",
    (s, dir) => {
      import graft.plans.AsOf
      val (purchases, errs) = purchasesAndErrors(Tables(s, dir))
      AsOf.join(purchases, errs,
        leftKeys = Seq("user_id"), rightKeys = Seq("e_user"),
        leftTime = "ts", rightTime = "e_ts", direction = "forward")
        .select(col("event_id"), col("user_id"),
          tsString(col("ts")).as("ts_s"),
          tsString(col("e_ts")).as("next_error_ts_s"),
          col("err_id"),
          (unix_micros(col("e_ts")) - unix_micros(col("ts"))).as("wait_us"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      e AS (
        SELECT user_id AS e_user, ts AS e_ts, MAX(event_id) AS err_id
        FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             strftime(e.e_ts, '%Y-%m-%d %H:%M:%S') AS next_error_ts_s,
             e.err_id,
             epoch_us(e.e_ts) - epoch_us(p.ts) AS wait_us
      FROM p ASOF LEFT JOIN e
        ON p.user_id = e.e_user AND p.ts <= e.e_ts
      ORDER BY p.event_id
    """)
  )

  /** Tolerance for the nearest-direction as-of: candidates beyond 6h
    * on either side are rejected (micros).
    */
  val NearestTolUs = 21600000000L

  /** NEAREST as-of join on the native operator: each purchase joined
    * to the error with the smallest |Δt| within ±6h, ties resolved
    * backward — pandas `merge_asof(direction="nearest",
    * tolerance=…)`. The matcher keeps BOTH frontier candidates (last
    * consumed ≤ probe, parked head > probe), tolerance-filters each,
    * and picks by distance; DuckDB has no nearest ASOF, so the oracle
    * states the same rule as a window over the ±tolerance band. Right
    * side deduped to unique (user, ts) — Δt ties between two distinct
    * same-side rows are then impossible, and the cross-side tie rule
    * is stated identically in both engines.
    */
  val q119AsofNearest = GraftQuery(
    "q119_asof_nearest",
    (s, dir) => {
      import graft.plans.AsOf
      val (purchases, errs) = purchasesAndErrors(Tables(s, dir))
      AsOf.join(purchases, errs,
        leftKeys = Seq("user_id"), rightKeys = Seq("e_user"),
        leftTime = "ts", rightTime = "e_ts",
        tolerance = Some(NearestTolUs.toDouble), direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("err_id"),
          (unix_micros(col("e_ts")) - unix_micros(col("ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some(s"""
      WITH p AS (
        SELECT event_id, user_id, epoch_us(ts) AS us
        FROM events WHERE event_type = 'purchase'),
      e AS (
        SELECT user_id AS e_user, epoch_us(ts) AS eus, MAX(event_id) AS err_id
        FROM events WHERE event_type = 'error' GROUP BY 1, 2),
      cand AS (
        SELECT p.event_id, e.err_id, e.eus - p.us AS gap_us,
               row_number() OVER (PARTITION BY p.event_id
                 ORDER BY abs(e.eus - p.us),
                          CASE WHEN e.eus <= p.us THEN 0 ELSE 1 END) AS rn
        FROM p JOIN e ON e.e_user = p.user_id
          AND abs(e.eus - p.us) <= $NearestTolUs)
      SELECT p.event_id, p.user_id, c.err_id, c.gap_us
      FROM p LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
        ON c.event_id = p.event_id
      ORDER BY p.event_id
    """)
  )

  /** Holt double-exponential smoothing (level + linear trend) over
    * each market segment's daily revenue — the classic trend smoother
    * between q58's EWMA (no trend) and q146's seasonal adjustment.
    * α = β = 1/2 makes every update a half-step, so the whole COUPLED
    * recurrence
    *
    *   l_t = round((y_t + l_{t-1} + b_{t-1}) / 2)
    *   b_t = round((l_t − l_{t-1} + b_{t-1}) / 2)
    *
    * runs in EXACT long cents with half-away-from-zero rounding —
    * Spark folds it as a secondary sort (repartition by segment, sort
    * by day, one mapPartitions with O(1) state — the q128 discipline
    * for keyed sequential folds), DuckDB restates it as a WITH
    * RECURSIVE chain with `round(s/2.0)` (exact: |s| ≪ 2⁵³, ties at
    * .5 round away from zero in both engines). Readout per segment:
    * final level/trend, the 7-day-ahead linear forecast l + 7b, and
    * the summed |one-step error| Σ|y_t − (l_{t-1}+b_{t-1})| — the
    * in-sample fit certificate. A float Holt would compound
    * cross-engine rounding drift over hundreds of steps; the
    * cents-integer form hashes identically.
    */
  val q147HoltTrend = GraftQuery(
    "q147_holt_trend",
    (s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val daily = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"),
          col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .select(col("segment"),
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
            .as("ed"),
          col("cents"))
      def rhalf(v: Long): Long =
        if (v % 2 == 0) v / 2 else (v + (if (v > 0) 1L else -1L)) / 2
      val folded = daily
        .repartition(col("segment"))
        .sortWithinPartitions(col("segment"), col("ed"))
        .as[(String, Long, Long)]
        .mapPartitions { it =>
          val out = Seq.newBuilder[(String, Long, Long, Long, Long)]
          var seg: String = null
          var n = 0L; var l = 0L; var b = 0L; var sae = 0L
          def emit(): Unit = if (seg != null) out += ((seg, n, l, b, sae))
          while (it.hasNext) {
            val (sg, _, y) = it.next()
            if (sg != seg) { emit(); seg = sg; n = 0L; l = y; b = 0L; sae = 0L }
            else {
              sae += math.abs(y - (l + b))
              val ln = rhalf(y + l + b)
              b = rhalf(ln - l + b)
              l = ln
            }
            n += 1L
          }
          emit()
          out.result().iterator
        }
        .toDF("segment", "n_days", "level_final", "trend_final", "sae")
      folded
        .select(col("segment"), col("n_days"), col("level_final"),
          col("trend_final"),
          (col("level_final") + lit(7L) * col("trend_final")).as("forecast_7d"),
          col("sae"))
        .orderBy(col("segment"))
    },
    Some("""
      WITH RECURSIVE daily AS (
        SELECT c.c_mktsegment AS segment,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                 AS BIGINT) AS cents,
               CAST(o_orderdate AS DATE) AS day
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 3),
      r AS (
        SELECT segment, cents,
               CAST(row_number() OVER (PARTITION BY segment ORDER BY day)
                 AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n_days
        FROM daily),
      rec AS (
        SELECT segment, rn, n_days, cents AS l, CAST(0 AS BIGINT) AS b,
               CAST(0 AS BIGINT) AS sae
        FROM r WHERE rn = 1
        UNION ALL
        SELECT r.segment, r.rn, r.n_days,
               CAST(round((r.cents + rec.l + rec.b) / 2.0) AS BIGINT),
               CAST(round((CAST(round((r.cents + rec.l + rec.b) / 2.0)
                 AS BIGINT) - rec.l + rec.b) / 2.0) AS BIGINT),
               rec.sae + abs(r.cents - (rec.l + rec.b))
        FROM rec JOIN r ON r.segment = rec.segment AND r.rn = rec.rn + 1)
      SELECT segment, n_days,
             l AS level_final, b AS trend_final,
             l + 7 * b AS forecast_7d, sae
      FROM rec WHERE rn = n_days
      ORDER BY segment
    """)
  )

  def all: Seq[GraftQuery] =
    Seq(q21AsofPrevError, q22RangeJoinNeighbors, q23CustomVariance,
      q27AsofJoinNative, q36GapfillResample, q37RollingFeatures,
      q60OhlcResample, q65Twap, q69SeasonalNaive, q70InterpLinear,
      q76RangeWindow, featPitBackfill, q118AsofForward, q119AsofNearest,
      q147HoltTrend)
}
