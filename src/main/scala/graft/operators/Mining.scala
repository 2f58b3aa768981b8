package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Pattern-mining family: market-basket association rules over the
  * co-purchase pair frame the graph family already materializes.
  *
  * Reference scope: the reference engine delegates relational
  * analytics to its host dataframe layer (dask-xgboost `core.py`
  * builds training frames from arbitrary dask graphs); basket mining
  * is the canonical "feature mining before training" step a pipeline
  * at this layer runs.
  */
object Mining {

  /** Minimum number of orders a pair must co-occur in to form a rule.
    * At sf0.01 cnt>=2 keeps ~3.4k pairs of 115k — the classic support
    * prune that makes A-priori tractable; at 100 TB the same filter
    * runs map-side on the pair-count aggregate before any rule math.
    */
  val MinPairOrders = 2L

  /** Rules reported (by lift). */
  val TopRules = 50

  /** Association rules a→b with support / confidence / lift from the
    * shared weighted co-purchase frame ([[Graph.copurchaseWeightedShared]]
    * — (u, v, cnt) both directions, so each directed rule is one row
    * already). Per-item order counts and the basket total are two
    * more aggregates over the same (order, part) projection. Scale:
    * the support prune (cnt >= [[MinPairOrders]]) shrinks the pair
    * frame BEFORE the item-count joins, so the expensive all-pairs
    * frame is touched once (and it's the memoized one the graph
    * queries already paid for); the item-count joins then key on a
    * few thousand survivors. All rule math is exact-integer-derived:
    * one double division / one multiply-divide chain, spelled
    * identically in the oracle, rounded to 6 before the final sort.
    */
  val miningAssocRules = GraftQuery(
    "mining_assoc_rules",
    (s, dir) => {
      val t = Tables(s, dir)
      val sym = Graph.copurchaseWeightedShared(s, dir)
      val items = t.lineitem
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val itemCnt = items.groupBy(col("p")).agg(count(lit(1)).as("c1"))
      val nOrders = items.agg(count_distinct(col("o")).as("n_orders"))
      val pruned = sym.filter(col("cnt") >= MinPairOrders)
      val joined = pruned
        .join(itemCnt.select(col("p").as("u"), col("c1").as("n_ante")), Seq("u"))
        .join(itemCnt.select(col("p").as("v"), col("c1").as("n_cons")), Seq("v"))
        .crossJoin(broadcast(nOrders))
      // doubles derive from exact longs (< 2^53 far beyond sf100) via
      // the same op chain as the oracle: one division for support and
      // confidence, one multiply-then-divide for lift
      val support = col("cnt").cast("double") / col("n_orders").cast("double")
      val confidence = col("cnt").cast("double") / col("n_ante").cast("double")
      val lift = (col("cnt").cast("double") * col("n_orders").cast("double")) /
        (col("n_ante").cast("double") * col("n_cons").cast("double"))
      joined
        .select(col("u").as("antecedent"), col("v").as("consequent"),
          col("cnt").as("n_pair"), col("n_ante"), col("n_cons"),
          round(support, 6).as("support"),
          round(confidence, 6).as("confidence"),
          round(lift, 6).as("lift"))
        .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
        .limit(TopRules)
    },
    Some(s"""
      WITH items AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      e AS (SELECT a.p AS pa, b.p AS pb, COUNT(*) AS cnt
            FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2),
      sym AS (SELECT pa AS u, pb AS v, cnt FROM e
              UNION ALL SELECT pb, pa, cnt FROM e),
      ic AS (SELECT p, COUNT(*) AS c1 FROM items GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM items)
      SELECT s.u AS antecedent, s.v AS consequent, s.cnt AS n_pair,
             ia.c1 AS n_ante, ib.c1 AS n_cons,
             round(CAST(s.cnt AS DOUBLE) / CAST(n_orders AS DOUBLE), 6)
               AS support,
             round(CAST(s.cnt AS DOUBLE) / CAST(ia.c1 AS DOUBLE), 6)
               AS confidence,
             round((CAST(s.cnt AS DOUBLE) * CAST(n_orders AS DOUBLE))
               / (CAST(ia.c1 AS DOUBLE) * CAST(ib.c1 AS DOUBLE)), 6) AS lift
      FROM sym s
      JOIN ic ia ON ia.p = s.u
      JOIN ic ib ON ib.p = s.v
      CROSS JOIN n
      WHERE s.cnt >= $MinPairOrders
      ORDER BY lift DESC, antecedent, consequent
      LIMIT $TopRules
    """)
  )

  /** Sequential pattern mining over per-user event streams:
    * consecutive event-type bigrams AND trigrams (k = 2, 3), each with
    * count, chain-rule prefix count, support (share of all k-grams)
    * and confidence (P(last | prefix) = cnt / prefix_cnt). ONE
    * user_id exchange + sort serves both lead() offsets; the k-gram
    * frames are event-type-domain-sized (|types|^k rows), so the
    * prefix/total windows and the union are near-free at any SF. All
    * rule math is exact-integer-derived with one division per ratio,
    * rounded to 6 — the mining_assoc_rules numeric policy.
    */
  val miningSeqPatterns = GraftQuery(
    "mining_seq_patterns",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val seq = t.events
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e0"))
        .withColumn("e1", lead(col("e0"), 1).over(w))
        .withColumn("e2", lead(col("e0"), 2).over(w))
      // ONE pass over the data: both lead() offsets ride the same
      // exchange+sort, and a single (e0, e1, e2) aggregation (domain-
      // sized: ≤ |types|³ + null-e2 rows) feeds both k-gram frames —
      // the bigram/trigram split never re-touches the events scan
      val base = seq.filter(col("e1").isNotNull)
        .groupBy(col("e0"), col("e1"), col("e2"))
        .agg(count(lit(1)).as("cnt"))
        .persist()
      def grams(k: Int, src: DataFrame, pattern: Column,
          prefix: Column): DataFrame =
        src.groupBy(pattern.as("pattern"), prefix.as("prefix"))
          .agg(sum(col("cnt")).as("cnt"))
          .withColumn("k", lit(k.toLong))
      val bi = grams(2, base, concat_ws(">", col("e0"), col("e1")),
        col("e0"))
      val tri = grams(3, base.filter(col("e2").isNotNull),
        concat_ws(">", col("e0"), col("e1"), col("e2")),
        concat_ws(">", col("e0"), col("e1")))
      val all = bi.unionByName(tri)
      // domain-sized frame: |event_types|^k rows
      val wk = org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k"), col("prefix"))
      val out = all
        .withColumn("total_k", sum(col("cnt")).over(wk))
        .withColumn("prefix_cnt", sum(col("cnt")).over(wp))
        .select(col("k"), col("pattern"), col("cnt"), col("prefix_cnt"),
          round(col("cnt").cast("double") / col("total_k").cast("double"), 6)
            .as("support"),
          round(col("cnt").cast("double") / col("prefix_cnt").cast("double"), 6)
            .as("confidence"))
        .orderBy(col("k"), col("cnt").desc, col("pattern"))
      out.persist().count()
      base.unpersist(false)
      out
    },
    Some("""
      WITH seq AS (
        SELECT event_type AS e0,
               lead(event_type, 1) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
               lead(event_type, 2) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS e2
        FROM events),
      bi AS (
        SELECT 2 AS k, e0 || '>' || e1 AS pattern, e0 AS prefix,
               COUNT(*) AS cnt
        FROM seq WHERE e1 IS NOT NULL GROUP BY 2, 3),
      tri AS (
        SELECT 3 AS k, e0 || '>' || e1 || '>' || e2 AS pattern,
               e0 || '>' || e1 AS prefix, COUNT(*) AS cnt
        FROM seq WHERE e2 IS NOT NULL GROUP BY 2, 3),
      u AS (SELECT * FROM bi UNION ALL SELECT * FROM tri),
      tot AS (
        SELECT CAST(k AS BIGINT) AS k, pattern, CAST(cnt AS BIGINT) AS cnt,
               CAST(SUM(cnt) OVER (PARTITION BY k) AS BIGINT) AS total_k,
               CAST(SUM(cnt) OVER (PARTITION BY k, prefix) AS BIGINT)
                 AS prefix_cnt
        FROM u)
      SELECT k, pattern, cnt, prefix_cnt,
             round(CAST(cnt AS DOUBLE) / CAST(total_k AS DOUBLE), 6)
               AS support,
             round(CAST(cnt AS DOUBLE) / CAST(prefix_cnt AS DOUBLE), 6)
               AS confidence
      FROM tot
      ORDER BY k, cnt DESC, pattern
    """)
  )

  /** Train/test boundary for the Markov backtest (mid-corpus; aligned
    * with the q88/q93/q99 scorer cutoff).
    */
  val BacktestCutoff = "2024-01-15 00:00:00"

  /** Temporal backtest of the first-order Markov next-event model:
    * fit transition argmaxes on pre-cutoff bigrams, score top-1
    * next-event accuracy on post-cutoff bigrams — the evaluation a
    * sequence model actually gets in production, with the rolling-
    * origin leakage discipline (boundary-crossing pairs belong to
    * neither side). Both eras' bigrams ride ONE user_id exchange
    * (the mining_seq_patterns lesson: a single lead() pass feeds two
    * domain-sized aggregates); the fitted model is a ≤|types| row
    * broadcast, the argmax rank runs on the ≤|types|² transition
    * frame, and accuracy is exact integers until one division.
    */
  val mlMarkovBacktest = GraftQuery(
    "ml_markov_backtest",
    (s, dir) => {
      val t = Tables(s, dir)
      val cutoff = lit(BacktestCutoff).cast("timestamp")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = t.events
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("e0"))
        .withColumn("e1", lead(col("e0"), 1).over(w))
        .withColumn("ts1", lead(col("ts"), 1).over(w))
        .filter(col("e1").isNotNull)
        // one domain-sized aggregate carries both eras
        .groupBy(col("e0"), col("e1"),
          when(col("ts1") < cutoff, "train")
            .when(col("ts") >= cutoff, "test").as("era"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("era").isNotNull) // boundary-crossing pairs: neither era
      val rk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("e0")).orderBy(col("cnt").desc, col("e1"))
      val model = pairs.filter(col("era") === "train")
        .withColumn("r", row_number().over(rk))
        .filter(col("r") === 1)
        .select(col("e0"), col("e1").as("predicted_next"))
      val trainN = pairs.filter(col("era") === "train")
        .groupBy(col("e0")).agg(sum(col("cnt")).as("n_train"))
      pairs.filter(col("era") === "test")
        .join(broadcast(model), Seq("e0"))
        .join(broadcast(trainN), Seq("e0"))
        .groupBy(col("e0").as("prev_type"), col("predicted_next"),
          col("n_train"))
        .agg(sum(col("cnt")).as("n_test"),
          sum(when(col("e1") === col("predicted_next"), col("cnt"))
            .otherwise(0L)).as("n_correct"))
        .select(col("prev_type"), col("predicted_next"), col("n_train"),
          col("n_test"), col("n_correct"),
          when(col("n_test") > 0, col("n_correct").cast("double") /
            col("n_test").cast("double")).as("acc"))
        .orderBy(col("prev_type"))
    },
    Some(s"""
      WITH seq AS (
        SELECT event_type AS e0,
               lead(event_type) OVER w AS e1,
               ts, lead(ts) OVER w AS ts1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      pairs AS (
        SELECT e0, e1,
               CASE WHEN ts1 < TIMESTAMP '$BacktestCutoff' THEN 'train'
                    WHEN ts >= TIMESTAMP '$BacktestCutoff' THEN 'test'
               END AS era,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM seq WHERE e1 IS NOT NULL
        GROUP BY 1, 2, 3
        HAVING era IS NOT NULL),
      model AS (
        SELECT e0, e1 AS predicted_next
        FROM (SELECT e0, e1, row_number() OVER (PARTITION BY e0
                ORDER BY cnt DESC, e1) AS r
              FROM pairs WHERE era = 'train')
        WHERE r = 1),
      train_n AS (
        SELECT e0, CAST(SUM(cnt) AS BIGINT) AS n_train
        FROM pairs WHERE era = 'train' GROUP BY 1)
      SELECT p.e0 AS prev_type, m.predicted_next, t.n_train,
             CAST(SUM(p.cnt) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN p.e1 = m.predicted_next THEN p.cnt
                           ELSE 0 END) AS BIGINT) AS n_correct,
             CASE WHEN SUM(p.cnt) > 0
                  THEN CAST(SUM(CASE WHEN p.e1 = m.predicted_next
                         THEN p.cnt ELSE 0 END) AS DOUBLE)
                    / CAST(SUM(p.cnt) AS DOUBLE) END AS acc
      FROM pairs p
      JOIN model m ON m.e0 = p.e0
      JOIN train_n t ON t.e0 = p.e0
      WHERE p.era = 'test'
      GROUP BY 1, 2, 3
      ORDER BY 1
    """)
  )

  /** Minimum gap count for a defined regularity score (one gap has
    * zero variance by construction).
    */
  val MinGaps = 2L

  /** Squared-CV threshold below which an inter-purchase pattern
    * counts as periodic (a Poisson process has cv² ≈ 1; strictly
    * regular arrivals have cv² ≈ 0).
    */
  val PeriodicCv2 = 0.5

  /** Inter-purchase interval regularity per user — the periodic-
    * pattern miner: users whose purchases recur at near-constant
    * intervals (subscriptions, bots, replenishment cycles) separate
    * from Poisson-like browsers by the squared coefficient of
    * variation of their gap sequence. Exactness: cv² is computed via
    * the integer identity cv² = (n·Σg² − (Σg)²)/(Σg)² — gaps stay in
    * raw MICROS (no truncation), squares ride DECIMAL(38) (HUGEINT on
    * the oracle side), and the ONLY float op is the final division of
    * two exactly-rounded doubles, so both engines emit bit-identical
    * results. Scale: one user_id exchange for the lag window, then a
    * map-side-combined aggregate; output is |users|-sized.
    */
  val miningPeriodicIntervals = GraftQuery(
    "mining_periodic_intervals",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val t = Tables(s, dir)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val dec38 = DecimalType(38, 0)
      val gaps = t.events.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), (col("us") - col("prev")).as("g"))
      gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("g").cast(dec38)).as("sg"),
          sum(col("g").cast(dec38) * col("g")).as("sg2"))
        // sg > 0 guards the 0/0 cell: all-zero gaps (co-timestamped
        // purchases) would give Spark NaN but DuckDB NULL — a silent
        // cross-engine divergence, not just an edge case
        .filter(col("n_gaps") >= MinGaps && col("sg") > 0)
        .select(col("user_id"), col("n_gaps"),
          ((col("n_gaps").cast(dec38) * col("sg2") - col("sg") * col("sg"))
            .cast(DoubleType) /
            (col("sg") * col("sg")).cast(DoubleType)).as("cv2"))
        .withColumn("periodic", col("cv2") < PeriodicCv2)
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH p AS (
        SELECT user_id, epoch_us(ts) AS us, event_id
        FROM events WHERE event_type = 'purchase'),
      g AS (
        SELECT user_id,
               us - lag(us) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS g
        FROM p),
      a AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
               SUM(CAST(g AS HUGEINT)) AS sg,
               SUM(CAST(g AS HUGEINT) * g) AS sg2
        FROM g WHERE g IS NOT NULL
        GROUP BY 1
        HAVING COUNT(*) >= $MinGaps AND SUM(CAST(g AS HUGEINT)) > 0)
      SELECT user_id, n_gaps,
             CAST(n_gaps * sg2 - sg * sg AS DOUBLE)
               / CAST(sg * sg AS DOUBLE) AS cv2,
             CAST(n_gaps * sg2 - sg * sg AS DOUBLE)
               / CAST(sg * sg AS DOUBLE) < $PeriodicCv2 AS periodic
      FROM a
      ORDER BY user_id
    """)
  )

  def all: Seq[GraftQuery] =
    Seq(miningAssocRules, miningSeqPatterns, mlMarkovBacktest,
      miningPeriodicIntervals)
}
