package graft.operators

import org.apache.spark.sql.DataFrame
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

  def all: Seq[GraftQuery] = Seq(miningAssocRules)
}
