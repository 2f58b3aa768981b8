package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.GraftQuery
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** The remaining classic TPC-H query shapes the relational surface
  * hadn't exercised yet — bilateral flow matrices (Q7), share-of-total
  * against a competitor dimension (Q8), top-k revenue with dimension
  * enrichment (Q10), conditional-ratio scans (Q14), and
  * argmax-with-exact-ties over an aggregate (Q15). The reference
  * delegates all of this to its host dataframe library
  * (reference `README.rst:53-55`, `core.py:300-304`); shipping the
  * shapes natively is part of capability parity.
  *
  * Scale posture shared by all five: dimension tables are pre-FILTERED
  * to the query's slice before touching the fact (so the fact rows
  * drop at the earliest join), small dims are broadcast explicitly,
  * and every ratio is one division of two exact-decimal sums cast to
  * double — bit-stable against the DuckDB oracle regardless of
  * partition count.
  *
  * The generated testdata has no l_shipmode / l_commitdate /
  * p_container columns, so Q12/Q19/Q4-timing variants are not
  * expressible on it; this module covers the shapes the schema
  * supports.
  */
object TpchShapes {

  /** TPC-H Q7 (volume shipping): bilateral revenue flows between two
    * trading blocs by ship year. The supplier side resolves through
    * supplier→nation→region, the customer side through orders→
    * customer→nation→region — two independent dimension paths onto
    * one fact row. The blocs are REGIONS (not the textbook's two
    * nations) so the flow matrix is dense at every test SF; the shape
    * — two dimension paths, cross-flow filter, year rollup — is
    * unchanged. Scale: supplier and customer frames are pre-filtered
    * to the two blocs BEFORE the fact joins (selectivity a post-join
    * filter would pay the full shuffle for), the filtered supplier
    * dim is broadcast, the ship-year slice is a raw timestamp range
    * so it pushes into the parquet scan, and the orders join shuffles
    * on orderkey as it must. With AQE the customer join flips to
    * broadcast when the filtered side fits.
    */
  val q100VolumeShipping = GraftQuery(
    "q100_volume_shipping",
    (s, dir) => {
      val t = Tables(s, dir)
      val blocs = Seq("ASIA", "EUROPE")
      def natRegion(as: String) = t.nation
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name").isin(blocs: _*))
        .select(col("n_nationkey"), col("r_name").as(as))
      val suppR = t.supplier
        .join(broadcast(natRegion("supp_region")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_region"))
      val custR = t.customer
        .join(broadcast(natRegion("cust_region")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("cust_region"))
      t.lineitem
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(broadcast(suppR), col("l_suppkey") === col("s_suppkey"))
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custR), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_region") =!= col("cust_region"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast(DoubleType).as("revenue"))
        .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
    },
    Some("""
      SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
               AS DOUBLE) AS revenue
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      JOIN region sr ON sr.r_regionkey = sn.n_regionkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region cr ON cr.r_regionkey = cn.n_regionkey
      WHERE sr.r_name IN ('ASIA', 'EUROPE')
        AND cr.r_name IN ('ASIA', 'EUROPE')
        AND sr.r_name <> cr.r_name
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3
    """)
  )

  /** TPC-H Q8 (national market share): of all PROMO-part revenue sold
    * to customers in ASIA, the fraction supplied by NATION_5, per
    * order year. One aggregation computes numerator (conditional sum)
    * and denominator together — no second pass, no self-join; the
    * share is ONE double division of two exact-decimal sums, so both
    * engines compare bit-identical IEEE results. Scale: part is
    * pre-filtered to the type slice and broadcast; the region
    * restriction prunes customers before the orders join.
    */
  val q101MarketShare = GraftQuery(
    "q101_market_share",
    (s, dir) => {
      val t = Tables(s, dir)
      val promoParts = t.part.filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))
      val asiaCust = t.customer
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("c_custkey"))
      val suppNation = t.supplier
        .join(broadcast(t.nation.select(col("n_nationkey"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      t.lineitem
        .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(t.orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_5",
            dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .otherwise(lit(0).cast("decimal(4,2)")))
            .cast(DoubleType).as("nation_rev"),
          sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast(DoubleType).as("total_rev"))
        .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
        .orderBy(col("o_year"))
    },
    Some("""
      WITH flows AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE) AS nation_rev,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
                 AS DOUBLE) AS total_rev
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE EXISTS (
          SELECT 1 FROM customer c
          JOIN nation cn ON cn.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = cn.n_regionkey
          WHERE c.c_custkey = o.o_custkey AND r.r_name = 'ASIA')
        GROUP BY 1)
      SELECT o_year, nation_rev, total_rev,
             nation_rev / total_rev AS mkt_share
      FROM flows
      ORDER BY o_year
    """)
  )

  /** TPC-H Q10 (returned-item reporting): the 20 customers who lost
    * the most revenue to returns in one quarter, enriched with their
    * nation. Revenue is exact-decimal; the LIMIT is made
    * deterministic by the (revenue DESC, c_custkey) tie-break both
    * engines state. Scale: the quarter filter prunes orders at the
    * scan, the R-flag filter prunes lineitem at the scan, and only
    * the surviving ~2% of fact rows reach the orderkey shuffle;
    * customer/nation attach AFTER the 20-row cut would be wrong
    * (revenue groups by customer), so customer joins pre-aggregation
    * but the frame at that point is already order-grain, not
    * line-grain.
    */
  val q102ReturnedItems = GraftQuery(
    "q102_returned_items",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1999-01-01 00:00:00").cast("timestamp")
      val hi = lit("1999-04-01 00:00:00").cast("timestamp")
      t.lineitem
        .filter(col("l_returnflag") === "R")
        .join(t.orders.filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast(DoubleType).as("revenue"))
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c.c_custkey, c.c_name,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
               AS DOUBLE) AS revenue,
             c.c_acctbal, n.n_name
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1999-04-01 00:00:00'
      GROUP BY 1, 2, 4, 5
      ORDER BY revenue DESC, c.c_custkey
      LIMIT 20
    """)
  )

  /** TPC-H Q14 (promo effect): the share of one month's revenue
    * attributable to PROMO parts — a conditional-sum / total-sum
    * ratio in one scan. The month filter hits the lineitem scan
    * (PushedFilters), the part dim is broadcast, and the two decimal
    * sums divide once in double. Single-row result.
    */
  val q103PromoRevenue = GraftQuery(
    "q103_promo_revenue",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1998-09-01 00:00:00").cast("timestamp")
      val hi = lit("1998-10-01 00:00:00").cast("timestamp")
      t.lineitem
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(broadcast(t.part.select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .otherwise(lit(0).cast("decimal(4,2)")))
            .cast(DoubleType).as("promo_rev"),
          sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast(DoubleType).as("total_rev"))
        .withColumn("promo_pct",
          lit(100.0) * col("promo_rev") / col("total_rev"))
    },
    Some("""
      SELECT
        CAST(SUM(CASE WHEN p.p_type = 'PROMO'
          THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
          ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE) AS promo_rev,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
          * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
          AS DOUBLE) AS total_rev,
        100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
          THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
          ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
          / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS promo_pct
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1998-09-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-10-01 00:00:00'
    """)
  )

  /** TPC-H Q15 (top supplier): the supplier(s) whose quarterly
    * revenue equals the maximum — argmax with EXACT tie semantics.
    * Ranking happens on the DECIMAL revenue (before the double
    * render), so equal revenues tie in both engines by exact
    * arithmetic, not by double rounding luck. The rank window is
    * global but runs over the |suppliers|-sized aggregate, never the
    * fact. Scale: one fact aggregation on l_suppkey, then a
    * domain-sized window.
    */
  val q104TopSupplier = GraftQuery(
    "q104_top_supplier",
    (s, dir) => {
      val t = Tables(s, dir)
      val lo = lit("1999-01-01 00:00:00").cast("timestamp")
      val hi = lit("1999-04-01 00:00:00").cast("timestamp")
      val rev = t.lineitem
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy(col("l_suppkey"))
        .agg(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .as("rev_dec"))
      rev
        .withColumn("rk", dense_rank().over(Window.orderBy(col("rev_dec").desc)))
        .filter(col("rk") === 1)
        .join(broadcast(t.supplier.select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast(DoubleType).as("total_rev"))
        .orderBy(col("s_suppkey"))
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                 AS rev_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-04-01 00:00:00'
        GROUP BY 1)
      SELECT s.s_suppkey, s.s_name, CAST(r.rev_dec AS DOUBLE) AS total_rev
      FROM rev r
      JOIN supplier s ON s.s_suppkey = r.l_suppkey
      WHERE r.rev_dec = (SELECT MAX(rev_dec) FROM rev)
      ORDER BY s.s_suppkey
    """)
  )

  def all: Seq[GraftQuery] =
    Seq(q100VolumeShipping, q101MarketShare, q102ReturnedItems,
      q103PromoRevenue, q104TopSupplier)
}
