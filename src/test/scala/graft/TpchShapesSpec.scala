package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dense recomputes for the classic TPC-H shapes in
  * [[graft.operators.TpchShapes]] — each test rebuilds the answer
  * from raw collected rows with plain Scala arithmetic and compares
  * against the query's distributed result.
  */
class TpchShapesSpec extends AnyFunSuite {
  import TestSession._

  private def revenue(ext: Double, disc: Double): BigDecimal =
    BigDecimal(ext).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
      (BigDecimal(1) - BigDecimal(disc).setScale(2, BigDecimal.RoundingMode.HALF_UP))

  test("Q7 volume shipping: both directions, dense revenue recompute") {
    val t = graft.sources.Tables(spark, sf)
    val natRegion = t.nation.join(t.region,
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("r_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val suppRegion = t.supplier.collect()
      .map(r => r.getAs[Long]("s_suppkey") ->
        natRegion(r.getAs[Int]("s_nationkey"))).toMap
    val custRegion = t.customer.collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        natRegion(r.getAs[Int]("c_nationkey"))).toMap
    val orderCust = t.orders.select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blocs = Set("ASIA", "EUROPE")
    val want = t.lineitem
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")),
        col("l_extendedprice"), col("l_discount"))
      .collect()
      .flatMap { r =>
        val (sr, cr) = (suppRegion(r.getLong(1)),
          custRegion(orderCust(r.getLong(0))))
        val y = r.getInt(2)
        if (blocs(sr) && blocs(cr) && sr != cr && y >= 1996 && y <= 1997)
          Some((sr, cr, y.toLong) -> revenue(r.getDouble(3), r.getDouble(4)))
        else None
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val got = SparkEntry.queries("q100_volume_shipping")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(got.keySet == want.keySet, "cell set")
    assert(got.keySet.map(_._1) == Set("ASIA", "EUROPE"),
      "both flow directions present")
    want.foreach { case (k, v) =>
      assert(got(k) == v.toDouble, s"revenue for $k")
    }
  }

  test("Q8 market share: share = nation_rev / total_rev, bounded") {
    val rows = SparkEntry.queries("q101_market_share")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nat >= 0.0 && nat <= tot, s"year ${r.getLong(0)}: nation beyond total")
      assert(share == nat / tot, s"year ${r.getLong(0)}: share not the one division")
    }
  }

  test("Q10 returned items: exactly 20, sorted, top-1 matches dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val window = t.orders
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCust = t.lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .flatMap(r => window.get(r.getLong(0))
        .map(c => c -> revenue(r.getDouble(1), r.getDouble(2))))
      .groupBy(_._1).map { case (c, vs) => c -> vs.map(_._2).sum.toDouble }
    val best = perCust.toSeq.sortBy { case (c, v) => (-v, c) }
    val rows = SparkEntry.queries("q102_returned_items")(spark, sf).collect()
    assert(rows.length == math.min(20, best.size))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(2) > b.getDouble(2) ||
        (a.getDouble(2) == b.getDouble(2) && a.getLong(0) < b.getLong(0)),
        "sort order broken")
    }
    assert(rows.head.getLong(0) == best.head._1 &&
      rows.head.getDouble(2) == best.head._2, "top-1 mismatch")
  }

  test("Q14 promo revenue: pct is the stated ratio") {
    val r = SparkEntry.queries("q103_promo_revenue")(spark, sf).collect().head
    val (promo, total, pct) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0.0 && promo <= total)
    assert(pct == 100.0 * promo / total)
  }

  test("Q15 top supplier: every returned row carries the global max revenue") {
    val t = graft.sources.Tables(spark, sf)
    val perSupp = t.lineitem
      .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => revenue(r.getDouble(1), r.getDouble(2))).sum
      }
    val maxRev = perSupp.values.max
    val winners = perSupp.filter(_._2 == maxRev).keySet
    val rows = SparkEntry.queries("q104_top_supplier")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == winners, "winner set")
    rows.foreach(r => assert(r.getDouble(2) == maxRev.toDouble))
  }
}
