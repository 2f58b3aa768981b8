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

  test("Q9 product profit: dense margin recompute per nation-year") {
    val t = graft.sources.Tables(spark, sf)
    val widgetRetail = t.part.filter(col("p_name").contains("widget"))
      .collect().map(r => r.getAs[Long]("p_partkey") ->
        r.getAs[Double]("p_retailprice")).toMap
    val suppNation = {
      val natName = t.nation.collect()
        .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
      t.supplier.collect().map(r => r.getAs[Long]("s_suppkey") ->
        natName(r.getAs[Int]("s_nationkey"))).toMap
    }
    val orderYear = t.orders.select(col("o_orderkey"), year(col("o_orderdate")))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val want = t.lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .collect()
      .flatMap { r =>
        widgetRetail.get(r.getLong(1)).map { retail =>
          val profit = revenue(r.getDouble(4), r.getDouble(5)) -
            BigDecimal(retail).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
              BigDecimal(r.getDouble(3)).setScale(1, BigDecimal.RoundingMode.HALF_UP) *
              BigDecimal("0.6")
          (suppNation(r.getLong(2)), orderYear(r.getLong(0))) -> profit
        }
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum.toDouble }
    val got = SparkEntry.queries("q107_product_profit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == want, "profit cells")
  }

  test("Q12 delay-priority: split counts conserve the join row count") {
    val t = graft.sources.Tables(spark, sf)
    val rows = SparkEntry.queries("q108_ship_delay_priority")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("LATE", "ONTIME"))
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total == t.lineitem.count(), "every line lands in one bucket")
    val critOrders = t.orders
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val critLines = t.lineitem.select(col("l_orderkey")).collect()
      .count(r => critOrders(r.getLong(0)))
    assert(rows.map(_.getLong(1)).sum == critLines, "critical split")
  }

  test("Q13 custdist: distribution recompute including the zero bucket") {
    val t = graft.sources.Tables(spark, sf)
    val perCust = t.orders.filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey")).collect().groupBy(_.getLong(0))
      .view.mapValues(_.length.toLong).toMap
    val want = t.customer.select(col("c_custkey")).collect()
      .map(r => perCust.getOrElse(r.getLong(0), 0L))
      .groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val got = SparkEntry.queries("q109_cust_order_dist")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // (the zero bucket exists at sf0.01 — covered by the oracle gate;
    // at this spec's SF every customer has qualifying orders)
    assert(got == want, "distribution")
  }

  test("Q18 large orders: survivor set and ordering discipline") {
    val t = graft.sources.Tables(spark, sf)
    val qty = t.lineitem.select(col("l_orderkey"), col("l_quantity")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => BigDecimal(r.getDouble(1))
        .setScale(1, BigDecimal.RoundingMode.HALF_UP)).sum).toMap
    val survivors = qty.filter(_._2 > 300).keySet
    val rows = SparkEntry.queries("q110_large_orders")(spark, sf).collect()
    assert(survivors.size <= 100, "limit must not truncate at this SF")
    assert(rows.map(_.getLong(2)).toSet == survivors, "survivor orderkeys")
    rows.foreach(r => assert(r.getDouble(5) == qty(r.getLong(2)).toDouble))
    // sliding(2) emits a 1-element window on a 1-row result — only
    // pattern-match full pairs
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(4) > b.getDouble(4) ||
          (a.getDouble(4) == b.getDouble(4) && a.getLong(2) < b.getLong(2)),
          "sort order broken")
      case _ => ()
    }
  }

  test("Q19 disjunctive revenue: dense branch recompute") {
    val t = graft.sources.Tables(spark, sf)
    val partAttr = t.part.collect().map(r => r.getAs[Long]("p_partkey") ->
      (r.getAs[String]("p_brand"), r.getAs[Int]("p_size"))).toMap
    val want = t.lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .collect()
      .flatMap { r =>
        val (brand, size) = partAttr(r.getLong(0))
        val q = r.getDouble(1)
        val hit =
          (brand == "Brand#3" && size >= 1 && size <= 10 && q >= 1 && q <= 11) ||
          (brand == "Brand#15" && size >= 1 && size <= 20 && q >= 10 && q <= 20) ||
          (brand == "Brand#24" && size >= 1 && size <= 30 && q >= 20 && q <= 30)
        if (hit) Some(revenue(r.getDouble(2), r.getDouble(3))) else None
      }.sum
    val got = SparkEntry.queries("q111_disjunctive_revenue")(spark, sf)
      .collect().head.getDouble(0)
    assert(got == want.toDouble, "disjunctive revenue")
  }

  test("Q16 supplier-part counts: distinct-supplier recompute with exclusions") {
    val t = graft.sources.Tables(spark, sf)
    val partAttr = t.part
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").between(1, 8))
      .collect().map(r => r.getAs[Long]("p_partkey") ->
        (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
          r.getAs[Int]("p_size").toLong)).toMap
    val complained = t.supplier.filter(col("s_acctbal") < 0)
      .collect().map(_.getAs[Long]("s_suppkey")).toSet
    val want = t.lineitem.select(col("l_partkey"), col("l_suppkey")).collect()
      .flatMap { r =>
        val supp = r.getLong(1)
        if (complained(supp)) None
        else partAttr.get(r.getLong(0)).map(attr => attr -> supp)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct.length.toLong }
    val got = SparkEntry.queries("q112_supplier_part_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    // (the exclusion list is non-empty at sf0.01 — covered by the
    // oracle gate; this SF may have no negative balances)
    assert(got == want, "supplier counts")
  }

  test("Q20 restock candidates: correlated threshold recompute") {
    val t = graft.sources.Tables(spark, sf)
    val slice = t.part.filter(col("p_name").startsWith("small"))
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val names = t.supplier.collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("s_name")).toMap
    val want = t.lineitem
      .select(col("l_suppkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("q"), year(col("l_shipdate")).as("y"))
      .collect()
      .filter(r => slice(r.getLong(1)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case ((sk, _), rs) =>
        val q97 = rs.filter(_.getInt(3) == 1997).map(_.getLong(2)).sum
        val qtot = rs.map(_.getLong(2)).sum
        (sk, q97, qtot)
      }
      .filter { case (_, q97, qtot) => 2L * q97 > qtot }
      .groupBy(_._1)
      .map { case (sk, ps) =>
        sk -> (names(sk), ps.size.toLong, ps.map(_._2).sum) }
    val got = SparkEntry.queries("q124_restock_candidates")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want, "restock candidate set")
    assert(want.nonEmpty, "slice must qualify some suppliers at this SF")
  }
}
