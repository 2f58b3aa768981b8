package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mining

class MiningSpec extends AnyFunSuite {
  import TestSession._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("association rules equal a dense recompute") {
    val items = graft.sources.Tables(spark, sf).lineitem
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nOrders = byOrder.size.toLong
    val itemCnt = items.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for ((_, ps) <- byOrder; a <- ps; b <- ps if a < b)
      pairCnt((a, b)) += 1
    val want = pairCnt.iterator
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .filter(_._3 >= Mining.MinPairOrders)
      .map { case (u, v, c) =>
        val (cu, cv) = (itemCnt(u), itemCnt(v))
        val lift = r6((c.toDouble * nOrders.toDouble) / (cu.toDouble * cv.toDouble))
        (u, v, c, cu, cv,
          r6(c.toDouble / nOrders.toDouble), r6(c.toDouble / cu.toDouble), lift)
      }
      .toSeq.sortBy { case (u, v, _, _, _, _, _, lift) => (-lift, u, v) }
      .take(Mining.TopRules)
    val got = SparkEntry.queries("mining_assoc_rules")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(got.toSeq == want, "association rules mismatch vs dense recompute")
    // sanity on the rule algebra itself: confidence <= 1, lift > 0,
    // and the support prune held
    got.foreach { case (_, _, c, cu, _, _, conf, lift) =>
      assert(c >= Mining.MinPairOrders && c <= cu)
      assert(conf <= 1.0 + 1e-12 && lift > 0.0)
    }
  }
}
