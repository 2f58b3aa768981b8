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

  test("sequential patterns equal a dense per-user walk; chain rule holds") {
    val ev = graft.sources.Tables(spark, sf).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val biCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val triCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, rs) =>
      // full microsecond precision — Timestamp.getTime alone is millis
      val seq = rs.sortBy { r =>
        val i = r._2.toInstant
        (i.getEpochSecond * 1000000L + i.getNano / 1000L, r._3)
      }.map(_._4)
      seq.sliding(2).foreach { w =>
        if (w.length == 2) biCnt(w.mkString(">")) += 1L
      }
      seq.sliding(3).foreach { w =>
        if (w.length == 3) triCnt(w.mkString(">")) += 1L
      }
    }
    val got = SparkEntry.queries("mining_seq_patterns")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val gotBi = got.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    val gotTri = got.filter(_._1 == 3L).map(r => r._2 -> r._3).toMap
    assert(gotBi == biCnt.toMap, "bigram counts differ from dense walk")
    assert(gotTri == triCnt.toMap, "trigram counts differ from dense walk")
    // chain rule: per (k, prefix), pattern counts sum to prefix_cnt and
    // support ratios are the advertised single divisions
    got.groupBy(r => (r._1, r._2.split(">").dropRight(1).mkString(">")))
      .foreach { case ((_, _), rs) =>
        assert(rs.map(_._3).sum == rs.head._4, "prefix count mismatch")
      }
    val totals = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    got.foreach { case (k, _, cnt, pfx, sup, conf) =>
      assert(sup == r6(cnt.toDouble / totals(k).toDouble), "support")
      assert(conf == r6(cnt.toDouble / pfx.toDouble), "confidence")
    }
  }
}
