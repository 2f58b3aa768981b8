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

  test("Markov backtest: model fit on train era only, accuracy recomputed densely") {
    import graft.operators.Mining.BacktestCutoff
    val cutoff = java.time.LocalDateTime.parse(
      BacktestCutoff.replace(" ", "T"))
    val ev = graft.sources.Tables(spark, sf).events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Timestamp](1).toLocalDateTime,
        r.getLong(2), r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4, a._2, b._2)
      }
    }.toSeq
    val train = pairs.filter(_._4.isBefore(cutoff))
    val test = pairs.filter(p => !p._3.isBefore(cutoff))
    val model = train.groupBy(_._1).map { case (e0, ps) =>
      val byNext = ps.groupBy(_._2).view.mapValues(_.size).toMap
      val best = byNext.toSeq.sortBy { case (e1, c) => (-c, e1) }.head._1
      e0 -> ((best, ps.size.toLong))
    }
    val rows = SparkEntry.queries("ml_markov_backtest")(spark, sf).collect()
    rows.foreach { r =>
      val prev = r.getString(0)
      val (wantNext, nTrain) = model(prev)
      assert(r.getString(1) == wantNext, s"prediction for $prev")
      assert(r.getLong(2) == nTrain, s"n_train for $prev")
      val te = test.filter(_._1 == prev)
      assert(r.getLong(3) == te.size, s"n_test for $prev")
      val correct = te.count(_._2 == wantNext).toLong
      assert(r.getLong(4) == correct, s"n_correct for $prev")
      assert(r.getDouble(5) == correct.toDouble / te.size, s"acc for $prev")
    }
    // boundary-crossing pairs belong to neither era
    assert(train.size + test.size < pairs.size,
      "corpus must contain boundary-crossing pairs for the exclusion to bite")
    // sanity gate, not a model claim: the synthetic transitions are
    // near-independent (measured aggregate acc ≈ 0.185 — the train-
    // majority class's share in the drifted test era); a scrambled
    // join or era mixup lands far below the majority-class floor
    val totCorrect = rows.map(_.getLong(4)).sum.toDouble
    val totTest = rows.map(_.getLong(3)).sum.toDouble
    assert(totCorrect / totTest > 0.15, s"aggregate acc ${totCorrect / totTest}")
  }

  test("periodic intervals: exact-rational cv2 matches dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val ev = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = ev.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3)).map(_._2)
      val gaps = sorted.sliding(2).map(p => BigInt(p(1) - p(0))).toSeq
      val sg0 = gaps.sum
      if (gaps.length < operators.Mining.MinGaps || sg0 <= 0) None
      else {
        val n = BigInt(gaps.length)
        val sg = sg0
        val sg2 = gaps.map(g => g * g).sum
        val cv2 = (n * sg2 - sg * sg).toDouble / (sg * sg).toDouble
        Some(u -> (gaps.length.toLong, cv2))
      }
    }
    val got = SparkEntry.queries("mining_periodic_intervals")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(got.keySet == want.keySet, "user set")
    want.foreach { case (u, (n, cv2)) =>
      assert(got(u)._1 == n, s"gap count for $u")
      assert(got(u)._2 == cv2, s"cv2 for $u")
      assert(got(u)._3 == (cv2 < operators.Mining.PeriodicCv2), s"flag for $u")
    }
  }
}
