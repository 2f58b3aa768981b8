package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("as-of: prev_error is null before first error, set after") {
    val df = SparkEntry.queries("q21_asof_prev_error")(spark, sf)
    assert(df.count() > 0)
    // users whose first event is an error must have null prev for it
    val t = graft.sources.Tables(spark, sf)
    val firstErrors = t.events.orderBy("ts").groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"))).as("f"))
      .select(col("user_id"), col("f.event_id").as("event_id"))
    val joined = df.join(firstErrors, Seq("user_id", "event_id"))
    assert(joined.filter(col("prev_error_ts_s").isNotNull).count() == 0,
      "first event per user cannot have a prior error")
  }

  test("range join: bucketed result equals naive theta join at sf0.001") {
    val t = graft.sources.Tables(spark, sf)
    val ev = t.events.select(col("event_id"), unix_micros(col("ts")).as("us"))
    val naive = ev.as("a").join(ev.as("b"),
        col("b.us") > col("a.us") && (col("b.us") - col("a.us")) <= 60000000L)
      .groupBy(col("a.event_id").as("ia"))
      .agg(countDistinct(col("b.event_id")).as("n"))
    val bucketed = SparkEntry.queries("q22_range_join_neighbors")(spark, sf)
    val diff = bucketed.join(naive, Seq("ia"), "full_outer")
      .filter(col("n_next_minute").isNull || col("n").isNull ||
        col("n_next_minute") =!= col("n")).count()
    assert(diff == 0, s"bucketed range join diverges from naive in $diff rows")
  }

  test("rolling features: frame avg/max and lag delta match hand math") {
    val rows = SparkEntry.queries("q37_rolling_features")(spark, sf)
      .orderBy($"user_id", $"ts_s", $"event_id").collect()
    assert(rows.nonEmpty)
    // recompute per user with a plain scala fold over the same order
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val got = rs.sortBy(r => (r.getString(2), r.getLong(0)))
      // reconstruct values from delta_prev: v_i = delta_i + v_{i-1}, v_0 = delta_0
      val vals = got.scanLeft(0.0)((prev, r) => r.getDouble(5) + prev).tail
      got.zipWithIndex.foreach { case (r, i) =>
        val frame = vals.slice(math.max(0, i - 3), i + 1)
        assert(math.abs(r.getDouble(3) - frame.sum / frame.length) < 1e-3,
          s"roll_avg_4 at $i")
        assert(math.abs(r.getDouble(4) - frame.max) < 1e-3, s"roll_max_4 at $i")
      }
    }
  }

  test("custom variance UDAF matches built-in var_samp within fp tolerance") {
    val t = graft.sources.Tables(spark, sf)
    val builtin = t.orders.groupBy("o_orderstatus")
      .agg(var_samp(col("o_totalprice")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val custom = SparkEntry.queries("q23_custom_variance")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    builtin.foreach { case (k, v) =>
      assert(math.abs(custom(k) - v) / v < 1e-6, s"$k: ${custom(k)} vs $v")
    }
  }

  test("ohlc resample ≡ driver recompute at sf0.001") {
    val rows = SparkEntry.queries("q60_ohlc_resample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evs = graft.sources.Tables(spark, sf).events
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDay = evs.groupBy(_._1)
    assert(rows.length == byDay.size)
    rows.foreach { r =>
      val day = r.getString(0)
      val es = byDay(day).sortBy(e => (e._2, e._3))
      assert(r.getLong(1) == es.head._4, s"$day open")
      assert(r.getLong(2) == es.map(_._4).max, s"$day high")
      assert(r.getLong(3) == es.map(_._4).min, s"$day low")
      assert(r.getLong(4) == es.last._4, s"$day close")
      assert(r.getLong(5) == es.length.toLong, s"$day volume")
    }
  }

  test("twap: exact integer recompute per user") {
    val ev = graft.sources.Tables(spark, sf).events
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        round($"value" * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      val spans = sorted.zip(sorted.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      if (spans.isEmpty) None
      else {
        val dur = spans.map(_._2).sum
        val num = spans.map(s => s._1 * s._2).sum
        Some(u -> ((spans.length.toLong, dur, (num.toDouble / dur.toDouble) / 100.0)))
      }
    }
    val rows = SparkEntry.queries("q65_twap")(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, dur, twap) = want(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == dur, s"user ${r.getLong(0)}")
      assert(r.getDouble(3) == twap, s"user ${r.getLong(0)} twap") // bit-exact
    }
  }

  test("linear interpolation ≡ driver recompute; exact at on-grid samples") {
    val H = 3600000000L
    val t = graft.sources.Tables(spark, sf)
    val ev = t.events.filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // latest-write-wins per (user, us), then piecewise-linear over spans
    val want = ev.groupBy(_._1).flatMap { case (u, rs) =>
      val dedup = rs.groupBy(_._3).map { case (us, dups) =>
        us -> dups.maxBy(_._2)._4
      }.toSeq.sortBy(_._1)
      dedup.zip(dedup.tail).flatMap { case ((t0, c0), (t1, c1)) =>
        val gLo = (t0 + H - 1) / H
        val gHi = (t1 - 1) / H
        (gLo to gHi).map { g =>
          (u, g) -> ((c0.toDouble + (c1 - c0).toDouble *
            ((g * H - t0).toDouble / (t1 - t0).toDouble)) / 100.0)
        }
      }
    }
    val got = SparkEntry.queries("q70_interp_linear")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size == want.size, s"${got.size} grid points vs ${want.size}")
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"grid point $k") // bit-exact: same IEEE op chain
    }
    // half-open boundary: a grid point exactly AT a sample time takes
    // that sample's value (frac = 0 in the span it starts)
    val onGrid = ev.groupBy(e => (e._1, e._3)).map { case ((u, us), dups) =>
      (u, us, dups.maxBy(_._2)._4)
    }.filter(e => e._2 % H == 0)
    onGrid.foreach { case (u, us, c) =>
      got.get((u, us / H)).foreach { v =>
        assert(v == c.toDouble / 100.0, s"on-grid sample ($u, $us)")
      }
    }
  }

  test("PIT backfill: strictly-prior trailing window, no same-instant leakage") {
    import graft.operators.Temporal.PitWindowDays
    val t = graft.sources.Tables(spark, sf)
    val ev = t.events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
    val byUser = ev.groupBy(_._2)
    val horizon = PitWindowDays * 86400L * 1000000L
    val rows = SparkEntry.queries("feat_pit_backfill")(spark, sf).collect()
    val purchases = ev.count(_._3 == "purchase")
    assert(rows.length == purchases, "one feature row per purchase")
    rows.foreach { r =>
      val (eid, uid) = (r.getLong(0), r.getLong(1))
      val me = ev.find(_._1 == eid).get
      // frame is [us - 7d, us - 1]: strictly prior, never the label row
      val frame = byUser(uid).filter(e =>
        e._4 >= me._4 - horizon && e._4 < me._4)
      assert(r.getLong(3) == frame.count(_._3 == "view"), s"views for $eid")
      assert(r.getLong(4) == frame.count(_._3 == "click"), s"clicks for $eid")
      assert(r.getLong(5) == frame.filter(_._3 == "purchase").map(_._5).sum,
        s"spend for $eid")
    }
  }

  test("range-interval window equals a per-row trailing-30d recompute") {
    import graft.operators.Temporal.RangeWindowDays
    val orders = graft.sources.Tables(spark, sf).orders
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("sec"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byCust = orders.groupBy(_._1)
    val rows = SparkEntry.queries("q76_range_window")(spark, sf).collect()
    assert(rows.length == orders.length)
    rows.foreach { r =>
      val (cust, okey) = (r.getLong(0), r.getLong(1))
      val me = orders.find(o => o._1 == cust && o._2 == okey).get
      val inFrame = byCust(cust).filter(o =>
        o._3 >= me._3 - RangeWindowDays * 86400L && o._3 <= me._3)
      assert(r.getLong(3) == inFrame.length, s"count for order $okey")
      val cents = inFrame.map(o => BigDecimal(o._4).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      assert(r.getDouble(4) == cents, s"spend for order $okey")
    }
  }
}
