package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("funnel: depth counts stages in strict temporal order") {
    val rows = SparkEntry.queries("q46_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tv, tc, tp, depth) =
        (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
      // each later stage requires the earlier one
      if (tc != null) assert(tv != null, "click stage without view stage")
      if (tp != null) assert(tc != null, "purchase stage without click stage")
      val want = Seq(tv, tc, tp).count(_ != null)
      assert(depth == want)
      // strict ordering of the stage timestamps (string-sortable format)
      if (tc != null) assert(tv < tc)
      if (tp != null) assert(tc < tp)
    }
  }

  test("cohort retention: offset-0 cell covers every cohort member") {
    val rows = SparkEntry.queries("q47_cohort_retention")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (day, rs) =>
      val zero = rs.filter(_.getLong(1) == 0L)
      assert(zero.length == 1, s"cohort $day missing its offset-0 cell")
      val day0 = zero.head.getLong(2)
      rs.foreach { r =>
        assert(r.getLong(2) <= day0,
          s"cohort $day offset ${r.getLong(1)}: retention above cohort size")
        assert(r.getLong(1) >= 0L)
      }
    }
  }

  test("anomaly flags agree with a double-precision z-score on planted data") {
    // one wild outlier in a tight cluster: must be flagged; the
    // cluster must not be. The cluster needs enough members: in a
    // sample of n, no point can sit beyond (n−1)/√n population SDs,
    // so tiny groups (n ≤ 5) can never flag at the 2σ threshold.
    val cluster = (1L to 15L).map(i => (i, 1L, 100L, 10.0 + (i % 5) * 0.05))
    val df = (cluster :+ ((16L, 1L, 100L, 500.00)))
      .toDF("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
    val cents = round($"l_extendedprice" * 100).cast("long")
    val li = df.select($"l_orderkey", $"l_linenumber", $"l_partkey", cents.as("cents"))
    val stats = li.groupBy($"l_partkey")
      .agg(count(lit(1)).as("n_part"), sum($"cents").as("s"),
        sum($"cents" * $"cents").as("q"))
    val out = li.join(stats, Seq("l_partkey"))
      .withColumn("dev", $"n_part" * $"cents" - $"s")
      .withColumn("flag",
        $"dev" * $"dev" > lit(4L) * ($"n_part" * $"q" - $"s" * $"s"))
      .select($"l_orderkey", $"flag").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(16L), "the 500.00 outlier must be flagged")
    (1L to 15L).foreach(k => assert(!out(k), s"row $k wrongly flagged"))
  }

  test("anomaly query: flag matches the algebraic definition at sf0.001") {
    val rows = SparkEntry.queries("q48_anomaly_exact")(spark, sf).collect()
    assert(rows.nonEmpty)
    // single-member parts can never be anomalous (dev = 0, var = 0)
    rows.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getLong(4) == 0L && !r.getBoolean(5))
    }
  }

  test("stats profile: exact-moment corr/slope agree with Spark's built-ins") {
    val t = graft.sources.Tables(spark, sf)
    val got = SparkEntry.queries("q51_stats_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    val ref = t.lineitem.groupBy($"l_returnflag")
      .agg(corr($"l_quantity", $"l_extendedprice").as("c"),
        (covar_pop($"l_quantity", $"l_extendedprice") / var_pop($"l_quantity")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (flag, (c, b)) =>
      assert(math.abs(c - ref(flag)._1) < 1e-6, s"$flag corr: $c vs ${ref(flag)._1}")
      // slope is in cents/cents == price-units/qty-units: same scale
      assert(math.abs(b - ref(flag)._2) < 1e-4, s"$flag slope: $b vs ${ref(flag)._2}")
      // the synthetic generator draws qty and price independently —
      // the check is exactness vs the built-ins, not a sign claim
      assert(math.abs(c) < 1.0 && !c.isNaN)
    }
  }

  test("column profile: counts agree with direct aggregation") {
    val t = graft.sources.Tables(spark, sf)
    val rows = SparkEntry.queries("q52_column_profile")(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice"))
    val nRows = t.orders.count()
    rows.foreach { r =>
      assert(r.getLong(1) == nRows)
      assert(r.getLong(2) == 0L, "no nulls in the synthetic tables")
      assert(r.getLong(3) > 0L && r.getLong(3) <= nRows)
      assert(r.getString(4) <= r.getString(5) || r.getString(0) == "o_custkey",
        s"${r.getString(0)}: min_s > max_s") // custkey strings sort lexically
    }
  }

  test("k-fold CV: folds partition the sample; gates hold") {
    // sf0.01: folds are above the gate's 500-row activation floor,
    // so this exercises the REAL accuracy gate, not the vacuous branch
    val rows = SparkEntry.queries("ml_cv_kfold")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 3)
    val total = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == total, "train+test must cover the sample")
      assert(r.getBoolean(3), s"fold ${r.getLong(0)}: acc gate failed")
    }
  }

  test("scd2: per-customer intervals tile without overlap; one current row") {
    val rows = SparkEntry.queries("q49_scd2_versions")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (cust, rs) =>
      assert(rs.count(_.getBoolean(5)) == 1, s"cust $cust: exactly one current")
      // sorted by valid_from, each valid_to equals or precedes the
      // successor's valid_from (equal dates legal: same-day orders)
      val sorted = rs.sortBy(r => (r.getString(3), r.getLong(1)))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // each version closes exactly where the next one opens
          assert(a.getString(4) == b.getString(3),
            s"cust $cust: interval chain broken (${a.getString(4)} vs ${b.getString(3)})")
        case _ => ()
      }
      assert(sorted.last.getString(4) == "9999-12-31 00:00:00")
    }
  }

  test("sessionized funnel ≡ driver-side sessionize+funnel oracle at sf0.001") {
    val rows = SparkEntry.queries("q56_sessionized_funnel")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent oracle: collect the raw events, sessionize and
    // compute funnel depths imperatively
    val gapUs = 30L * 60L * 1000000L
    val evs = graft.sources.Tables(spark, sf).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (user, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[(Long, String)]())
      var prevUs = Long.MinValue
      sorted.foreach { case (_, _, typ, us) =>
        if (prevUs != Long.MinValue && us - prevUs > gapUs)
          sessions += scala.collection.mutable.ArrayBuffer[(Long, String)]()
        sessions.last += ((us, typ))
        prevUs = us
      }
      sessions.zipWithIndex.map { case (s, i) =>
        val tView = s.collectFirst { case (us, "view") => us }
        val tClick = tView.flatMap(tv =>
          s.collectFirst { case (us, "click") if us > tv => us })
        val tPurch = tClick.flatMap(tc =>
          s.collectFirst { case (us, "purchase") if us > tc => us })
        ((user, (i + 1).toLong),
          (s.size.toLong, Seq(tView, tClick, tPurch).count(_.isDefined).toLong))
      }
    }.toMap
    assert(rows.length == expected.size, "session count mismatch")
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (nEvents, depth) = expected(key)
      assert(r.getLong(2) == nEvents, s"$key: n_events")
      assert(r.getLong(4) == depth, s"$key: funnel_depth")
    }
  }

  test("dq constraints: clean tables pass; planted violations fail precisely") {
    import spark.implicits._
    // clean corpus: all six constraints green
    val clean = SparkEntry.queries("q55_dq_constraints")(spark, sf).collect()
    assert(clean.length == 6)
    clean.foreach(r => assert(r.getBoolean(2), s"${r.getString(0)} failed on sf0.001"))
    // planted corpus: null custkey, duplicate orderkey, an orphan
    // lineitem, an out-of-range discount, a bad status, a zero quantity
    val tmp = java.nio.file.Files.createTempDirectory("graft_dq").toString
    Seq(
      (Some(1L), 100L, "F", 10.0), (None, 101L, "O", 11.0),
      (Some(3L), 101L, "X", 12.0)
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice")
      .write.parquet(s"$tmp/orders.parquet")
    Seq(
      (100L, 0.05, 5.0), (101L, 0.5, 3.0), (999L, 0.02, 0.0)
    ).toDF("l_orderkey", "l_discount", "l_quantity")
      .write.parquet(s"$tmp/lineitem.parquet")
    val planted = SparkEntry.queries("q55_dq_constraints")(spark, tmp)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(!planted("completeness:o_custkey")._2)
    assert(math.abs(planted("completeness:o_custkey")._1 - 2.0 / 3.0) < 1e-12)
    assert(!planted("uniqueness:o_orderkey")._2)
    assert(!planted("fk:lineitem.l_orderkey->orders")._2)
    assert(planted("fk:lineitem.l_orderkey->orders")._1 == 1.0) // one orphan
    assert(!planted("range:l_discount[0,0.1]")._2)
    assert(!planted("accepted:o_orderstatus{F,O,P}")._2)
    assert(!planted("positive:l_quantity>0")._2)
  }

  test("winsorize ≡ driver sort-and-clip recompute at sf0.001") {
    val rows = SparkEntry.queries("q59_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables(spark, sf).lineitem
      .select(col("l_returnflag"), round(col("l_extendedprice") * 100)
        .cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byFlag = li.groupBy(_._1)
    rows.foreach { r =>
      val flag = r.getString(0)
      val cents = byFlag(flag).map(_._2).sorted
      val n = cents.length
      val p01 = cents(math.ceil(n * 0.01).toInt - 1)
      val p99 = cents(math.ceil(n * 0.99).toInt - 1)
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(2) == p01, s"$flag p01")
      assert(r.getLong(3) == p99, s"$flag p99")
      assert(r.getLong(4) == cents.count(_ < p01).toLong, s"$flag low")
      assert(r.getLong(5) == cents.count(_ > p99).toLong, s"$flag high")
      assert(r.getLong(6) == cents.map(c => math.max(math.min(c, p99), p01)).sum,
        s"$flag winsorized sum")
    }
  }

  test("approx group-by sample: estimate formula exact; error sane at sf0.001") {
    val rows = SparkEntry.queries("q61_approx_groupby_sample")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byFlag = li.groupBy(_._1)
    rows.foreach { r =>
      val flag = r.getString(0)
      val exact = byFlag(flag).map(_._3).sum
      val est = byFlag(flag).filter(_._2 % 20 == 0).map(_._3).sum * 20L
      assert(r.getLong(2) == exact, s"$flag exact")
      assert(r.getLong(3) == est, s"$flag estimate")
      // 5% systematic sample on ~2k rows/flag: comfortably inside 25%
      assert(r.getDouble(4) < 0.25, s"$flag rel_err ${r.getDouble(4)}")
    }
  }

  test("periodic profile: modal hour is the user's argmax hour, min on ties") {
    val rows = SparkEntry.queries("q62_periodic_profile")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evs = graft.sources.Tables(spark, sf).events
      .select(col("user_id"), hour(col("ts")).cast("long").as("hod"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = evs.groupBy(_._1)
    rows.foreach { r =>
      val user = r.getLong(0)
      val counts = byUser(user).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val maxCnt = counts.values.max
      val modal = counts.filter(_._2 == maxCnt).keys.min
      assert(r.getLong(1) == byUser(user).length.toLong, s"$user n_events")
      assert(r.getLong(2) == counts.size.toLong, s"$user n_active_hours")
      assert(r.getLong(3) == modal, s"$user modal hour")
      assert(r.getDouble(4) == maxCnt.toDouble / byUser(user).length.toDouble,
        s"$user modal share")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 23L)
    }
  }

  test("ewma smoothing ≡ driver recompute at sf0.001") {
    val rows = SparkEntry.queries("q58_ewma_smoothing")(spark, sf).collect()
    assert(rows.nonEmpty)
    val evs = graft.sources.Tables(spark, sf).events
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      sorted.zipWithIndex.map { case ((_, eid, _, _), i) =>
        val window = sorted.slice(math.max(0, i - 7), i + 1).reverse
        val num = window.zipWithIndex.map { case ((_, _, c, _), j) =>
          c * (1L << (7 - j))
        }.sum
        val den = window.indices.map(j => 1L << (7 - j)).sum
        eid -> num.toDouble / den.toDouble
      }
    }.toMap
    rows.foreach { r =>
      val want = expected(r.getLong(1))
      assert(r.getDouble(3) == want, // bit-exact, no epsilon
        s"event ${r.getLong(1)}: ${r.getDouble(3)} vs $want")
    }
  }

  test("order streaks: brute-force recompute of islands per customer") {
    val days = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", to_date($"o_orderdate").as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val want = days.map { case (c, ds) =>
      val streaks = ds.foldLeft(List.empty[Long]) { (acc, d) =>
        acc match {
          case h :: t if ds.contains(d.minusDays(1)) => (h + 1) :: t
          case _ => 1L :: acc
        }
      }
      c -> ((ds.size.toLong, streaks.size.toLong, streaks.max))
    }
    val rows = SparkEntry.queries("q63_order_streaks")(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (n, k, m) = want(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == k && r.getLong(3) == m,
        s"customer ${r.getLong(0)}")
    }
  }

  test("target encoding: leave-one-out mean matches a direct recompute") {
    val raw = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def decSum(xs: Iterable[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val groups = raw.groupBy(_._2).map { case (g, rs) =>
      g -> ((decSum(rs.map(_._3)), rs.length.toLong))
    }
    val prior = decSum(raw.map(_._3)) / raw.length.toDouble
    val rows = SparkEntry.queries("q64_target_encoding")(spark, sf).collect()
    assert(rows.length == raw.length)
    val byKey = raw.map(r => r._1 -> r).toMap
    rows.foreach { r =>
      val (_, g, x) = byKey(r.getLong(0))
      val (sg, ng) = groups(g)
      val want = ((sg - x) + 10.0 * prior) / ((ng - 1).toDouble + 10.0)
      assert(r.getDouble(2) == want, s"order ${r.getLong(0)}") // bit-exact
    }
  }

  test("pareto frontier: exactly the non-dominated parts") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val want = parts.filter { case (k, p, sz) =>
      !parts.exists { case (k2, p2, sz2) =>
        k2 != k && p2 <= p && sz2 >= sz && (p2 < p || sz2 > sz)
      }
    }.map(_._1).toSet
    val got = SparkEntry.queries("q66_pareto_frontier")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("MAD outliers: brute-force recompute of median/MAD per flag") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", round($"l_extendedprice" * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def med1(xs: Seq[Long]): Long = { // type-1: value at ceil(n/2)
      val s = xs.sorted; s((math.ceil(s.size / 2.0) - 1).toInt)
    }
    val want = rows.groupBy(_._1).map { case (f, rs) =>
      val vs = rs.map(_._2).toSeq
      val m = med1(vs)
      val mad = med1(vs.map(v => math.abs(v - m)))
      f -> ((vs.size.toLong, m, mad, vs.count(v => math.abs(v - m) > 3 * mad).toLong))
    }
    val got = SparkEntry.queries("q68_mad_outliers")(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, m, mad, out) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == m &&
        r.getLong(3) == mad && r.getLong(4) == out, s"flag ${r.getString(0)}")
    }
  }

  test("welch t-test ≡ driver moment recompute; sign tracks the means") {
    val t = graft.sources.Tables(spark, sf)
    val groups = t.lineitem.filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (f, rs) => f -> rs.map(_._2) }
    def moments(cs: Array[Long]) = {
      val n = cs.length.toDouble
      val s = cs.sum.toDouble
      val q = cs.map(c => BigInt(c) * BigInt(c)).sum.toDouble
      (n, s, (q - s * s / n) / (n - 1.0))
    }
    val (n1, s1, v1) = moments(groups("R"))
    val (n2, s2, v2) = moments(groups("A"))
    val se1 = v1 / n1; val se2 = v2 / n2; val se = se1 + se2
    val wantT = (s1 / n1 - s2 / n2) / math.sqrt(se)
    val wantDf = se * se / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
    val r = SparkEntry.queries("q71_welch_ttest")(spark, sf).collect().head
    assert(r.getLong(0) == n1.toLong && r.getLong(1) == n2.toLong)
    assert(math.abs(r.getDouble(4) - wantT) < 1e-9, s"t ${r.getDouble(4)} vs $wantT")
    assert(math.abs(r.getDouble(5) - wantDf) < 1e-6, s"df ${r.getDouble(5)} vs $wantDf")
    assert((r.getDouble(4) > 0) == (r.getDouble(2) > r.getDouble(3)),
      "t sign must track mean difference")
    // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert(r.getDouble(5) >= math.min(n1, n2) - 1 - 1e-6 &&
      r.getDouble(5) <= n1 + n2 - 2 + 1e-6)
  }

  test("rfm segments: threshold scoring recomputed from raw quintiles") {
    val t = graft.sources.Tables(spark, sf)
    val rfm = t.orders
      .groupBy(col("o_custkey"))
      .agg(max(unix_date(col("o_orderdate").cast("date"))).cast("long").as("last_day"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // type-7 (linear-interpolation) quantile, the `percentile` agg's rule
    def q7(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      val rank = p * (s.length - 1)
      val lo = rank.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (s(lo + 1) - s(lo)) * (rank - lo)
    }
    def score(v: Double, xs: Array[Double]): Long =
      1L + Seq(0.2, 0.4, 0.6, 0.8).count(p => v > q7(xs, p))
    val rDim = rfm.map(_._2.toDouble); val fDim = rfm.map(_._3.toDouble)
    val mDim = rfm.map(_._4.toDouble)
    val want = rfm.groupBy(c =>
        (score(c._2.toDouble, rDim), score(c._3.toDouble, fDim),
          score(c._4.toDouble, mDim)))
      .map { case (k, cs) => k -> ((cs.length.toLong, cs.map(_._4).sum)) }
    val got = SparkEntry.queries("q73_rfm_segments")(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (n, cents) = want(k)
      assert(r.getLong(3) == n, s"segment $k count")
      assert(r.getDouble(4) == cents.toDouble / 100.0, s"segment $k revenue")
    }
  }

  test("PSI drift equals a local recompute, bit for bit") {
    import graft.operators.Analytics._
    val orders = graft.sources.Tables(spark, sf).orders
      .select(year(col("o_orderdate")), col("o_totalprice"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    def bucket(p: Double): Long =
      math.min(math.floor(p / PsiBinWidth), PsiBins - 1.0).toLong
    val byBucket = orders.groupBy(o => bucket(o._2))
    // full spine: empty bins still carry smoothed terms
    val counts = (0L until PsiBins).map { b =>
      val os = byBucket.getOrElse(b, Array.empty[(Int, Double)])
      b -> (os.count(_._1 < PsiPivotYear).toLong,
        os.count(_._1 >= PsiPivotYear).toLong)
    }.toMap
    val nr = counts.values.map(_._1).sum
    val nc = counts.values.map(_._2).sum
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = counts.map { case (b, (ref, cur)) =>
      val pc = (cur + 1).toDouble / (nc + PsiBins).toDouble
      val pr = (ref + 1).toDouble / (nr + PsiBins).toDouble
      b -> r6((pc - pr) * math.log(pc / pr))
    }
    val total = terms.values
      .map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    val rows = SparkEntry.queries("q75_psi_drift")(spark, sf).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert((r.getLong(1), r.getLong(2)) == counts(b), s"counts of bin $b")
      assert(r.getDouble(3) == terms(b), s"psi term of bin $b")
      assert(r.getDouble(4) == total, "psi total")
      assert(r.getBoolean(5) == (total >= PsiThreshold), "drift flag")
    }
  }

  test("attribution: both models conserve conversions and revenue") {
    val rows = SparkEntry.queries("q83_attribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (f, l) = rows.partition(_.getString(0) == "first_touch")
    assert(f.nonEmpty && l.nonEmpty)
    // the two models credit the SAME converting-session set, so
    // totals must agree exactly (revenue is decimal-exact per model)
    assert(f.map(_.getLong(2)).sum == l.map(_.getLong(2)).sum,
      "conversion totals differ across models")
    assert(math.abs(f.map(_.getDouble(3)).sum - l.map(_.getDouble(3)).sum) < 1e-6,
      "revenue totals differ across models")
    val channels = Set("view", "click", "signup", "error", "purchase", "direct")
    rows.foreach { r =>
      assert(channels.contains(r.getString(1)), s"unknown channel ${r.getString(1)}")
      assert(r.getLong(2) > 0 && r.getDouble(3) > 0.0)
    }
    // 'direct' can only appear under last-touch (purchase opens session)
    assert(!f.exists(_.getString(1) == "direct"))
  }

  test("survival KM life table: accounting identities and monotone risk set") {
    val rows = SparkEntry.queries("q92_survival_km")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    // subjects = customers with >= 1 order; every subject is counted
    // exactly once as an event or a censoring, but censor-only times
    // are folded into n_risk, so: max n_risk per segment <= subjects
    // and total d_events = customers with a second distinct order day
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", to_date($"o_orderdate").as("od")).distinct()
    val perCust = orders.groupBy($"o_custkey")
      .agg(countDistinct($"od").as("ndays")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val repeaters = perCust.count(_._2 >= 2L)
    assert(rows.map(_._4).sum == repeaters.toLong,
      "total events != customers with a second order day")
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val byT = rs.sortBy(_._2)
      // n_risk strictly positive, monotone non-increasing in t
      byT.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, s"$seg: n_risk not monotone")
        case _ =>
      }
      byT.foreach { case (_, _, n, d, c, hz) =>
        assert(d >= 1L && n >= d + c, s"$seg: risk set smaller than events")
        assert(hz > 0.0 && hz <= 1.0, s"$seg: hazard out of range")
      }
      // KM survival from the emitted hazards is a valid curve
      val surv = byT.scanLeft(1.0) { case (sAcc, (_, _, n, d, _, _)) =>
        sAcc * (1.0 - d.toDouble / n.toDouble)
      }.tail
      surv.foreach(v => assert(v >= 0.0 && v <= 1.0))
    }
  }

  test("ROC AUC equals brute-force concordant-pair counting") {
    val r = SparkEntry.queries("q93_roc_auc")(spark, sf).collect().head
    val (nPos, nNeg, auc, gini) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val cutoff = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val users = spark.read.parquet(s"$sf/events.parquet")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(sum(when($"ts" < lit(cutoff), 1L).otherwise(0L)).as("score"),
        sum(when($"ts" >= lit(cutoff), 1L).otherwise(0L)).as("post"))
      .collect()
      .map(r => (r.getLong(1), if (r.getLong(2) >= 8L) 1 else 0))
    // NOTE: users with zero purchase events are absent from this
    // recompute but present in the query's event-scan grouping with
    // score 0 / label 0 — fold them back in
    val allUsers = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id").distinct().count()
    val zeros = (allUsers - users.length).toInt
    val full = users ++ Seq.fill(zeros)((0L, 0))
    val pos = full.filter(_._2 == 1).map(_._1)
    val neg = full.filter(_._2 == 0).map(_._1)
    assert(nPos == pos.length.toLong && nNeg == neg.length.toLong)
    var num = 0.0
    for (p <- pos; n <- neg)
      num += (if (p > n) 1.0 else if (p == n) 0.5 else 0.0)
    val want = num / (pos.length.toDouble * neg.length.toDouble)
    assert(math.abs(auc - want) < 1e-12, s"auc $auc != pairwise $want")
    assert(math.abs(gini - (2.0 * auc - 1.0)) < 1e-15)
  }

  test("max drawdown equals a dense daily walk") {
    def cents(x: Double): Long =
      BigDecimal(x * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .select(year($"o_orderdate").cast("long").as("yr"),
        to_date($"o_orderdate").as("day"), $"o_totalprice")
      .collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString), cents(r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val want = daily.keys.groupBy(_._1).map { case (yr, ks) =>
      val series = ks.toSeq.sortBy(_._2).map(daily(_))
      var peak = Long.MinValue; var maxDd = Long.MinValue
      series.foreach { c => peak = math.max(peak, c); maxDd = math.max(maxDd, peak - c) }
      yr -> ((series.length.toLong, series.max, maxDd))
    }
    val got = SparkEntry.queries("q97_max_drawdown")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, "drawdown table differs from dense walk")
  }

  test("lorenz curve: monotone shares ending at 1; grouped gini in range") {
    val rows = SparkEntry.queries("q98_lorenz_gini")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      val byB = rs.sortBy(_._2)
      byB.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._6 <= b._6 && a._7 <= b._7, s"$seg: shares not monotone")
          // Lorenz convexity: sorted-ascending buckets mean the
          // revenue share always trails the population share
          assert(b._7 <= b._6 + 1e-9, s"$seg: L above the diagonal")
        case _ =>
      }
      assert(math.abs(byB.last._6 - 1.0) < 1e-9, s"$seg: pop share != 1")
      assert(math.abs(byB.last._7 - 1.0) < 1e-9, s"$seg: revenue share != 1")
      val gini = rs.head._8
      assert(rs.forall(_._8 == gini), s"$seg: gini differs across rows")
      assert(gini >= 0.0 && gini < 1.0, s"$seg: gini $gini out of range")
    }
  }

  test("PR curve: confusion counts exact per threshold, AP is the step integral") {
    val rows = SparkEntry.queries("q99_pr_curve")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(-_._1)
    assert(rows.nonEmpty)
    val posTotal = rows.head._2 + rows.head._4 // tp + fn constant
    rows.foreach { case (_, tp, fp, fn, p, r) =>
      assert(tp + fn == posTotal, "tp+fn must be the positive total")
      // emitted values are rounded to 6 decimals
      assert(math.abs(p - tp.toDouble / (tp + fp)) < 5e-7, "precision")
      assert(math.abs(r - tp.toDouble / posTotal) < 5e-7, "recall")
    }
    // recall monotone non-decreasing as the threshold drops;
    // the last (lowest) threshold captures everything
    rows.map(_._6).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12, "recall not monotone")
      case _ =>
    }
    assert(math.abs(rows.last._6 - 1.0) < 5e-7, "lowest threshold recall != 1")
    // AP from the emitted steps matches the replicated column
    val ap = rows.map { case (_, tp, fp, _, _, _) =>
      val p = tp.toDouble / (tp + fp); val r = tp.toDouble / posTotal
      (r, p)
    }.foldLeft((0.0, BigDecimal(0))) { case ((prevR, acc), (r, p)) =>
      (r, acc + BigDecimal((r - prevR) * p)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }._2.toDouble
    val gotAp = SparkEntry.queries("q99_pr_curve")(spark, sf)
      .select(col("avg_precision")).distinct().collect()
    assert(gotAp.length == 1, "AP must be one value replicated")
    assert(math.abs(gotAp.head.getDouble(0) - ap) < 1e-6,
      s"AP ${gotAp.head.getDouble(0)} != step integral $ap")
  }

  test("chi-square: marginals consistent, statistic matches recompute") {
    val rows = SparkEntry.queries("q96_chi_square")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    val nTot = rows.map(_._3).sum
    rows.groupBy(_._1).foreach { case (seg, rs) =>
      assert(rs.map(_._3).sum == rs.head._4, s"row marginal of $seg")
    }
    rows.groupBy(_._2).foreach { case (pri, rs) =>
      assert(rs.map(_._3).sum == rs.head._5, s"col marginal of $pri")
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val contribs = rows.map { case (_, _, obs, rt, ct, exp, contrib, _) =>
      val eRaw = (rt * ct).toDouble / nTot.toDouble
      assert(exp == r6(eRaw), "expected cell count")
      val want = r6((obs.toDouble - eRaw) * (obs.toDouble - eRaw) / eRaw)
      assert(contrib == want, "cell contribution")
      contrib
    }
    val total = contribs
      .map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble
    rows.foreach(r => assert(r._8 == total, "chi2 statistic"))
    assert(total >= 0.0)
  }

  test("q105 KS: integer-rational D matches a dense two-sample recompute") {
    val t = graft.sources.Tables(spark, sf)
    val seg = t.customer.select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labeled = t.orders.select(col("o_custkey"), col("o_totalprice"))
      .collect()
      .flatMap { r =>
        seg(r.getLong(0)) match {
          case "BUILDING"   => Some((r.getDouble(1), 1))
          case "AUTOMOBILE" => Some((r.getDouble(1), 0))
          case _            => None
        }
      }
    val n1 = labeled.count(_._2 == 1).toLong
    val n2 = labeled.count(_._2 == 0).toLong
    val grid = labeled.map(_._1).distinct.sorted
    val ds = grid.map { v =>
      val c1 = labeled.count(p => p._2 == 1 && p._1 <= v).toLong
      val c2 = labeled.count(p => p._2 == 0 && p._1 <= v).toLong
      (v, math.abs(c1 * n2 - c2 * n1))
    }
    val dNum = ds.map(_._2).max
    val ksAt = ds.filter(_._2 == dNum).map(_._1).min
    val r = SparkEntry.queries("q105_ks_test")(spark, sf).collect().head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2, "sample sizes")
    assert(r.getLong(2) == dNum, "integer D numerator")
    assert(r.getDouble(3) == dNum.toDouble / (n1 * n2).toDouble, "one division")
    assert(r.getDouble(4) == ksAt, "argmax value (min tie-break)")
  }

  test("q106 Benford: digit counts recomputed from decimal renders") {
    val prices = graft.sources.Tables(spark, sf).orders
      .select(col("o_totalprice")).collect().map(_.getDouble(0))
    val wantCounts = prices
      .map(p => BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = SparkEntry.queries("q106_benford")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val n = prices.length.toLong
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == wantCounts.getOrElse(d, 0L), s"obs of digit $d")
      assert(r.getLong(2) == n)
      assert(r.getDouble(3) == wantCounts.getOrElse(d, 0L).toDouble / n)
      assert(r.getDouble(5) == r.getDouble(3) - r.getDouble(4), s"excess of $d")
    }
    assert(rows.map(_.getLong(1)).sum == n, "digit counts partition the rows")
  }

  test("k-anonymity: cell sizes partition the corpus, flags follow k") {
    val t = graft.sources.Tables(spark, sf)
    val docs = t.documents.select(col("lang"), col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2) / operators.Analytics.AnonymityCharsBucket))
    val want = docs.groupBy(identity).map { case (k, vs) => k -> vs.length.toLong }
    val rows = SparkEntry.queries("q113_k_anonymity")(spark, sf).collect()
    val got = rows.map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
      (r.getLong(3), r.getBoolean(4))).toMap
    assert(got.keySet == want.keySet, "QI cell set")
    want.foreach { case (k, n) =>
      assert(got(k)._1 == n, s"cell size for $k")
      assert(got(k)._2 == (n < operators.Analytics.AnonymityK), s"flag for $k")
    }
    assert(rows.map(_.getLong(3)).sum == docs.length.toLong,
      "cells partition the corpus")
  }

  test("dow-hour heatmap: cells partition events, load ratio is the identity") {
    val t = graft.sources.Tables(spark, sf)
    val total = t.events.count()
    val rows = SparkEntry.queries("q114_dow_hour_heatmap")(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == total, "cells partition the events")
    rows.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 7, "ISO dow range")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23, "hour range")
      assert(r.getDouble(3) == (r.getLong(2) * 168L).toDouble / total.toDouble,
        "load identity")
    }
    // a month of events touches every weekday
    assert(rows.map(_.getLong(0)).distinct.length == 7, "all weekdays present")
  }

  test("corr matrix: exact-moment Pearson/covariance recompute") {
    val t = graft.sources.Tables(spark, sf)
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rowsIn = t.lineitem.select(cols.map(col): _*).collect()
      .map(r => cols.indices.map(i => BigDecimal(r.getDouble(i))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).toArray)
    val n = rowsIn.length.toDouble
    def mom(f: Array[BigDecimal] => BigDecimal): Double =
      rowsIn.map(f).sum.toDouble
    val want = cols.indices.combinations(2).map { case Seq(i, j) =>
      val (sx, sy) = (mom(_(i)), mom(_(j)))
      val (sx2, sy2) = (mom(r => r(i) * r(i)), mom(r => r(j) * r(j)))
      val sxy = mom(r => r(i) * r(j))
      val num = n * sxy - sx * sy
      (cols(i), cols(j)) -> (
        num / (math.sqrt(n * sx2 - sx * sx) * math.sqrt(n * sy2 - sy * sy)),
        num / (n * (n - 1.0)))
    }.toMap
    val got = SparkEntry.queries("q116_corr_matrix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet, "pair set")
    want.foreach { case (k, v) => assert(got(k) == v, s"corr/cov for $k") }
    // qty and price are generated independently: |corr| must be small
    assert(math.abs(got(("l_quantity", "l_extendedprice"))._1) < 0.2)
  }

  test("OLS trend: slope/intercept/r2 from exact moments") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.orders.select(col("o_orderdate").cast("timestamp"),
        col("o_totalprice")).collect()
      .groupBy(r => r.getTimestamp(0).getTime / 86400000L)
      .map { case (d, rs) => (BigInt(d), rs.map(r => BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum) }.toSeq
    val n = daily.length.toDouble
    val sx = daily.map(_._1).sum.toDouble
    val sx2 = daily.map(d => d._1 * d._1).sum.toDouble
    val sy = daily.map(_._2).sum.toDouble
    val sxy = daily.map(d => BigDecimal(d._1) * d._2).sum.toDouble
    val sy2 = daily.map(d => d._2 * d._2).sum.toDouble
    val num = n * sxy - sx * sy
    val denX = n * sx2 - sx * sx
    val denY = n * sy2 - sy * sy
    val r = SparkEntry.queries("q117_ols_trend")(spark, sf).collect().head
    assert(r.getLong(0) == daily.length.toLong, "day count")
    assert(r.getDouble(1) == num / denX, "slope")
    assert(r.getDouble(2) == (sy - (num / denX) * sx) / n, "intercept")
    assert(r.getDouble(3) == (num * num) / (denX * denY), "r2")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, "r2 range")
  }

  test("l-diversity: distinct-sensitive counts and flags match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val docs = t.documents.select(col("source"), col("n_chars"), col("lang"))
      .collect().map(r => ((r.getString(0),
        r.getLong(1) / operators.Analytics.AnonymityCharsBucket), r.getString(2)))
    val want = docs.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._2).distinct.length.toLong) }
    val rows = SparkEntry.queries("q120_l_diversity")(spark, sf).collect()
    val got = rows.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got.keySet == want.keySet, "cell set")
    want.foreach { case (k, (n, d)) =>
      assert(got(k)._1 == n && got(k)._2 == d, s"counts for $k")
      assert(got(k)._3 == (d < operators.Analytics.DiversityL), s"flag for $k")
    }
  }

  test("t-closeness: tvd matches dense rational recompute, flags exact") {
    val t = graft.sources.Tables(spark, sf)
    val docs = t.documents.select(col("source"), col("n_chars"), col("lang"))
      .collect().map(r => ((r.getString(0),
        r.getLong(1) / operators.Analytics.AnonymityCharsBucket), r.getString(2)))
    val n = docs.length.toLong
    val glob = docs.groupBy(_._2).map { case (l, vs) => l -> vs.length.toLong }
    val want = docs.groupBy(_._1).map { case (k, vs) =>
      val cellN = vs.length.toLong
      val byLang = vs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
      val num = glob.keys.map { l =>
        math.abs(byLang.getOrElse(l, 0L) * n - glob(l) * cellN)
      }.sum
      k -> (cellN, num, 2L * cellN * n)
    }
    val rows = SparkEntry.queries("q121_t_closeness")(spark, sf).collect()
    val got = rows.map(r => (r.getString(0), r.getLong(1)) ->
      (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got.keySet == want.keySet, "cell set")
    want.foreach { case (k, (cellN, num, den)) =>
      assert(got(k)._1 == cellN, s"group_n for $k")
      assert(got(k)._2 == num.toDouble / den.toDouble, s"tvd for $k")
      assert(got(k)._3 ==
        (num * operators.Analytics.ClosenessT5 > den), s"flag for $k")
      assert(got(k)._2 >= 0.0 && got(k)._2 <= 1.0, s"tvd range for $k")
    }
  }

  test("cusum changepoint: peak and breach count match dense walk") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.orders
      .select(year(col("o_orderdate")).as("yr"),
        to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getDate(1)))
      .map { case ((yr, d), rs) => (yr, d, rs.map(_.getLong(2)).sum) }
      .toSeq
    val want = daily.groupBy(_._1).map { case (yr, ds) =>
      val sorted = ds.sortBy(_._2.toString)
      val n = sorted.length.toLong
      val tot = sorted.map(_._3).sum
      var s = 0L
      val nums = sorted.zipWithIndex.map { case ((_, d, c), i) =>
        s += c; (d, math.abs(n * s - (i + 1).toLong * tot))
      }
      val maxAbs = nums.map(_._2).max
      val cpDay = nums.filter(_._2 == maxAbs).map(_._1.toString).min
      val breaches = nums.count { case (_, a) => a * 20L > n * tot }
      yr.toLong -> (n, tot, maxAbs.toDouble / n.toDouble, cpDay, breaches.toLong)
    }
    val rows = SparkEntry.queries("q122_cusum_changepoint")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == want.keySet, "year set")
    rows.foreach { r =>
      val (n, tot, mx, cp, br) = want(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == tot, s"totals yr ${r.getLong(0)}")
      assert(r.getDouble(3) == mx, s"peak cusum yr ${r.getLong(0)}")
      assert(r.getString(4) == cp, s"changepoint day yr ${r.getLong(0)}")
      assert(r.getLong(5) == br, s"breach count yr ${r.getLong(0)}")
    }
  }

  test("hhi concentration: dense BigInt recompute, bounds and CR-k") {
    val t = graft.sources.Tables(spark, sf)
    val seg = t.customer.select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perCust = t.orders
      .select(col("o_custkey"), round(col("o_totalprice") * 100)
        .cast("long").as("c"))
      .collect()
      .groupBy(r => (seg(r.getLong(0)), r.getLong(0)))
      .map { case ((sg, ck), rs) => (sg, ck, rs.map(_.getLong(1)).sum) }
      .toSeq
    val want = perCust.groupBy(_._1).map { case (sg, cs) =>
      val tot = cs.map(_._3).sum
      val sumSq = cs.map(c => BigInt(c._3) * BigInt(c._3)).sum
      val topk = cs.sortBy(c => (-c._3, c._2))
        .take(operators.Analytics.ConcentrationTopK).map(_._3).sum
      sg -> (cs.length.toLong, tot,
        BigDecimal(sumSq).toDouble / BigDecimal(BigInt(tot) * BigInt(tot)).toDouble,
        topk.toDouble / tot.toDouble)
    }
    val rows = SparkEntry.queries("q123_hhi_concentration")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "segment set")
    rows.foreach { r =>
      val (n, tot, hhi, crk) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == tot, s"totals ${r.getString(0)}")
      assert(r.getDouble(3) == hhi, s"hhi ${r.getString(0)}")
      assert(r.getDouble(4) == crk, s"cr-k ${r.getString(0)}")
      // 1/n ≤ HHI ≤ 1, CR-k within (0, 1]
      assert(hhi >= 1.0 / n && hhi <= 1.0, s"hhi bounds ${r.getString(0)}")
      assert(crk > 0.0 && crk <= 1.0, s"cr-k bounds ${r.getString(0)}")
    }
  }

  test("calibration bins: integer-grid recompute, Brier and rates exact") {
    import graft.ml.MLQueries.{CalibBins, CalibScale}
    val t = graft.sources.Tables(spark, sf)
    val perUser = t.events.select(col("user_id"), col("event_type"))
      .collect().groupBy(_.getLong(0)).map { case (_, rs) =>
        val tys = rs.map(_.getString(1))
        val v = tys.count(_ == "view").toLong
        val c = tys.count(_ == "click").toLong
        val y = if (tys.contains("purchase")) 1L else 0L
        val predQ = math.min(CalibScale * c / (v + 1), CalibScale)
        val bin = math.min(predQ / (CalibScale / CalibBins), CalibBins - 1)
        (bin, predQ, y)
      }.toSeq
    val want = perUser.groupBy(_._1).map { case (bin, us) =>
      val n = us.length.toLong
      val sumPred = us.map(_._2).sum
      val nPos = us.map(_._3).sum
      val sq = us.map(u => BigInt(u._2 - CalibScale * u._3).pow(2)).sum
      bin -> (n,
        sumPred.toDouble / BigDecimal(BigInt(n) * CalibScale).toDouble,
        nPos.toDouble / n.toDouble,
        BigDecimal(sq).toDouble /
          BigDecimal(BigInt(n) * CalibScale * CalibScale).toDouble)
    }
    val rows = SparkEntry.queries("ml_calibration_bins")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == want.keySet, "bin set")
    rows.foreach { r =>
      val (n, mp, or_, br) = want(r.getLong(0))
      assert(r.getLong(1) == n, s"n bin ${r.getLong(0)}")
      assert(r.getDouble(2) == mp, s"mean_pred bin ${r.getLong(0)}")
      assert(r.getDouble(3) == or_, s"obs_rate bin ${r.getLong(0)}")
      assert(r.getDouble(4) == br, s"brier bin ${r.getLong(0)}")
      assert(mp >= 0.0 && mp <= 1.0 && or_ >= 0.0 && or_ <= 1.0 &&
        br >= 0.0 && br <= 1.0, s"ranges bin ${r.getLong(0)}")
    }
  }

  test("median CI: order-statistic ranks match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val seg = t.customer.select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val perCust = t.orders
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(r => (seg(r.getLong(0)), r.getLong(0)))
      .map { case ((sg, ck), rs) => (sg, ck, rs.map(_.getLong(1)).sum) }
      .toSeq
    val want = perCust.groupBy(_._1).map { case (sg, cs) =>
      val sorted = cs.sortBy(c => (c._3, c._2)).map(_._3)
      val n = sorted.length.toLong
      val lo = math.max(1L,
        math.floor((n.toDouble - 1.96 * math.sqrt(n.toDouble)) / 2.0).toLong)
      val hi = math.min(n,
        math.ceil(1.0 + (n.toDouble + 1.96 * math.sqrt(n.toDouble)) / 2.0)
          .toLong)
      val med = sorted(((n + 1) / 2 - 1).toInt).toDouble / 2.0 +
        sorted((n / 2 + 1 - 1).toInt).toDouble / 2.0
      sg -> (n, med, sorted((lo - 1).toInt), sorted((hi - 1).toInt))
    }
    val rows = SparkEntry.queries("q125_median_ci")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "segment set")
    rows.foreach { r =>
      val (n, med, lo, hi) = want(r.getString(0))
      assert(r.getLong(1) == n, s"n ${r.getString(0)}")
      assert(r.getDouble(2) == med, s"median ${r.getString(0)}")
      assert(r.getLong(3) == lo && r.getLong(4) == hi, s"ci ${r.getString(0)}")
      assert(lo <= med && med <= hi, s"bracket ${r.getString(0)}")
    }
  }

  test("two-proportion z-test: fixed IEEE chain matches dense recompute") {
    val rows = SparkEntry.queries("q126_ab_proportions")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val orders = graft.sources.Tables(spark, sf).orders
      .select(col("o_orderpriority"), col("o_orderstatus")).collect()
    val n1 = orders.count(_.getString(0) == "1-URGENT").toLong
    val s1 = orders.count(x => x.getString(0) == "1-URGENT" &&
      x.getString(1) == "F").toLong
    val n2 = orders.length - n1
    val s2 = orders.count(x => x.getString(0) != "1-URGENT" &&
      x.getString(1) == "F").toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n1, s1, n2, s2)), "cells")
    val p1 = s1.toDouble / n1; val p2 = s2.toDouble / n2
    val pp = (s1 + s2).toDouble / (n1 + n2)
    val z = (p1 - p2) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(r.getDouble(4) == p1 && r.getDouble(5) == p2, "rates")
    assert(r.getDouble(6) == z, "z")
    assert(r.getBoolean(7) == (math.abs(z) > 1.96), "flag")
  }

  test("m4 downsample: per-bucket witnesses match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.orders
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getDate(0).toString)
      .map { case (d, rs) => d -> rs.map(_.getLong(1)).sum }.toSeq
    def ed(d: String): Long =
      java.time.LocalDate.parse(d).toEpochDay
    val mn = daily.map(x => ed(x._1)).min
    val mx = daily.map(x => ed(x._1)).max
    val byBucket = daily.groupBy(x =>
      (ed(x._1) - mn) * operators.Analytics.M4Buckets / (mx - mn + 1))
    val rows = SparkEntry.queries("q127_m4_downsample")(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == byBucket.keySet, "bucket set")
    rows.foreach { r =>
      val ds = byBucket(r.getLong(0))
      assert(r.getLong(1) == ds.size.toLong, s"n_days b${r.getLong(0)}")
      val first = ds.minBy(x => ed(x._1))
      val last = ds.maxBy(x => ed(x._1))
      val lo = ds.minBy(x => (x._2, ed(x._1)))
      val hi = ds.minBy(x => (-x._2, ed(x._1)))
      assert((r.getString(2), r.getLong(3)) == first, s"first b${r.getLong(0)}")
      assert((r.getString(4), r.getLong(5)) == last, s"last b${r.getLong(0)}")
      assert((r.getString(6), r.getLong(7)) == lo, s"min b${r.getLong(0)}")
      assert((r.getString(8), r.getLong(9)) == hi, s"max b${r.getLong(0)}")
      // the rendered polyline invariants
      assert(lo._2 <= first._2 && lo._2 <= last._2 && hi._2 >= first._2 &&
        hi._2 >= last._2, s"envelope b${r.getLong(0)}")
    }
  }

  test("capped running sum: sequential fold matches dense walk") {
    val t = graft.sources.Tables(spark, sf)
    val seg = t.customer.select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val daily = t.orders
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(r => (seg(r.getLong(0)), r.getDate(1).toString))
      .map { case ((sg, d), rs) => (sg, d, rs.map(_.getLong(2)).sum) }.toSeq
    val want = daily.groupBy(_._1).map { case (sg, ds) =>
      val sorted = ds.sortBy(_._2).map(_._3)
      val burn = sorted.sum / sorted.length
      var bal = 0L; var mx = 0L; var hits = 0L
      sorted.foreach { c =>
        val raw = bal + c - burn
        bal = if (raw < 0L) { hits += 1; 0L } else raw
        if (bal > mx) mx = bal
      }
      sg -> (sorted.length.toLong, burn, bal, mx, hits)
    }
    val rows = SparkEntry.queries("q128_capped_running_sum")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "segment set")
    rows.foreach { r =>
      val (n, burn, bal, mx, hits) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == burn, s"shape ${r.getString(0)}")
      assert(r.getLong(3) == bal, s"final ${r.getString(0)}")
      assert(r.getLong(4) == mx, s"max ${r.getString(0)}")
      assert(r.getLong(5) == hits, s"floor hits ${r.getString(0)}")
    }
    // the clamp must actually engage somewhere at this SF
    assert(want.values.exists(_._5 > 0L), "no floor hits — burn miscalibrated")
  }

  test("cohort LTV curve: cumulative cents and identities") {
    val rows = SparkEntry.queries("q129_cohort_ltv_curve")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getString(0))
    byCohort.foreach { case (cm, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) == 0L, s"cohort $cm missing age 0")
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getLong(3)
        assert(r.getLong(4) == cum, s"cum mismatch $cm age ${r.getLong(1)}")
        assert(r.getDouble(6) ==
          cum.toDouble / r.getLong(5).toDouble, s"ltv $cm age ${r.getLong(1)}")
        assert(r.getLong(2) <= r.getLong(5), s"active ≤ size $cm")
      }
      // age-0 actives = cohort size (every member orders in month 0)
      assert(sorted.head.getLong(2) == sorted.head.getLong(5),
        s"cohort $cm age-0 coverage")
    }
  }

  test("growth accounting: classes match dense recompute, identities hold") {
    val t = graft.sources.Tables(spark, sf)
    val act = t.orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCust = act.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val first = byCust.view.mapValues(_.min).toMap
    val months = act.map(_._2).distinct.sorted
    val want = months.map { m =>
      val actives = byCust.filter(_._2.contains(m)).keys.toSeq
      val nNew = actives.count(c => first(c) == m).toLong
      val nRet = actives.count(c => first(c) != m && byCust(c)(m - 1)).toLong
      val nRes = actives.count(c => first(c) != m && !byCust(c)(m - 1)).toLong
      val prevActive = byCust.count(_._2.contains(m - 1)).toLong
      val churn = prevActive - actives.count(c => byCust(c)(m - 1)).toLong
      f"${(m - 1) / 12}%04d-${(m - 1) % 12 + 1}%02d" ->
        (actives.length.toLong, nNew, nRet, nRes, churn)
    }.toMap
    val rows = SparkEntry.queries("q130_growth_accounting")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "month set")
    rows.foreach { r =>
      val (a, nw, re, rs, ch) = want(r.getString(0))
      assert(r.getLong(1) == a && r.getLong(2) == nw && r.getLong(3) == re &&
        r.getLong(4) == rs, s"classes ${r.getString(0)}")
      assert(r.getLong(5) == ch, s"churn ${r.getString(0)}")
      assert(a == nw + re + rs, s"identity ${r.getString(0)}")
    }
  }

  test("DiD: four-cell means and the estimate match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val seg = t.customer.select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = t.orders
      .select(col("o_custkey"), col("o_totalprice"),
        (col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
          .as("post"))
      .collect()
      .groupBy(r => (seg(r.getLong(0)) == "BUILDING", r.getBoolean(2)))
      .view.mapValues { rs =>
        val s0 = rs.map(r => BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (rs.length.toLong, s0.toDouble)
      }.toMap
    def m(tr: Boolean, po: Boolean) = cells((tr, po))._2 / cells((tr, po))._1
    val did = (m(true, true) - m(true, false)) - (m(false, true) - m(false, false))
    val r = SparkEntry.queries("q131_did_effect")(spark, sf).collect().head
    assert(r.getLong(0) == cells((true, false))._1 &&
      r.getLong(1) == cells((true, true))._1 &&
      r.getLong(2) == cells((false, false))._1 &&
      r.getLong(3) == cells((false, true))._1, "cell counts")
    assert(r.getDouble(4) == m(true, false) && r.getDouble(5) == m(true, true),
      "treated means")
    assert(r.getDouble(6) == m(false, false) && r.getDouble(7) == m(false, true),
      "control means")
    assert(r.getDouble(8) == did, "did")
  }

  test("PVM bridge: effects match dense recompute and sum to delta") {
    val t = graft.sources.Tables(spark, sf)
    val brand = t.part.select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = t.lineitem
      .select(col("l_partkey"), col("l_extendedprice"),
        col("l_quantity").cast("long").as("q"),
        year(col("l_shipdate")).as("y"))
      .collect()
      .filter(r => r.getInt(3) == 1996 || r.getInt(3) == 1997)
      .groupBy(r => (brand(r.getLong(0)), r.getInt(3)))
      .view.mapValues { rs =>
        val rev = rs.map(r => BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum
        (rev.toDouble, rs.map(_.getLong(2)).sum)
      }.toMap
    val rows = SparkEntry.queries("q132_pvm_bridge")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getString(0)
      val (r96, q96) = cells((b, 1996)); val (r97, q97) = cells((b, 1997))
      assert(r.getDouble(1) == r96 && r.getLong(2) == q96, s"1996 $b")
      assert(r.getDouble(3) == r97 && r.getLong(4) == q97, s"1997 $b")
      val pe = (r97 / q97 - r96 / q96) * q97
      val ve = (r96 / q96) * (q97 - q96)
      assert(r.getDouble(5) == pe, s"price effect $b")
      assert(r.getDouble(6) == ve, s"volume effect $b")
      // the bridge identity (floating form, loose tolerance)
      assert(math.abs((pe + ve) - (r97 - r96)) < 1e-4 * math.abs(r97),
        s"bridge identity $b")
    }
  }

  test("ABC classification: cumulative classes match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val perPart = t.lineitem
      .select(col("l_partkey"), round(col("l_extendedprice") * 100)
        .cast("long").as("c"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => (k, rs.map(_.getLong(1)).sum) }.toSeq
    val total = perPart.map(_._2).sum
    var cum = 0L
    val classed = perPart.sortBy(p => (-p._2, p._1)).map { case (_, c) =>
      val before = cum
      cum += c
      val cls = if (before * 1000L < operators.Analytics.AbcCutA * total) "A"
        else if (before * 1000L < operators.Analytics.AbcCutB * total) "B"
        else "C"
      (cls, c)
    }
    val want = classed.groupBy(_._1).map { case (cls, cs) =>
      cls -> (cs.length.toLong, cs.map(_._2).sum) }
    val rows = SparkEntry.queries("q133_abc_classification")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "class set")
    rows.foreach { r =>
      val (n, c) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == c, s"class ${r.getString(0)}")
      assert(r.getDouble(3) == c.toDouble / total.toDouble,
        s"share ${r.getString(0)}")
    }
    // ranking invariant: mean revenue per part decreases A → B → C
    // (the synthetic distribution is near-uniform, so unlike real
    // catalogs A holds MOST parts — only the per-part ordering is
    // structural)
    def avg(cls: String) = want(cls)._2.toDouble / want(cls)._1
    assert(avg("A") >= avg("B") && avg("B") >= avg("C"), "rank ordering")
  }

  test("max concurrency: daily peaks match a dense global sweep") {
    val gap = operators.Analytics.ConcurrencyGapMicros
    val t = graft.sources.Tables(spark, sf)
    val evs = t.events.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // dense sessionization
    val sessions = evs.groupBy(_._1).values.flatMap { us =>
      val sorted = us.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head; var last = sorted.head
      sorted.tail.foreach { u =>
        if (u - last > gap) { out += ((start, last)); start = u }
        last = u
      }
      out += ((start, last))
      out
    }.toSeq
    // dense GLOBAL sweep (no day decomposition — the independent path)
    val bounds = sessions.flatMap { case (s0, e0) =>
      Seq((s0, 1L), (e0 + 1L, -1L)) }
      .sortBy { case (u, d) => (u, -d) }
    var run = 0L
    val dayMax = scala.collection.mutable.Map.empty[String, Long]
    val dayStartRun = scala.collection.mutable.Map.empty[String, Long]
    bounds.foreach { case (u, d) =>
      val day = java.time.Instant.ofEpochSecond(u / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
      if (!dayStartRun.contains(day)) dayStartRun(day) = run
      run += d
      dayMax(day) = math.max(dayMax.getOrElse(day, Long.MinValue), run)
    }
    val want = dayMax.map { case (day, mx) =>
      day -> math.max(dayStartRun(day), mx) }
    val rows = SparkEntry.queries("q134_max_concurrency")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "day set")
    rows.foreach { r =>
      assert(r.getLong(4) == want(r.getString(0)),
        s"peak ${r.getString(0)}")
      assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L)
    }
    // global conservation: starts == ends over the whole timeline
    assert(rows.map(_.getLong(1)).sum == rows.map(_.getLong(2)).sum,
      "boundary conservation")
  }

  test("rolling correlation: trailing-window moments match dense walk") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.events.select(to_date(col("ts")).as("d"), col("event_type"))
      .collect().groupBy(_.getDate(0).toString)
      .map { case (d, rs) =>
        (d, rs.count(_.getString(1) == "view").toLong,
          rs.count(_.getString(1) == "purchase").toLong) }
      .toSeq.sortBy(_._1)
    val rows = SparkEntry.queries("q136_rolling_correlation")(spark, sf)
      .collect()
    assert(rows.map(_.getString(0)).toSeq == daily.map(_._1), "day spine")
    rows.zipWithIndex.foreach { case (r, i) =>
      val frame = daily.slice(math.max(0, i - operators.Analytics.RollCorrDays + 1),
        i + 1)
      val n = frame.length.toLong
      val sx = frame.map(_._2).sum; val sy = frame.map(_._3).sum
      val sxy = frame.map(f => f._2 * f._3).sum
      val sxx = frame.map(f => f._2 * f._2).sum
      val syy = frame.map(f => f._3 * f._3).sum
      val den = math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
        math.sqrt(n.toDouble * syy - sy.toDouble * sy)
      assert(r.getLong(3) == n, s"win_n day ${r.getString(0)}")
      if (den == 0.0) assert(r.isNullAt(4), s"null day ${r.getString(0)}")
      else {
        val want = (n.toDouble * sxy - sx.toDouble * sy) / den
        assert(r.getDouble(4) == want, s"corr day ${r.getString(0)}")
        assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-12,
          s"corr range ${r.getString(0)}")
      }
    }
  }

  test("histogram: equi-width buckets match dense recompute, dense spine") {
    val t = graft.sources.Tables(spark, sf)
    val cents = t.orders.select(round(col("o_totalprice") * 100)
      .cast("long")).collect().map(_.getLong(0))
    val mn = cents.min; val mx = cents.max
    val k = operators.Analytics.HistBuckets
    val want = cents.groupBy(c => (c - mn) * k / (mx - mn + 1))
      .view.mapValues(_.length.toLong).toMap
    val rows = SparkEntry.queries("q137_histogram")(spark, sf).collect()
    assert(rows.length == k.toInt, "dense spine")
    rows.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == mn + b * (mx - mn + 1) / k, s"edge b$b")
      assert(r.getLong(2) == want.getOrElse(b, 0L), s"count b$b")
    }
    assert(rows.map(_.getLong(2)).sum == cents.length.toLong, "mass")
  }

  test("weekday ANOVA: F from exact moments matches dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.orders
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getDate(0)).toSeq
      .map { case (d, rs) =>
        (d.toLocalDate.getDayOfWeek.getValue.toLong,
          rs.map(_.getLong(1)).sum) }
    val g = daily.groupBy(_._1).map { case (dow, cs) =>
      dow -> (cs.length.toLong, cs.map(_._2).sum,
        cs.map(c => BigInt(c._2) * BigInt(c._2)).sum) }
    val k = g.size.toLong
    val nTot = g.values.map(_._1).sum
    val sxTot = g.values.map(_._2).sum
    val sxxTot = BigDecimal(g.values.map(_._3).sum).toDouble
    val sumSqOverN = (1L to 7L).map { dw =>
      g.get(dw).map { case (n, sx, _) =>
        BigDecimal(BigInt(sx) * BigInt(sx)).toDouble / n.toDouble
      }.getOrElse(0.0)
    }.reduceLeft(_ + _)
    val msb = (sumSqOverN -
      BigDecimal(BigInt(sxTot) * BigInt(sxTot)).toDouble / nTot.toDouble) /
      (k - 1).toDouble
    val msw = (sxxTot - sumSqOverN) / (nTot - k).toDouble
    val r = SparkEntry.queries("q138_anova_weekday")(spark, sf)
      .collect().head
    assert(r.getLong(0) == k && r.getLong(1) == nTot, "shape")
    assert(r.getDouble(2) == msb, "msb")
    assert(r.getDouble(3) == msw, "msw")
    assert(r.getDouble(4) == msb / msw, "F")
    assert(msb >= 0.0 && msw > 0.0, "nonneg mean squares")
  }

  test("Mann-Kendall: S, tie-corrected variance, z match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.orders
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getDate(0).toString).toSeq
      .map { case (d, rs) => (d, rs.map(_.getLong(1)).sum) }
      .sortBy(_._1)
    val xs = daily.map(_._2)
    val n = xs.length.toLong
    var sStat = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length)
      sStat += java.lang.Long.signum(xs(j) - xs(i)).toLong
    val tieTerm = xs.groupBy(identity).values
      .map(g => { val tt = g.length.toLong; tt * (tt - 1) * (2 * tt + 5) })
      .sum
    val varNum = n * (n - 1) * (2 * n + 5) - tieTerm
    val z =
      if (sStat > 0) (sStat.toDouble - 1.0) / math.sqrt(varNum.toDouble / 18.0)
      else if (sStat < 0) (sStat.toDouble + 1.0) / math.sqrt(varNum.toDouble / 18.0)
      else 0.0
    val r = SparkEntry.queries("q139_mann_kendall")(spark, sf).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == sStat, "n and S")
    assert(r.getLong(2) == varNum, "variance numerator")
    assert(r.getDouble(3) == z, "z")
  }

  test("top movers: WoW deltas and top-k discipline match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val brand = t.part.select(col("p_partkey"), col("p_brand"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val weekly = t.lineitem
      .select(col("l_partkey"),
        date_format(date_trunc("week", col("l_shipdate")), "yyyy-MM-dd")
          .as("wk"),
        round(col("l_extendedprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(r => (brand(r.getLong(0)), r.getString(1))).toSeq
      .map { case ((b, w), rs) => (b, w, rs.map(_.getLong(2)).sum) }
    val deltas = weekly.groupBy(_._1).toSeq.flatMap { case (b, ws) =>
      val sorted = ws.sortBy(_._2)
      sorted.sliding(2).collect { case Seq((_, _, p), (_, w, c)) =>
        (b, w, p, c, c - p) }
    }
    val want = deltas
      .sortBy { case (b, w, _, _, d) => (-math.abs(d), b, w) }
      .take(operators.Analytics.TopMovers)
    val got = SparkEntry.queries("q140_top_movers")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, "mover list")
  }

  test("new vs repeat: monthly split matches dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val orders = t.orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val firstM = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = orders.groupBy(_._2).map { case (m, os) =>
      val isNew = os.partition(o => firstM(o._1) == m)
      f"${(m - 1) / 12}%04d-${(m - 1) % 12 + 1}%02d" ->
        (isNew._1.map(_._3).sum, isNew._2.map(_._3).sum,
          isNew._1.length.toLong, isNew._2.length.toLong)
    }
    val rows = SparkEntry.queries("q141_new_vs_repeat")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "month set")
    rows.foreach { r =>
      val (nc, rc, nn, nr) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((nc, rc, nn, nr)), s"split ${r.getString(0)}")
    }
    // every month's revenue is fully attributed
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum ==
      orders.map(_._3).sum, "revenue conservation")
  }

  test("rfm transition: quintile migration matches dense ntile recompute") {
    val cut = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
    val t = graft.sources.Tables(spark, sf)
    val orders = t.orders
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1), r.getLong(2)))
    def tiers(era: ((Long, java.time.LocalDateTime, Long)) => Boolean)
        : Map[Long, Long] = {
      val spend = orders.filter(era).groupBy(_._1)
        .view.mapValues(_.map(_._3).sum).toSeq
      val sorted = spend.sortBy { case (ck, s0) => (-s0, ck) }
      val n = sorted.length
      sorted.zipWithIndex.map { case ((ck, _), i) =>
        // ntile(5): first n%5 buckets hold n/5+1 rows
        val base = n / 5; val rem = n % 5
        val tier =
          if (i < rem * (base + 1)) i / (base + 1) + 1
          else (i - rem * (base + 1)) / base + rem + 1
        ck -> tier.toLong
      }.toMap
    }
    val t1 = tiers(_._2.isBefore(cut))
    val t2 = tiers(o => !o._2.isBefore(cut))
    val want = (t1.keySet ++ t2.keySet).toSeq
      .map(ck => (t1.getOrElse(ck, 0L), t2.getOrElse(ck, 0L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = SparkEntry.queries("q142_rfm_transition")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, "migration matrix")
    assert(got.keys.exists(_._1 == 0L) || got.keys.exists(_._2 == 0L),
      "some era-absent customers exist at this SF")
  }

  test("percentile bands: type-1 order statistics match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.orders
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getDate(0).toString).toSeq
      .map { case (d, rs) =>
        (java.time.LocalDate.parse(d).getDayOfWeek.getValue.toLong,
          rs.map(_.getLong(1)).sum) }
    val want = daily.groupBy(_._1).map { case (dow, cs) =>
      val sorted = cs.map(_._2).sorted
      val n = sorted.length.toLong
      def pick(q: Long) = sorted(((n * q + 99) / 100 - 1).toInt)
      dow -> (n, pick(25), pick(50), pick(75))
    }
    val rows = SparkEntry.queries("q144_percentile_bands")(spark, sf)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == want.keySet, "dow set")
    rows.foreach { r =>
      val (n, p25, p50, p75) = want(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((n, p25, p50, p75)), s"bands dow ${r.getLong(0)}")
      assert(p25 <= p50 && p50 <= p75, s"monotone dow ${r.getLong(0)}")
    }
  }

  test("dau/mau: stickiness matches dense recompute and stays in (0,1]") {
    val t = graft.sources.Tables(spark, sf)
    val ud = t.events
      .select(col("user_id"), to_date(col("ts")).as("day"),
        date_format(col("ts"), "yyyy-MM").as("m"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2)))
    val want = ud.groupBy(_._3).map { case (m, rs) =>
      val nDays = rs.map(_._2).distinct.length.toLong
      val sumDau = rs.length.toLong
      val mau = rs.map(_._1).distinct.length.toLong
      m -> (nDays, sumDau, mau,
        sumDau.toDouble / (nDays * mau).toDouble)
    }
    val rows = SparkEntry.queries("q145_dau_mau")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == want.keySet, "month set")
    rows.foreach { r =>
      val (nd, sd, ma, st) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nd, sd, ma)),
        s"counts ${r.getString(0)}")
      assert(r.getDouble(4) == st, s"stickiness ${r.getString(0)}")
      assert(st > 0.0 && st <= 1.0, s"range ${r.getString(0)}")
    }
  }

  test("seasonal adjust: dow effect removal matches dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val daily = t.orders
      .select(to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect()
      .groupBy(_.getDate(0).toString).toSeq
      .map { case (d, rs) => (d, rs.map(_.getLong(1)).sum) }
    val byDow = daily.groupBy(d =>
      java.time.LocalDate.parse(d._1).getDayOfWeek.getValue.toLong)
    val dowMean = byDow.view.mapValues(ds =>
      ds.map(_._2).sum.toDouble / ds.length.toDouble).toMap
    val globMean = daily.map(_._2).sum.toDouble / daily.length.toDouble
    val rows = SparkEntry.queries("q146_seasonal_adjust")(spark, sf)
      .collect()
    assert(rows.length == daily.length, "day spine")
    rows.foreach { r =>
      val dow = java.time.LocalDate.parse(r.getString(0))
        .getDayOfWeek.getValue.toLong
      assert(r.getLong(1) == dow, s"dow ${r.getString(0)}")
      assert(r.getDouble(3) == dowMean(dow), s"dow mean ${r.getString(0)}")
      assert(r.getDouble(4) ==
        r.getLong(2).toDouble - dowMean(dow) + globMean,
        s"adjusted ${r.getString(0)}")
    }
    // adjustment preserves the global mean (up to float noise)
    val adjMean = rows.map(_.getDouble(4)).sum / rows.length
    assert(math.abs(adjMean - globMean) < 1e-6 * globMean, "mean preserved")
  }
}
