package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

object TestSession {
  /** 4 cores keeps the suite cheap; `GRAFT_TEST_CPUS=32` reruns any
    * spec at the driver's parallelism (GateInvarianceSpec's negative
    * reproduction of the r8 flake needs the real defaultParallelism —
    * scan bytes-per-core and task-slot count aren't emulatable from a
    * 4-core context via conf alone).
    */
  lazy val spark: SparkSession = GraftSession.local(
    cores = sys.env.getOrElse("GRAFT_TEST_CPUS", "4").toInt,
    appName = "graft-test")
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("q40 sliding distinct: window >= day, sketch union inside gate") {
    val rows = SparkEntry.queries("q40_sliding_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: 7d distinct below the day's distinct")
      assert(r.getBoolean(3), s"${r.getString(0)}: sketch union outside gate")
    }
  }

  test("q43 quantile bins: 10 per flag, near-equal sizes, ordered ranges") {
    val rows = SparkEntry.queries("q43_quantile_binning")(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (flag, bins) =>
      assert(bins.length == 10, s"$flag: ${bins.length} bins")
      val ns = bins.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$flag: ntile sizes differ by >1: ${ns.toSeq}")
      val sorted = bins.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(3) ||
               a.getDouble(4) == b.getDouble(3) || a.getDouble(4) <= b.getDouble(4),
          s"$flag: bin ranges out of order")
      }
    }
  }

  test("text_unigram_lm: log-probs negative, doc of common tokens outscores rare") {
    val rows = SparkEntry.queries("text_unigram_lm")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getDouble(3) < 0.0, s"doc ${r.getLong(0)}: avg_logp must be < 0")
      // sum consistency: avg * n within rounding slack of sum
      assert(math.abs(r.getDouble(2) - r.getDouble(3) * r.getLong(1)) <=
        0.000001 * r.getLong(1) + 1e-9)
    }
  }

  test("q01 aggregates are consistent") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf)
    val total = df.select(sum("count_order")).first().getLong(0)
    val expected = graft.sources.Tables(spark, sf).lineitem
      .filter(col("l_shipdate") <= lit("2000-12-31 00:00:00").cast("timestamp"))
      .count()
    assert(total == expected, s"expected $expected counted, got $total")
  }

  test("q12 set ops partition the rich-customer set") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q12_set_ops")(spark, sf)
    val byOp = df.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = graft.sources.Tables(spark, sf)
    val rich = t.customer.filter(col("c_acctbal") > 5000).select("c_custkey").distinct().count()
    assert(byOp.getOrElse("intersect", 0L) + byOp.getOrElse("except", 0L) == rich)
  }

  test("q07 emits at most 3 rows per order") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q07_window_topk_per_order")(spark, sf)
    val over = df.groupBy("l_orderkey").count().filter(col("count") > 3).count()
    assert(over == 0)
  }

  test("q29 grouping sets: per-flag rows sum to the grand total") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q29_grouping_sets")(spark, sf).collect()
    val grand = df.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    val perFlag = df.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(perFlag.map(_.getLong(2)).sum == grand.head.getLong(2),
      "per-returnflag counts must sum to the () grouping set's total")
    val perPair = df.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(perPair.map(_.getLong(2)).sum == grand.head.getLong(2))
  }

  test("q30 approx_count_distinct lands within 5% of exact (HLL++ bound)") {
    val rows = Relational.approxDistinctDetail(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
    // the registered (oracle-checkable) form must report approx_ok
    val summary = SparkEntry.queries("q30_approx_distinct")(spark, sf).collect()
    assert(summary.nonEmpty && summary.forall(_.getBoolean(2)))
  }

  test("q33 approx percentiles track exact within 1% relative error") {
    val rows = Relational.approxPercentileDetail(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      for ((a, e) <- Seq((1, 2), (3, 4))) {
        val approx = r.getDouble(a)
        val exact = r.getDouble(e)
        assert(math.abs(approx - exact) / exact <= 0.01,
          s"flag ${r.getString(0)}: approx $approx vs exact $exact")
      }
    }
    // registered form: exact percentiles + rank-bounded approx_ok
    val summary = SparkEntry.queries("q33_approx_percentile")(spark, sf).collect()
    assert(summary.nonEmpty && summary.forall(_.getBoolean(3)))
  }

  test("text_training_set selects canonical English docs above the quality floor") {
    import org.apache.spark.sql.functions._
    val sel = SparkEntry.queries("text_training_set")(spark, sf)
    val selIds = sel.collect().map(_.getLong(0)).toSet
    assert(selIds.nonEmpty)
    // subset of exact-dedup canonical ids
    val canon = SparkEntry.queries("dedup_exact")(spark, sf)
      .select("canonical_doc_id").collect().map(_.getLong(0)).toSet
    assert(selIds.subsetOf(canon), "selected docs must be dedup-canonical")
    // every selected doc meets the floors
    val bad = sel.filter(col("quality") < 0.5 || col("n_tokens") < 30).count()
    assert(bad == 0)
  }

  test("q57 top-k pushdown ≡ naive join-then-aggregate; dims join broadcast") {
    import TestSession.spark.implicits._
    val df = SparkEntry.queries("q57_topk_join_pushdown")(spark, sf)
    // the candidate frame is 10 rows, so BOTH dimension joins must be
    // broadcast — no shuffle of customer/nation
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dim joins must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no shuffled dim join")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    // naive plan: join everything first, aggregate last
    val t = graft.sources.Tables(spark, sf)
    val naive = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("o_custkey"), col("c_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("rev").desc, col("o_custkey"))
      .limit(10)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4),
          r.getDecimal(3).doubleValue))
    assert(got.toSeq == naive.toSeq, "pushdown changed the answer")
  }

  test("full-outer reconciliation: classes partition both ledgers exactly") {
    val t = graft.sources.Tables(spark, sf)
    val cutoff = lit("1997-07-01").cast("timestamp")
    val nHeaders = t.orders.filter(col("o_orderdate") < cutoff).count()
    val nDetails = t.lineitem.filter(col("l_shipdate") < cutoff)
      .select(col("l_orderkey")).distinct().count()
    val rows = SparkEntry.queries("q72_reconcile_full_outer")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    def n(c: String) = rows.get(c).map(_._1).getOrElse(0L)
    assert(n("matched") + n("header_only") == nHeaders,
      "matched + header_only must cover the header ledger")
    assert(n("matched") + n("detail_only") == nDetails,
      "matched + detail_only must cover the detail ledger")
    // exclusive classes carry zero from the absent side, so their
    // abs_diff equals the present side's total
    rows.get("header_only").foreach { case (_, ht, dt, ad) =>
      assert(dt == 0.0 && ad == ht)
    }
    rows.get("detail_only").foreach { case (_, ht, dt, ad) =>
      assert(ht == 0.0 && ad == dt)
    }
  }

  test("schema evolution: pre-drift rows are exactly the v1 batch") {
    val t = graft.sources.Tables(spark, sf)
    val nEven = t.orders.filter(col("o_orderkey") % 2 === 0).count()
    val nAll = t.orders.count()
    val rows = SparkEntry.queries("q74_schema_evolution")(spark, sf).collect()
    val pre = rows.filter(_.getString(0) == "<pre-drift>")
    assert(pre.length == 1 && pre.head.getLong(1) == nEven,
      "v1 rows must all surface with NULL drift column")
    assert(rows.map(_.getLong(1)).sum == nAll,
      "merged read must cover every order exactly once")
    assert(rows.length > 1, "v2 rows must group by their real priority")
  }

  test("Q17-shape small-quantity revenue equals a local recompute") {
    val li = graft.sources.Tables(spark, sf).lineitem
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    def d2(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val bar = li.groupBy(_._1).map { case (pk, rs) =>
      pk -> (rs.map(r => d2(r._2)).sum.toDouble / rs.length) * 0.2
    }
    val small = li.filter(r => r._2 < bar(r._1))
    val row = SparkEntry.queries("q77_small_qty_revenue")(spark, sf).collect().head
    assert(row.getLong(0) == small.length, "small-line count")
    assert(row.getDouble(1) ==
      small.map(r => d2(r._3)).sum.toDouble / 7.0, "avg yearly revenue")
  }

  test("Q11-shape important parts: exactly the above-threshold groups") {
    val t = graft.sources.Tables(spark, sf)
    def d(x: Double, s: Int = 2): BigDecimal =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val suppNation = t.supplier
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vals = t.lineitem
      .select(col("l_suppkey"), col("l_partkey"), col("l_extendedprice"),
        col("l_discount")).collect()
      .map(r => ((suppNation(r.getLong(0)), r.getLong(1)),
        d(r.getDouble(2)) * (BigDecimal(1).setScale(2) - d(r.getDouble(3)))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nationTot = vals.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val want = vals.filter { case ((n, _), v) => v * 1000 > nationTot(n) }
    val got = SparkEntry.queries("q94_important_parts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet, "kept (nation, part) set differs")
    got.foreach { case (k, v) => assert(v == want(k).toDouble, s"value of $k") }
  }

  test("Q22-shape dormant customers: threshold + anti-join recompute") {
    val t = graft.sources.Tables(spark, sf)
    def d2(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val cust = t.customer
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val posBals = cust.filter(_._3 > 0.0)
    val thr = posBals.map(r => d2(r._3)).sum.toDouble / posBals.length
    val cutoff = java.sql.Timestamp.valueOf("2000-01-01 00:00:00")
    val recent = t.orders.filter(col("o_orderdate") >= lit(cutoff))
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val keep = cust.filter(c => c._3 > thr && !recent.contains(c._1))
    val want = keep.groupBy(_._2).view.mapValues { rs =>
      (rs.length.toLong, rs.map(r => d2(r._3)).sum.toDouble)
    }.toMap
    val got = SparkEntry.queries("q95_dormant_customers")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want, "dormant-customer rollup differs from recompute")
  }

  test("spend percentile: percent_rank and cume_dist match dense recompute") {
    val t = graft.sources.Tables(spark, sf)
    val spend = t.orders.select(col("o_custkey"), col("o_totalprice")).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum).toMap
    val seg = t.customer.select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q115_spend_percentile")(spark, sf).collect()
    val bySeg = rows.groupBy(_.getString(1))
    bySeg.foreach { case (_, rs) =>
      val n = rs.length
      val sorted = rs.map(r => spend(r.getLong(0))).sorted
      rs.foreach { r =>
        val sp = spend(r.getLong(0))
        assert(r.getString(1) == seg(r.getLong(0)), "segment join")
        assert(r.getDouble(2) == sp.toDouble, "spend render")
        val below = sorted.count(_ < sp)
        val leq = sorted.count(_ <= sp)
        val pr = if (n == 1) 0.0 else below.toDouble / (n - 1).toDouble
        assert(r.getDouble(3) == pr, s"percent_rank of ${r.getLong(0)}")
        assert(r.getDouble(4) == leq.toDouble / n.toDouble,
          s"cume_dist of ${r.getLong(0)}")
      }
    }
    assert(rows.length == spend.keySet.count(seg.contains), "one row per buyer")
  }
}
