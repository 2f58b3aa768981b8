package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("hand-built case: picks latest earlier row per key, null when none") {
    val probe = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"), (3L, 50L, "d")
    ).toDF("k", "t", "tag")
    val ref = Seq(
      (1L, 90L, 9.0), (1L, 150L, 15.0), (1L, 300L, 30.0), (2L, 100L, 10.0)
    ).toDF("rk", "rt", "v")
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt")
      .select($"tag", $"rt", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("a") == ((90L, 9.0)))   // latest ref <= 100 is 90
    assert(out("b") == ((150L, 15.0))) // latest ref <= 200 is 150
    assert(out("c") == ((100L, 10.0))) // key 2
    assert(out("d") == null)           // key 3 has no ref rows
  }

  test("equal timestamps are inclusive (<=)") {
    val probe = Seq((1L, 100L)).toDF("k", "t")
    val ref = Seq((1L, 100L, 1.0)).toDF("rk", "rt", "v")
    val r = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt").collect().head
    assert(!r.isNullAt(3) && r.getDouble(4) == 1.0)
  }

  test("native exec appears in the physical plan") {
    val t = graft.sources.Tables(spark, sf)
    val clicks = t.events.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = t.events.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pt"))
    val df = AsOf.join(clicks, purchases, Seq("user_id"), Seq("pu"), "ts", "pt")
    assert(df.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
      .contains("AsOfJoin"))
    assert(df.count() == clicks.count(), "left-outer: every probe row survives")
    // the exec participates in whole-stage codegen: after execution
    // the final plan shows a codegen span (*(n)) over the as-of node
    df.collect()
    val planStr = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) AsOfJoin""".r.findFirstIn(planStr).isDefined,
      s"AsOfJoin not inside a WholeStageCodegen span:\n$planStr")
  }

  test("codegen and interpreted paths agree") {
    val probe = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"), (3L, 50L, "d")
    ).toDF("k", "t", "tag")
    val ref = Seq(
      (1L, 90L, 9.0), (1L, 150L, 15.0), (1L, 300L, 30.0), (2L, 100L, 10.0)
    ).toDF("rk", "rt", "v")
    def run(): Set[Seq[Any]] =
      AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt")
        .collect().map(_.toSeq.toVector: Seq[Any]).toSet
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == withCodegen)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("matches the window-trick formulation on the real corpus") {
    val t = graft.sources.Tables(spark, sf)
    val native = SparkEntry.queries("q27_asof_join_native")(spark, sf)
      .collect().map(_.toSeq).toSet
    // union+window equivalent: tag purchases, last purchase ts per user
    val ev = t.events
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val trick = ev
      .withColumn("p_ts", last(when($"event_type" === "purchase", $"ts"), true).over(w))
      .withColumn("p_value", last(when($"event_type" === "purchase", $"value"), true).over(w))
      .filter($"event_type" === "click")
      .select($"event_id", $"user_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        date_format($"p_ts", "yyyy-MM-dd HH:mm:ss").as("last_purchase_ts_s"),
        $"p_value".as("last_purchase_value"))
      .collect().map(_.toSeq).toSet
    assert(native == trick,
      s"native vs window-trick diff: ${(native -- trick).take(2)} / ${(trick -- native).take(2)}")
  }

  test("inner joinType drops unmatched probe rows") {
    val probe = Seq(
      (1L, 100L, "a"), (2L, 150L, "c"), (3L, 50L, "d")
    ).toDF("k", "t", "tag")
    val ref = Seq((1L, 90L, 9.0), (2L, 100L, 10.0)).toDF("rk", "rt", "v")
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt", joinType = "inner")
      .select($"tag", $"v").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("a" -> 9.0, "c" -> 10.0), s"got $out")
  }

  test("tolerance rejects matches older than leftTime - tolerance (merge_asof parity)") {
    val probe = Seq((1L, 100L, "a"), (1L, 500L, "b")).toDF("k", "t", "tag")
    val ref = Seq((1L, 90L, 9.0)).toDF("rk", "rt", "v")
    // tag a: gap 10 <= 50 matches; tag b: gap 410 > 50 rejected
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
        tolerance = Some(50.0))
      .select($"tag", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("a") == 9.0)
    assert(out("b") == null)
    // inner + tolerance drops the stale row entirely
    val inner = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
        joinType = "inner", tolerance = Some(50.0))
      .select($"tag").collect().map(_.getString(0)).toSeq
    assert(inner == Seq("a"))
  }

  test("tolerance on a non-numeric time column fails at plan time, not per-row") {
    val probe = Seq((1L, "2024-01-01", "a")).toDF("k", "t", "tag")
    val ref = Seq((1L, "2023-12-31", 9.0)).toDF("rk", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt", tolerance = Some(50.0))
    }
    assert(e.getMessage.contains("tolerance/nearest requires a numeric"))
    // nearest needs distance arithmetic, so it hits the same gate
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
        direction = "nearest")
    }
    assert(e2.getMessage.contains("tolerance/nearest requires a numeric"))
    // without tolerance the string time column is fine (ordering-only)
    val ok = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt").collect().head
    assert(ok.getDouble(5) == 9.0)
  }

  test("null keys and null times never match (SQL null-equality semantics)") {
    val probe = Seq(
      (Some(1L), Some(100L), "ok"),
      (None, Some(100L), "nullkey"),
      (Some(1L), None, "nulltime")
    ).toDF("k", "t", "tag")
    val ref = Seq(
      (Some(1L), Some(90L), 9.0),
      (None, Some(80L), 8.0),       // null right key: skipped
      (Some(1L), None, 7.0)         // null right time: skipped
    ).toDF("rk", "rt", "v")
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt")
      .select($"tag", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out("ok") == 9.0, "real rows still match (null right rows skipped, no NPE)")
    assert(out("nullkey") == null)
    assert(out("nulltime") == null)
    // inner drops the null-key/time probes
    val inner = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt", joinType = "inner")
      .select($"tag").collect().map(_.getString(0)).toSeq
    assert(inner == Seq("ok"))
  }

  test("survives multi-partition inputs (distribution + ordering honored)") {
    val probe = (0 until 1000).map(i => ((i % 7).toLong, i.toLong * 10))
      .toDF("k", "t").repartition(8)
    val ref = (0 until 300).map(i => ((i % 7).toLong, i.toLong * 33, i.toDouble))
      .toDF("rk", "rt", "v").repartition(5)
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() == 1000)
    // spot-check one row against a driver-side computation
    // (probe row i=101: k = 101%7 = 3, t = 1010)
    val sample = out.filter($"k" === 3 && $"t" === 1010).collect().head
    val expected = (0 until 300).filter(i => i % 7 == 3 && i * 33 <= 1010)
      .map(_ * 33L).maxOption
    expected match {
      case Some(e) => assert(sample.getLong(3) == e)
      case None    => assert(sample.isNullAt(3))
    }
  }

  test("forward direction picks the earliest row at/after the probe") {
    val probe = Seq(
      (1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"), (3L, 50L, "d")
    ).toDF("k", "t", "tag")
    val ref = Seq(
      (1L, 90L, 9.0), (1L, 150L, 15.0), (1L, 300L, 30.0), (2L, 100L, 10.0)
    ).toDF("rk", "rt", "v")
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
        direction = "forward")
      .select($"tag", $"rt", $"v").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("a") == ((150L, 15.0))) // earliest ref >= 100 is 150
    assert(out("b") == ((300L, 30.0))) // earliest ref >= 200 is 300
    assert(out("c") == null)           // key 2 has nothing at/after 150
    assert(out("d") == null)           // key 3 has no ref rows
  }

  test("forward: equal timestamps are inclusive, same row can serve many probes") {
    val probe = Seq((1L, 100L, "x"), (1L, 100L, "y"), (1L, 80L, "z"))
      .toDF("k", "t", "tag")
    val ref = Seq((1L, 100L, 1.0)).toDF("rk", "rt", "v")
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
        direction = "forward")
      .select($"tag", $"v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("x") == 1.0 && out("y") == 1.0 && out("z") == 1.0,
      "parked head must serve every earlier/equal probe")
  }

  test("forward tolerance rejects matches beyond rightTime - leftTime") {
    val probe = Seq((1L, 100L)).toDF("k", "t")
    val ref = Seq((1L, 180L, 1.0)).toDF("rk", "rt", "v")
    val hit = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
      tolerance = Some(100.0), direction = "forward").collect().head
    assert(!hit.isNullAt(3), "within tolerance")
    val miss = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
      tolerance = Some(50.0), direction = "forward").collect().head
    assert(miss.isNullAt(3), "beyond tolerance")
  }

  test("nearest picks the smaller |dt|, ties resolve backward") {
    val probe = Seq(
      (1L, 100L, "near_back"),  // back 90 (d10) vs fwd 150 (d50) -> 90
      (1L, 130L, "near_fwd"),   // back 90 (d40) vs fwd 150 (d20) -> 150
      (1L, 120L, "tie"),        // back 90 (d30) vs fwd 150 (d30) -> 90
      (2L, 500L, "only_back"),  // only 100 before
      (3L, 10L, "only_fwd")     // only 40 after
    ).toDF("k", "t", "tag")
    val ref = Seq(
      (1L, 90L, 9.0), (1L, 150L, 15.0), (2L, 100L, 10.0), (3L, 40L, 4.0)
    ).toDF("rk", "rt", "v")
    val out = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
        direction = "nearest")
      .select($"tag", $"rt").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(out("near_back") == 90L)
    assert(out("near_fwd") == 150L)
    assert(out("tie") == 90L, "equal distance must resolve backward")
    assert(out("only_back") == 100L)
    assert(out("only_fwd") == 40L)
  }

  test("nearest tolerance filters each side independently") {
    val probe = Seq((1L, 100L)).toDF("k", "t")
    val ref = Seq((1L, 10L, 1.0), (1L, 140L, 2.0)).toDF("rk", "rt", "v")
    // back is 90 away, fwd is 40 away; tol 50 kills back, keeps fwd
    val r = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
      tolerance = Some(50.0), direction = "nearest").collect().head
    assert(r.getLong(3) == 140L && r.getDouble(4) == 2.0)
    // tol 20 kills both
    val none = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
      tolerance = Some(20.0), direction = "nearest").collect().head
    assert(none.isNullAt(3))
  }

  test("null-time right rows are skipped, never crash the candidate walk") {
    // a right row with null time sorts first (NULLS FIRST) — it must
    // never be stored as the backward candidate or parked as the
    // forward candidate under any direction/tolerance combination
    val probe = Seq((1L, 100L, "p")).toDF("k", "t", "tag")
    val ref = Seq(
      (1L, Option.empty[Long], -1.0), (1L, Some(90L), 9.0), (1L, Some(150L), 15.0)
    ).toDF("rk", "rt", "v")
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(1000.0))) {
      val r = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
        tolerance = tol, direction = dir).select($"rt").collect().head
      val expected = if (dir == "forward") 150L else 90L
      assert(!r.isNullAt(0) && r.getLong(0) == expected, s"dir=$dir tol=$tol")
    }
    // only null-time rows on the right: probes survive unmatched
    val onlyNull = Seq((1L, Option.empty[Long], -1.0)).toDF("rk", "rt", "v")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val r = AsOf.join(probe, onlyNull, Seq("k"), Seq("rk"), "t", "rt",
        tolerance = Some(10.0), direction = dir).select($"rt").collect().head
      assert(r.isNullAt(0), s"dir=$dir must not match a null-time row")
    }
  }

  test("integral tolerance compare is exact past 2^53") {
    // distance 2^53+1 vs tolerance 2^53: the double path rounds the
    // distance DOWN to 2^53 and accepts; the exact path must reject
    val twoTo53 = 9007199254740992L
    val probe = Seq((1L, twoTo53 + 1L)).toDF("k", "t")
    val ref = Seq((1L, 0L, 1.0)).toDF("rk", "rt", "v")
    val miss = AsOf.join(probe, ref, Seq("k"), Seq("rk"), "t", "rt",
      tolerance = Some(twoTo53.toDouble)).collect().head
    assert(miss.isNullAt(3), "distance 2^53+1 must exceed tolerance 2^53")
    val probe2 = Seq((1L, twoTo53)).toDF("k", "t")
    val hit = AsOf.join(probe2, ref, Seq("k"), Seq("rk"), "t", "rt",
      tolerance = Some(twoTo53.toDouble)).collect().head
    assert(!hit.isNullAt(3), "distance exactly at tolerance must match")
  }

  test("forward/nearest agree with a window recompute on the real corpus") {
    val t = graft.sources.Tables(spark, sf)
    val p = t.events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("us"))
    val e = t.events.filter($"event_type" === "error")
      .groupBy($"user_id".as("eu"), unix_micros($"ts").as("eus"))
      .agg(max($"event_id").as("eid"))
    val errByUser = e.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val fwd = AsOf.join(p, e, Seq("user_id"), Seq("eu"), "us", "eus",
        direction = "forward")
      .select($"event_id", $"us", $"user_id", $"eus").collect()
    fwd.foreach { r =>
      val want = errByUser.getOrElse(r.getLong(2), Seq.empty)
        .find(_ >= r.getLong(1))
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got == want, s"forward for event ${r.getLong(0)}")
    }
    val near = AsOf.join(p, e, Seq("user_id"), Seq("eu"), "us", "eus",
        direction = "nearest")
      .select($"event_id", $"us", $"user_id", $"eus").collect()
    near.foreach { r =>
      val cands = errByUser.getOrElse(r.getLong(2), Seq.empty)
      val want = if (cands.isEmpty) None
        else Some(cands.minBy(c =>
          (math.abs(c - r.getLong(1)), if (c <= r.getLong(1)) 0 else 1)))
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got == want, s"nearest for event ${r.getLong(0)}")
    }
  }
}
