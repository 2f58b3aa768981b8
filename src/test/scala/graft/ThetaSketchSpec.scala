package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ThetaSketch

class ThetaSketchSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def relErr(est: Long, exact: Long): Double =
    math.abs(est - exact).toDouble / math.max(exact, 1L)

  test("below k the sketch is exact; above k the estimate stays within 5%") {
    val sk = new ThetaSketch(1024)
    val rnd = new java.util.Random(7)
    // 500 distinct values, each seen 3 times: exact mode
    val small = Array.fill(500)(rnd.nextLong())
    (0 until 3).foreach(_ => small.foreach(sk.update))
    assert(sk.estimate() == 500L)
    // push to 100k distinct: estimation mode
    val big = Array.fill(99500)(rnd.nextLong())
    big.foreach(sk.update)
    val err = relErr(sk.estimate(), 100000L)
    assert(err <= 0.05, s"estimate ${sk.estimate()} err $err > 0.05")
  }

  test("union has set semantics: overlap is not double-counted") {
    val rnd = new java.util.Random(13)
    val shared = Array.fill(30000)(rnd.nextLong())
    val onlyA = Array.fill(20000)(rnd.nextLong())
    val onlyB = Array.fill(10000)(rnd.nextLong())
    val a = new ThetaSketch(1024)
    val b = new ThetaSketch(1024)
    (shared ++ onlyA).foreach(a.update)
    (shared ++ onlyB).foreach(b.update)
    // round-trip through bytes — the exact path the union aggregate takes
    val u = ThetaSketch.deserialize(a.serialize())
    u.merge(ThetaSketch.deserialize(b.serialize()))
    val err = relErr(u.estimate(), 60000L)
    assert(err <= 0.07, s"union estimate ${u.estimate()} err $err > 0.07")
    // a naive sum would be 90k — assert the union is far from it
    assert(u.estimate() < 70000L, "union double-counted the overlap")
  }

  test("distributed build + rollup union matches exact distinct on groups") {
    // 40k rows, ids overlap across groups (id space 0..9999 shared)
    val df = (0 until 40000)
      .map(i => (s"g${i % 4}", (i * 2654435761L) % 10000))
      .toDF("g", "id").repartition(16)
    val perGroup = df.groupBy($"g").agg(
      ThetaSketch.sketchAgg($"id", k = 4096).as("sk"),
      ThetaSketch.distinctAgg($"id", k = 4096).as("est"),
      countDistinct($"id").as("exact"))
    perGroup.collect().foreach { r =>
      val (est, exact) = (r.getLong(2), r.getLong(3))
      assert(relErr(est, exact) <= 0.05, s"group ${r.getString(0)}: $est vs $exact")
    }
    val unionEst = perGroup.agg(ThetaSketch.unionAgg($"sk")).head.getLong(0)
    val unionExact = df.select(countDistinct($"id")).head.getLong(0)
    assert(relErr(unionEst, unionExact) <= 0.05,
      s"union $unionEst vs exact $unionExact")
  }

  test("nulls are skipped like COUNT(DISTINCT); empty input estimates 0") {
    val df = Seq(Some(1L), None, Some(2L), Some(1L), None).toDF("id")
    val est = df.agg(ThetaSketch.distinctAgg($"id")).head.getLong(0)
    assert(est == 2L)
    val empty = df.filter($"id" > 100L)
      .agg(ThetaSketch.distinctAgg($"id")).head.getLong(0)
    assert(empty == 0L)
  }

  test("intersection: exact below k, within 10% when saturated, identity on equal sets") {
    val rnd = new java.util.Random(29)
    // exact regime
    val shared = Array.fill(500)(rnd.nextLong())
    val a = new ThetaSketch(4096); val b = new ThetaSketch(4096)
    (shared ++ Array.fill(300)(rnd.nextLong())).foreach(a.update)
    (shared ++ Array.fill(200)(rnd.nextLong())).foreach(b.update)
    assert(a.intersectEstimate(b) == 500L, "below k the intersection is exact")
    // saturated regime
    val bigShared = Array.fill(40000)(rnd.nextLong())
    val a2 = new ThetaSketch(4096); val b2 = new ThetaSketch(4096)
    (bigShared ++ Array.fill(20000)(rnd.nextLong())).foreach(a2.update)
    (bigShared ++ Array.fill(30000)(rnd.nextLong())).foreach(b2.update)
    val est = a2.intersectEstimate(b2)
    assert(relErr(est, 40000L) <= 0.10, s"saturated intersect $est vs 40000")
    // identical saturated sets: intersection == union == cardinality
    val c = ThetaSketch.deserialize(a2.serialize())
    assert(relErr(a2.intersectEstimate(c), a2.estimate()) == 0.0)
  }

  test("q42 registered query gates hold at sf0.001") {
    val rows = SparkEntry.queries("q42_theta_intersect")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3),
      s"overlap_ok false for ${r.getString(0)}/${r.getString(1)}"))
  }

  test("q38 registered query gates hold at sf0.001") {
    val rows = SparkEntry.queries("q38_theta_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"sketch_ok false for ${r.getString(0)}")
      assert(r.getBoolean(4), s"union_ok false for ${r.getString(0)}")
    }
  }
}
