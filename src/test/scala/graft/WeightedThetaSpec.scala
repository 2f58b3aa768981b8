package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{WeightedTheta, WeightedThetaSketch}

class WeightedThetaSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def relErr(est: Double, exact: Double): Double =
    math.abs(est - exact) / math.max(math.abs(exact), 1e-12)

  test("below capacity the weighted sum is exact; duplicates count once") {
    val sk = new WeightedThetaSketch(1024)
    val rnd = new java.util.Random(3)
    val keys = Array.fill(400)(rnd.nextLong())
    // every key seen 3 times with its own weight — sum must count once
    (0 until 3).foreach(_ => keys.zipWithIndex.foreach { case (k, i) =>
      sk.update(k, (i % 7) + 1.0)
    })
    val exact = keys.indices.map(i => (i % 7) + 1.0).sum
    assert(math.abs(sk.estimateSum() - exact) < 1e-9)
  }

  test("saturated estimate stays within 5% (uniform and skewed weights)") {
    val rnd = new java.util.Random(11)
    val uniform = new WeightedThetaSketch(4096)
    var exactU = 0.0
    (0 until 100000).foreach { _ =>
      uniform.update(rnd.nextLong(), 2.5); exactU += 2.5
    }
    assert(relErr(uniform.estimateSum(), exactU) <= 0.05,
      s"uniform ${uniform.estimateSum()} vs $exactU")
    val skewed = new WeightedThetaSketch(4096)
    var exactS = 0.0
    (0 until 100000).foreach { i =>
      val w = if (i % 1000 == 0) 500.0 else 1.0
      skewed.update(rnd.nextLong(), w); exactS += w
    }
    assert(relErr(skewed.estimateSum(), exactS) <= 0.08,
      s"skewed ${skewed.estimateSum()} vs $exactS")
  }

  test("merge has set semantics: shared keys' weight counted once") {
    val rnd = new java.util.Random(17)
    val shared = Array.fill(30000)(rnd.nextLong())
    val onlyA = Array.fill(20000)(rnd.nextLong())
    val onlyB = Array.fill(10000)(rnd.nextLong())
    val a = new WeightedThetaSketch(2048)
    val b = new WeightedThetaSketch(2048)
    (shared ++ onlyA).foreach(a.update(_, 1.0))
    (shared ++ onlyB).foreach(b.update(_, 1.0))
    val u = WeightedTheta.deserialize(a.serialize())
    u.merge(WeightedTheta.deserialize(b.serialize()))
    assert(relErr(u.estimateSum(), 60000.0) <= 0.07,
      s"union ${u.estimateSum()} vs 60000")
    assert(u.estimateSum() < 70000.0, "union double-counted the overlap")
  }

  test("distributed build + union rollup matches exact distinct-weighted sum") {
    // keys shared across groups; weight is a deterministic function of
    // the key (the operator contract)
    val df = (0 until 40000)
      .map { i =>
        val key = (i * 2654435761L) % 3000
        (s"g${i % 4}", key, (key % 13) + 1.0)
      }
      .toDF("g", "id", "w").repartition(16)
    val exact = df.select($"id", $"w").distinct()
      .agg(sum($"w")).head.getDouble(0)
    val global = df.agg(WeightedTheta.estimateAgg($"id", $"w")).head.getDouble(0)
    // 3000 distinct < k=4096: exact regime end to end
    assert(math.abs(global - exact) < 1e-6, s"$global vs $exact")
    val perGroup = df.groupBy($"g")
      .agg(WeightedTheta.sketchAgg($"id", $"w").as("sk"))
    val rolled = perGroup.agg(WeightedTheta.unionAgg($"sk")).head.getDouble(0)
    assert(math.abs(rolled - exact) < 1e-6, s"rollup $rolled vs $exact")
  }

  test("null keys and null weights are skipped") {
    val df = Seq(
      (Some(1L), Some(2.0)), (None, Some(5.0)), (Some(2L), Some(3.0)),
      (Some(1L), Some(2.0)), (Some(3L), None)
    ).toDF("id", "w")
    val est = df.agg(WeightedTheta.estimateAgg($"id", $"w")).head.getDouble(0)
    assert(math.abs(est - 5.0) < 1e-12)
  }

  test("q50 registered query gates hold at sf0.001") {
    val r = SparkEntry.queries("q50_weighted_theta")(spark, sf).head()
    assert(r.getLong(0) > 0)
    assert(r.getBoolean(2), "global_ok must hold")
    assert(r.getBoolean(3), "rollup_ok must hold")
  }
}
