package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{KLLQuantiles, KLLSketch}

class KLLQuantileSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** |rank(sketch answer) / n − q| over the exact sorted data. */
  private def rankError(sorted: Array[Double], answer: Double, q: Double): Double = {
    val below = sorted.count(_ <= answer)
    math.abs(below.toDouble / sorted.length - q)
  }

  test("under capacity the sketch is exact (no compaction has happened)") {
    val sk = new KLLSketch(200)
    val xs = (1 to 150).map(_.toDouble)
    scala.util.Random.shuffle(xs).foreach(sk.update)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(sk.quantile(q) == math.max(1, math.ceil(q * 150)).toDouble,
        s"q=$q: ${sk.quantile(q)}")
  }

  test("rank error stays small on a skewed 100k stream (k=200)") {
    // lognormal-ish skew: the hard case for uniform samplers
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(100000)(math.exp(rnd.nextGaussian() * 2.0))
    val sk = new KLLSketch(200)
    xs.foreach(sk.update)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val err = rankError(sorted, sk.quantile(q), q)
      assert(err <= 0.02, s"q=$q rank error $err > 0.02")
    }
  }

  test("merge of shard sketches ≈ sketch of the union; serialization round-trips") {
    val rnd = new scala.util.Random(5)
    val xs = Array.fill(50000)(rnd.nextDouble() * 1000)
    val shards = xs.grouped(5000).map { chunk =>
      val s = new KLLSketch(200); chunk.foreach(s.update); s
    }.toSeq
    // binary round-trip each shard, then merge — the exact path the
    // aggregate's partial buffers take through the shuffle
    val merged = new KLLSketch(200)
    shards.foreach(s => merged.merge(KLLSketch.deserialize(s.serialize())))
    assert(merged.n == xs.length)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val err = rankError(sorted, merged.quantile(q), q)
      assert(err <= 0.03, s"merged q=$q rank error $err > 0.03")
    }
  }

  test("weight is conserved exactly through compaction and merge") {
    val sk = new KLLSketch(64)
    (1 to 33333).foreach(i => sk.update(i.toDouble))
    val levelWeight = sk.levels.zipWithIndex.map {
      case (lv, i) => lv.length.toLong * (1L << i)
    }.sum
    assert(levelWeight == 33333L, s"total weight $levelWeight != n")
  }

  test("distributed aggregate: grouped sketch quantiles within bound, empty group null") {
    val df = (0 until 60000).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      (g, (i % 1000).toDouble)
    }.toDF("g", "x").repartition(16)
    val out = df.groupBy($"g")
      .agg(KLLQuantiles.agg($"x", Seq(0.5, 0.95), k = 200).as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // per-group exact values are uniform over 0..999
    for ((_, qs) <- out) {
      assert(math.abs(qs(0) - 500.0) <= 25.0, s"p50 ${qs(0)}")
      assert(math.abs(qs(1) - 950.0) <= 25.0, s"p95 ${qs(1)}")
    }
    // empty input → null (not a crash)
    val empty = df.filter($"g" === "zzz")
      .agg(KLLQuantiles.agg($"x", Seq(0.5), k = 64).as("qs"))
      .collect().head
    assert(empty.isNullAt(0))
  }

  test("q35 runs and the sketch tracks the exact percentiles at sf0.001") {
    val rows = graft.operators.Relational.kllQuantilesDetail(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kp50, kp95) = (r.getDouble(1), r.getDouble(2))
      val (ep50, ep95) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(kp50 - ep50) / math.max(ep50, 1e-9) <= 0.15,
        s"p50 sketch $kp50 vs exact $ep50")
      assert(math.abs(kp95 - ep95) / math.max(ep95, 1e-9) <= 0.15,
        s"p95 sketch $kp95 vs exact $ep95")
    }
    // registered form: exact percentiles + rank-bounded sketch_ok
    val summary = SparkEntry.queries("q35_kll_quantiles")(spark, sf).collect()
    assert(summary.nonEmpty && summary.forall(_.getBoolean(3)))
  }
}
