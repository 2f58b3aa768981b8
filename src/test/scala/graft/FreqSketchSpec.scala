package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MGSketch

class FreqSketchSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Zipf-ish stream: item i has weight ~ 1/(i+1). */
  private def zipfStream(n: Int, vocab: Int, seed: Long): Seq[String] = {
    val rnd = new java.util.Random(seed)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    Seq.fill(n) {
      val u = rnd.nextDouble()
      s"w${cum.indexWhere(u <= _)}"
    }
  }

  test("undercount bound: estimate in [true - n/(k+1), true]") {
    val xs = zipfStream(50000, 500, seed = 3)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = new MGSketch(64)
    xs.foreach(sk.update)
    val bound = xs.length / 65 + 1
    sk.items().foreach { case (t, est) =>
      assert(est <= truth(t), s"$t overcounted: $est > ${truth(t)}")
      assert(est >= truth(t) - bound, s"$t undercount beyond bound")
    }
  }

  test("every heavy item survives, including through sharded merges") {
    val xs = zipfStream(60000, 300, seed = 9)
    val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 32
    val bound = xs.length.toLong / (k + 1)
    val heavy = truth.filter(_._2 > bound).keySet
    assert(heavy.nonEmpty, "test needs at least one heavy item")
    // single-stream
    val sk = new MGSketch(k)
    xs.foreach(sk.update)
    assert(heavy.subsetOf(sk.items().map(_._1).toSet))
    // sharded + binary round-trip merge (the shuffle path)
    val merged = new MGSketch(k)
    xs.grouped(7000).foreach { chunk =>
      val shard = new MGSketch(k)
      chunk.foreach(shard.update)
      merged.merge(MGSketch.deserialize(shard.serialize()))
    }
    assert(merged.n == xs.length)
    assert(heavy.subsetOf(merged.items().map(_._1).toSet),
      "merge dropped a guaranteed-heavy item")
  }

  test("distributed aggregate finds the planted heavy token") {
    val rows = (0 until 30000).map { i =>
      if (i % 3 == 0) "hot" else s"cold_${i % 5000}"
    }.toDF("term").repartition(16)
    val summary = rows
      .agg(MGSketch.agg($"term", 64).as("s"))
      .select(explode($"s").as("e")).select($"e.term", $"e.cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.contains("hot"), "planted heavy item missing")
    // 10k true occurrences, bound n/(k+1) ~ 462
    assert(summary("hot") >= 10000L - 463L && summary("hot") <= 10000L)
  }

  test("registered heavy-hitters query: exact top-10 with mg_ok") {
    val rows = SparkEntry.queries("text_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    // counts descend; guarantee bit holds
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(r.getBoolean(3), "mg_ok false"))
  }

  test("CMS: one-sided overcount and eps bound hold on the corpus audit") {
    val rows = SparkEntry.queries("text_cms_freq")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"term ${r.getString(1)}: CMS undercounted")
      assert(r.getBoolean(4), s"term ${r.getString(1)}: eps bound broken")
    }
    // ranks are 1..20 with exact counts non-increasing
    val cnts = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }
}
