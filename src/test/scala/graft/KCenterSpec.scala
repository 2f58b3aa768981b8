package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Greedy k-center diversity selection (sim_kcenter_diversity):
  * replays the whole Gonzalez selection in driver memory on the
  * sf0.001 corpus and demands the distributed operator picked the
  * SAME centers with the same radii — plus the structural
  * certificates (non-increasing radii, distinct picks, min-id seed).
  */
class KCenterSpec extends AnyFunSuite {
  import TestSession._

  private val sf = "/root/testdata/sf0.001"

  private lazy val rows: Array[(Long, Array[Double])] =
    Similarity.corpusOf(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    math.sqrt(d)
  }

  private lazy val expected: Seq[(Long, Option[Double])] = {
    val mind = collection.mutable.Map.empty[Long, Double]
    var picks = Vector[(Long, Option[Double])]((rows.head._1, None))
    var lastCenter = rows.head._2
    for (_ <- 2 to Similarity.KCenters) {
      rows.foreach { case (id, v) =>
        val d = dist(v, lastCenter)
        if (d < mind.getOrElse(id, Double.MaxValue)) mind(id) = d
      }
      val (bid, bd) = rows
        .map { case (id, _) => (id, mind(id)) }
        .maxBy { case (id, d) => (d, -id) }
      picks = picks :+ ((bid, Some(bd)))
      lastCenter = rows.find(_._1 == bid).get._2
    }
    picks
  }

  private lazy val got: Seq[(Long, Long, Option[Double])] =
    SparkEntry.queries("sim_kcenter_diversity")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq.sortBy(_._1)

  test("distributed selection replays the in-memory greedy exactly") {
    assert(got.length == Similarity.KCenters)
    got.zip(expected).zipWithIndex.foreach {
      case (((step, id, r), (eid, er)), i) =>
        assert(step == i + 1)
        assert(id == eid, s"step ${i + 1}: picked $id, expected $eid")
        (r, er) match {
          case (None, None) => ()
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-6, s"step ${i + 1} radius $a vs $b")
          case other => fail(s"step ${i + 1} radius shape mismatch: $other")
        }
    }
  }

  test("radii are non-increasing (the k-center certificate)") {
    val radii = got.flatMap(_._3)
    assert(radii.length == Similarity.KCenters - 1)
    radii.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"radius increased: $a -> $b")
    }
  }

  test("picks are distinct and seeded at the min id") {
    val ids = got.map(_._2)
    assert(ids.distinct.length == ids.length, "centers must be distinct")
    assert(ids.head == rows.head._1, "seed must be the min vec_id")
  }
}
