package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

class ClusterDedupSpec extends AnyFunSuite {
  import TestSession._

  test("soft assignment: nearest cell first, distinct cells, deterministic") {
    val base = Similarity.corpusOf(spark, sf).cache()
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = base.withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(Similarity.DedupK).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
    val centroids = km.fit(featured).clusterCenters.map(_.toArray)
    val soft = Similarity.softAssign(base, centroids)
    val rows = soft.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) !== r.getInt(1), "cell and cell2 must differ")
      assert(r.getInt(0) >= 0 && r.getInt(0) < Similarity.DedupK)
      assert(r.getInt(1) >= 0 && r.getInt(1) < Similarity.DedupK)
    }
    base.unpersist(false)
  }

  test("within-cell pairs are a subset of the exact pairs; recall above gate") {
    val base = Similarity.corpusOf(spark, sf).cache()
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = base.withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(Similarity.DedupK).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
    val centroids = km.fit(featured).clusterCenters.map(_.toArray)
    val soft = Similarity.softAssign(base, centroids).cache()
    val clustered = Similarity.withinCellPairs(soft, Similarity.DedupCosine)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.blockedCosinePairs(
        spark, base, Similarity.DedupCosine, Dedup.BlockRows)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // soundness: every clustered pair really is a >=threshold pair
    assert(clustered.subsetOf(exact),
      s"within-cell emitted ${clustered.diff(exact).take(3)} not in exact set")
    val recall =
      if (exact.isEmpty) 1.0
      else clustered.intersect(exact).size.toDouble / exact.size
    info(f"cluster-dedup recall at $sf: $recall%.3f (${clustered.size}/${exact.size})")
    assert(recall >= Similarity.ClusterRecallGate,
      f"recall $recall%.3f below gate ${Similarity.ClusterRecallGate}")
    soft.unpersist(false)
    base.unpersist(false)
  }

  test("pca reduce: identity gates hold at sf0.001") {
    val r = SparkEntry.queries("sim_pca_reduce")(spark, sf).collect().head
    assert(r.getLong(1) == 64L && r.getLong(2) == 16L)
    assert(r.getBoolean(3), "explained variance not non-increasing")
    assert(r.getBoolean(4), "residual != (1 - sum explained) * total variance")
  }

  test("registered query gates hold at sf0.001") {
    val rows = SparkEntry.queries("cluster_semantic_dedup")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getBoolean(2), "assign_ok false: transform != direct argmin")
    assert(r.getBoolean(3), "recall_ok false")
  }
}
