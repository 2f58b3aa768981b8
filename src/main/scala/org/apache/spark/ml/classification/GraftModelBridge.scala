package org.apache.spark.ml.classification

import org.apache.spark.ml.regression.{GBTRegressionModel}

/** Bridge to the package-private GBT model constructors: build a
  * truncated copy keeping only the first k trees — the reference's
  * `best_ntree_limit` semantics (`core.py:476-479`) applied as a
  * physical model cut, so early-stopped scoring pays for exactly the
  * selected rounds.
  */
object GraftModelBridge {

  def truncateClassifier(m: GBTClassificationModel, k: Int): GBTClassificationModel = {
    require(k >= 1 && k <= m.trees.length, s"k=$k out of 1..${m.trees.length}")
    // default featuresCol/predictionCol params suffice for the
    // engine's scoring path (no copyValues: it's protected)
    new GBTClassificationModel(m.uid + s"_trunc$k",
      m.trees.take(k), m.treeWeights.take(k), m.numFeatures, m.numClasses)
  }

  def truncateRegressor(m: GBTRegressionModel, k: Int): GBTRegressionModel = {
    require(k >= 1 && k <= m.trees.length, s"k=$k out of 1..${m.trees.length}")
    new GBTRegressionModel(m.uid + s"_trunc$k",
      m.trees.take(k), m.treeWeights.take(k), m.numFeatures)
  }
}
