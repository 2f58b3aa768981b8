package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{GraftBoost, SparseBoost, XgbJson}
import graft.sources.Tables

/** XGBoost JSON model interchange: export/ingest of the public model
  * schema for the native-loop forests, with the documented
  * divergences (strict-< vs <= routing, f64 precision, base-score
  * link handling) pinned.
  */
class XgbJsonSpec extends AnyFunSuite {
  import TestSession._

  private def fitNative(objective: String): (
      GraftBoost.GraftBoostModel, org.apache.spark.sql.DataFrame) = {
    val t = Tables(spark, sf)
    val feats = Seq("l_quantity", "l_discount", "l_tax")
    val df = t.lineitem
      .withColumn("label",
        col("l_quantity") * 10.0 + col("l_discount") * 100.0)
      .withColumn("label",
        if (objective == "binary:logistic") (col("label") > 150.0).cast("double")
        else col("label"))
      .select((feats.map(col) :+ col("label")): _*)
      .cache()
    val m = GraftBoost.train(df, feats, "label",
      GraftBoost.BoostParams(objective, numRound = 4, maxDepth = 3,
        maxBins = 16, splitProposal = "approx",
        missing = Some(-999.0), missingStrategy = "native"))
    (m, df)
  }

  test("export -> import round-trips a native forest bit-for-bit") {
    val (m, df) = fitNative("reg:squarederror")
    val sm = m.model.asInstanceOf[SparseBoost.SparseModel]
    val back = XgbJson.importModel(XgbJson.export(m))
    val bm = back.model.asInstanceOf[SparseBoost.SparseModel]

    assert(back.featureCols == m.featureCols)
    assert(bm.base == sm.base, "margin base must survive via the attribute")
    assert(bm.trees.length == sm.trees.length)
    sm.trees.zip(bm.trees).foreach { case (a, b) =>
      assert(a.feature.toSeq == b.feature.toSeq)
      assert(a.left.toSeq == b.left.toSeq && a.right.toSeq == b.right.toSeq,
        "children (incl. the -1 leaf convention) must round-trip")
      // nextDown(nextUp(t)) == t exactly: internal thresholds
      // bit-identical after the strict-< shift and back
      a.feature.indices.filter(a.feature(_) >= 0).foreach { i =>
        assert(a.thresh(i) == b.thresh(i), s"thresh drift at node $i")
      }
      assert(a.value.toSeq == b.value.toSeq)
      assert(a.defaultLeft.toSeq == b.defaultLeft.toSeq)
      assert(a.cover.toSeq == b.cover.toSeq)
      assert(a.gain.toSeq == b.gain.toSeq,
        "per-node gains must ride loss_changes both ways")
    }
    // end to end: identical scores on the training frame
    val orig = GraftBoost.predict(m, df).select("prediction")
      .collect().map(_.getDouble(0))
    val rt = GraftBoost.predict(back, df).select("prediction")
      .collect().map(_.getDouble(0))
    assert(orig.sameElements(rt), "round-tripped model must score identically")
    df.unpersist()
  }

  test("binary:logistic base score survives the link round trip") {
    val (m, df) = fitNative("binary:logistic")
    val back = XgbJson.importModel(XgbJson.export(m))
    assert(back.numClasses == 2)
    assert(back.model.asInstanceOf[SparseBoost.SparseModel].base ==
      m.model.asInstanceOf[SparseBoost.SparseModel].base)
    val orig = GraftBoost.predict(m, df).select("prediction")
      .collect().map(_.getDouble(0))
    val rt = GraftBoost.predict(back, df).select("prediction")
      .collect().map(_.getDouble(0))
    assert(orig.sameElements(rt))
    df.unpersist()
  }

  test("ingests a stock-XGBoost document: strict-< routing, no attributes") {
    // one depth-1 tree, split f0 < 10 -> left (-1.0) else right (2.0);
    // missing goes left. base_score in original space (identity link).
    val doc = """
      {"learner":{"attributes":{},
        "feature_names":["f0"],"feature_types":["float"],
        "gradient_booster":{"model":{
          "gbtree_model_param":{"num_trees":"1","num_parallel_tree":"1"},
          "iteration_indptr":[0,1],"tree_info":[0],
          "trees":[{"base_weights":[0.0,-1.0,2.0],
            "categories":[],"categories_nodes":[],"categories_segments":[],
            "categories_sizes":[],
            "default_left":[1,0,0],"id":0,
            "left_children":[1,-1,-1],"right_children":[2,-1,-1],
            "loss_changes":[5.0,0.0,0.0],"parents":[2147483647,0,0],
            "split_conditions":[10.0,-1.0,2.0],
            "split_indices":[0,0,0],"split_type":[0,0,0],
            "sum_hessian":[30.0,10.0,20.0],
            "tree_param":{"num_deleted":"0","num_feature":"1",
              "num_nodes":"3","size_leaf_vector":"1"}}]},
          "name":"gbtree"},
        "learner_model_param":{"base_score":"0.5","boost_from_average":"1",
          "num_class":"0","num_feature":"1","num_target":"1"},
        "objective":{"name":"reg:squarederror"}},
       "version":[2,0,0]}"""
    val m = XgbJson.importModel(doc)
    val sm = m.model.asInstanceOf[SparseBoost.SparseModel]
    import org.apache.spark.ml.linalg.Vectors
    // x < 10 -> left leaf (0.5 - 1.0); x == 10 must go RIGHT (strict <)
    assert(sm.marginOf(Vectors.dense(9.999)) == 0.5 - 1.0)
    assert(sm.marginOf(Vectors.dense(10.0)) == 0.5 + 2.0)
    // NaN follows default_left -> left
    assert(sm.marginOf(Vectors.dense(Double.NaN)) == 0.5 - 1.0)
    // stock base_weights are eta-unscaled -> internal values must be
    // REBUILT as cover-weighted subtree means of the leaf outputs
    // (Saabas expectation): (10*(-1) + 20*2) / 30, not the file's 0.0
    assert(sm.trees(0).value(0) == (10.0 * -1.0 + 20.0 * 2.0) / 30.0)
    // boolean default_left (older 1.x serializers) must also ingest
    val boolDoc = doc.replace("\"default_left\":[1,0,0]",
      "\"default_left\":[true,false,false]")
    val mb = XgbJson.importModel(boolDoc)
    assert(mb.model.asInstanceOf[SparseBoost.SparseModel]
      .marginOf(Vectors.dense(Double.NaN)) == 0.5 - 1.0)
  }

  test("vector-pass-through forests are refused loudly (export and dump)") {
    // a forest splitting on slot >= |featureCols| was trained through
    // the vector pass-through; emitting num_feature=1 would be a
    // silently corrupt document, and the dump has no per-slot names
    val t = SparseBoost.SparseTree(
      feature = Array(2, -1, -1), thresh = Array(1.0, 0.0, 0.0),
      left = Array(1, -1, -1), right = Array(2, -1, -1),
      defaultLeft = Array(false, false, false),
      value = Array(0.0, -1.0, 1.0), cover = Array(4.0, 2.0, 2.0))
    val vecModel = GraftBoost.GraftBoostModel(
      new SparseBoost.SparseModel("u", Array(t), 0.0, "reg:squarederror",
        Array(0.0)),
      Seq("features"), "reg:squarederror", 0, Map.empty,
      missingStrategy = "native")
    intercept[IllegalArgumentException] { XgbJson.export(vecModel) }
    intercept[IllegalArgumentException] {
      graft.ml.TreeDump.treesToDataFrame(spark, vecModel)
    }
  }

  test("trees_to_dataframe: reference column conventions hold") {
    val (m, df) = fitNative("reg:squarederror")
    val sm = m.model.asInstanceOf[SparseBoost.SparseModel]
    val dump = graft.ml.TreeDump.treesToDataFrame(spark, m).collect()
    assert(dump.length == sm.trees.map(_.feature.length).sum)
    dump.foreach { r =>
      val (t, n) = (r.getInt(0), r.getInt(1))
      val tree = sm.trees(t)
      assert(r.getString(2) == s"$t-$n")
      if (r.getString(3) == "Leaf") {
        assert(tree.feature(n) < 0)
        assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
        // leaf rows carry the leaf VALUE in Gain (reference convention)
        assert(r.getDouble(8) == tree.value(n))
      } else {
        assert(r.getString(3) == m.featureCols(tree.feature(n)))
        assert(r.getDouble(4) == tree.thresh(n))
        assert(r.getString(5) == s"$t-${tree.left(n)}")
        assert(r.getString(6) == s"$t-${tree.right(n)}")
        val expectMissing =
          if (tree.defaultLeft(n)) tree.left(n) else tree.right(n)
        assert(r.getString(7) == s"$t-$expectMissing",
          "Missing must point at the learned default branch")
        assert(r.getDouble(8) == tree.gain(n))
        assert(r.getDouble(8) >= 0.0, "split gain must be non-negative")
      }
      assert(r.getDouble(9) == tree.cover(n))
    }
    df.unpersist()
  }

  test("refuses what the schema cannot carry") {
    val (m, df) = fitNative("reg:squarederror")
    df.unpersist()
    val lin = m.copy(model = new graft.ml.LinearBoost.LinearModel(
      "u", Array(0.0), 0.0, 0.0, "reg:squarederror"))
    intercept[IllegalArgumentException] { XgbJson.export(lin) }
    val multi = XgbJson.export(m).replace("\"num_class\":\"0\"",
      "\"num_class\":\"3\"")
    intercept[IllegalArgumentException] { XgbJson.importModel(multi) }
  }
}
