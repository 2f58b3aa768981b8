package graft

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._
import graft.ml.GraftBoost._

/** Sparsity-aware boosting ([[SparseBoost]], `missingStrategy =
  * "native"`) — XGBoost's learned default direction for missing
  * values (Chen & Guestrin 2016 §3.3; reference `core.py:370-377`,
  * `test_core.py:365-382`). Pins the exact Newton-leaf hand math,
  * BOTH polarities of the learned default branch, hessian-sum
  * `min_child_weight` semantics, determinism under subsampling, and
  * the full lifecycle (proba, importances, local predict, model
  * sink round-trip, marker substitution at serve time).
  */
class SparseBoostSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("one round of reg:squarederror reproduces the Newton leaf hand math") {
    // x=1 → y=1 (4 rows), x=2 → y=3 (4 rows); base margin 0.5, λ=1:
    // G = Σ(0.5−y): left −2 (H 4), right −10 (H 4)
    // leaves: −G/(H+λ) → 0.4 and 2.0; predictions 0.9 and 2.5
    val df = (0 until 8).map(i => (if (i < 4) 1.0 else 2.0, if (i < 4) 1.0 else 3.0))
      .toDF("x", "y")
    val m = GraftBoost.train(df, Seq("x"), "y",
      BoostParams("reg:squarederror", numRound = 1, maxDepth = 1, eta = 1.0,
        missing = Some(-999.0), missingStrategy = "native"))
    val preds = GraftBoost.predict(m, df)
      .groupBy("x").agg(first("prediction").as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(preds(1.0) - 0.9) < 1e-12, s"left leaf: ${preds(1.0)}")
    assert(math.abs(preds(2.0) - 2.5) < 1e-12, s"right leaf: ${preds(2.0)}")
    val hist = m.evalsResult("train")("rmse")
    assert(hist.length == 1 && hist.head < 1.0, s"rmse after 1 round: ${hist.toSeq}")
  }

  test("default direction is LEARNED: missing routes with the class it carries") {
    // polarity A: y = 1 for x > 5 AND for missing rows → the missing
    // gradient mass belongs with the high-x branch
    def corpus(missingLabel: Double) = (0 until 400).map { i =>
      val x = (i % 10) + 1.0
      if (i % 4 == 0) (-999.0, missingLabel)
      else (x, if (x > 5) 1.0 else 0.0)
    }.toDF("x", "y")
    val p = BoostParams("binary:logistic", numRound = 6, maxDepth = 2,
      eta = 0.5, missing = Some(-999.0), missingStrategy = "native")

    val mA = GraftBoost.train(corpus(1.0), Seq("x"), "y", p)
    assert(GraftBoost.predictLocal(mA, Vectors.dense(-999.0)) == 1.0,
      "polarity A: missing rows carry label 1, the learned branch must predict 1")
    val mB = GraftBoost.train(corpus(0.0), Seq("x"), "y", p)
    assert(GraftBoost.predictLocal(mB, Vectors.dense(-999.0)) == 0.0,
      "polarity B: missing rows carry label 0, the learned branch must predict 0")
    // the defaults genuinely differ between the two fits
    def defaults(m: GraftBoostModel) = m.model.asInstanceOf[SparseBoost.SparseModel]
      .trees.flatMap(t => t.feature.indices.filter(t.feature(_) >= 0).map(t.defaultLeft))
    assert(defaults(mA).toSeq != defaults(mB).toSeq,
      "the two polarities must learn different default branches")
    // and non-missing rows still classify by the x > 5 boundary
    assert(GraftBoost.predictLocal(mA, Vectors.dense(9.0)) == 1.0)
    assert(GraftBoost.predictLocal(mA, Vectors.dense(2.0)) == 0.0)
  }

  test("min_child_weight bounds the child HESSIAN sum (XGBoost semantics)") {
    // reg:squarederror has h = 1 per row, so the hessian bound is a
    // row-count bound here: the 4-row region is splittable at
    // minChildWeight=1 but not at 5
    val df = (0 until 24).map(i => (if (i < 4) 1.0 else 2.0, if (i < 4) 10.0 else 0.0))
      .toDF("x", "y")
    def distinctPreds(minCW: Int): Long =
      GraftBoost.predict(
        GraftBoost.train(df, Seq("x"), "y",
          BoostParams("reg:squarederror", numRound = 3, maxDepth = 2, eta = 0.5,
            minChildWeight = minCW, missing = Some(-999.0),
            missingStrategy = "native")),
        df).select("prediction").distinct().count()
    assert(distinctPreds(1) == 2, "minChildWeight=1 must split the two regions")
    assert(distinctPreds(5) == 1,
      "minChildWeight=5 blocks the split (H_L = 4 < 5): constant prediction")
  }

  test("deterministic across runs, including under subsampling") {
    val df = (0 until 500).map { i =>
      val x1 = (i % 17).toDouble
      val x2 = (i % 23).toDouble
      val x = if (i % 11 == 0) -999.0 else x1
      (x, x2, if (x1 + x2 > 18) 1.0 else 0.0)
    }.toDF("x1", "x2", "y")
    val p = BoostParams("binary:logistic", numRound = 5, maxDepth = 3,
      eta = 0.3, subsample = 0.7, missing = Some(-999.0),
      missingStrategy = "native")
    def run() = GraftBoost.predict(GraftBoost.train(df, Seq("x1", "x2"), "y", p), df)
      .orderBy("x1", "x2").select("prediction").collect().map(_.getDouble(0))
    assert(run().sameElements(run()), "two trains must be bit-identical")
  }

  test("binary lifecycle: accuracy, proba shape, importances") {
    val df = (0 until 600).map { i =>
      val signal = (i % 10).toDouble
      val noise = ((i * 7) % 13).toDouble
      val s = if (i % 9 == 0) -999.0 else signal
      (s, noise, if (signal >= 5) 1.0 else 0.0)
    }.toDF("signal", "noise", "y")
    val m = GraftBoost.train(df, Seq("signal", "noise"), "y",
      BoostParams("binary:logistic", numRound = 8, maxDepth = 3, eta = 0.4,
        missing = Some(-999.0), missingStrategy = "native"))
    val scored = GraftBoost.predict(m, df)
    val acc = scored.select(avg((col("prediction") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.9, s"native boosting should separate the signal: acc=$acc")
    val hist = m.evalsResult("train")("logloss")
    assert(hist.last < hist.head, "logloss history must fall")

    val pr = GraftBoost.predictProba(m, df)
      .select(col("proba"), col("y"))
      .limit(50).collect()
    pr.foreach { r =>
      val a = r.getSeq[Double](0)
      assert(math.abs(a.sum - 1.0) < 1e-9 && a.forall(x => x >= 0 && x <= 1))
    }
    val imp = GraftBoost.featureImportances(m)
    assert(imp("signal") > imp("noise"),
      s"gain importances must favor the signal feature: $imp")
    assert(math.abs(imp.values.sum - 1.0) < 1e-9)
  }

  test("gamma (min_split_loss) prunes low-gain splits") {
    // two regions separated by a small gain; a large gamma must leave
    // the tree as a single leaf (constant prediction)
    val df = (0 until 40).map(i => (if (i < 20) 1.0 else 2.0, if (i < 20) 0.4 else 0.6))
      .toDF("x", "y")
    def distinct(gamma: Double): Long =
      GraftBoost.predict(
        GraftBoost.train(df, Seq("x"), "y",
          BoostParams("reg:squarederror", numRound = 2, maxDepth = 2, eta = 0.5,
            missing = Some(-999.0), missingStrategy = "native",
            gammaMinSplitLoss = gamma)),
        df).select("prediction").distinct().count()
    assert(distinct(0.0) == 2, "gamma=0 splits the regions")
    assert(distinct(100.0) == 1, "a prohibitive gamma forbids every split")
  }

  test("colsample_bytree masks features per round, deterministically") {
    // y depends ONLY on x1; with colsample=0.5 over {x1, x2} half the
    // rounds must fit on x2 alone — those trees are near-stumps, so
    // importances still favor x1, and the whole fit stays reproducible
    val df = (0 until 400).map { i =>
      ((i % 8).toDouble, ((i * 3) % 5).toDouble, if (i % 8 >= 4) 1.0 else 0.0)
    }.toDF("x1", "x2", "y")
    val p = BoostParams("binary:logistic", numRound = 6, maxDepth = 2,
      eta = 0.5, missing = Some(-999.0), missingStrategy = "native",
      colsampleBytree = 0.5)
    val m1 = GraftBoost.train(df, Seq("x1", "x2"), "y", p)
    val m2 = GraftBoost.train(df, Seq("x1", "x2"), "y", p)
    def preds(m: GraftBoostModel) = GraftBoost.predict(m, df)
      .orderBy("x1", "x2").select("prediction").collect().map(_.getDouble(0))
    assert(preds(m1).sameElements(preds(m2)), "column sampling must be deterministic")
    val imp = GraftBoost.featureImportances(m1)
    assert(imp("x1") > imp("x2"), s"signal feature must dominate: $imp")
    // the mask genuinely bites: every tree uses at most 1 of 2 features
    val usedPerTree = m1.model.asInstanceOf[SparseBoost.SparseModel].trees
      .map(t => t.feature.filter(_ >= 0).distinct.length)
    assert(usedPerTree.forall(_ <= 1), s"colsample=0.5 of 2 → ≤1 feature/tree: ${usedPerTree.toSeq}")
  }

  test("scale_pos_weight shifts the decision boundary toward recall") {
    // heavily imbalanced, overlapping regions: upweighting positives
    // must increase predicted-positive count (recall up)
    val df = (0 until 600).map { i =>
      val x = (i % 20).toDouble
      val y = if (i % 10 == 0) 1.0 else 0.0   // 10% positives
      (x + (if (y == 1.0) 2.0 else 0.0), y)   // weak signal, overlap
    }.toDF("x", "y")
    def positives(spw: Double): Long =
      GraftBoost.predict(
        GraftBoost.train(df, Seq("x"), "y",
          BoostParams("binary:logistic", numRound = 6, maxDepth = 2, eta = 0.5,
            missing = Some(-999.0), missingStrategy = "native",
            scalePosWeight = spw)),
        df).filter(col("prediction") === 1.0).count()
    val base = positives(1.0)
    val boosted = positives(9.0)
    assert(boosted > base,
      s"scale_pos_weight=9 must predict more positives: $base -> $boosted")
  }

  test("monotone constraint +1 makes the MODEL non-decreasing in x") {
    // noisy increasing trend with a deliberate dip the unconstrained
    // fit memorizes; the constrained fit must be globally monotone
    val df = (0 until 300).map { i =>
      val x = (i % 30).toDouble
      val dip = if (x >= 12 && x < 15) -8.0 else 0.0
      (x, x + dip)
    }.toDF("x", "y")
    def fitted(cs: Seq[Int]): Array[Double] = {
      val m = GraftBoost.train(df, Seq("x"), "y",
        BoostParams("reg:squarederror", numRound = 8, maxDepth = 3, eta = 0.5,
          missing = Some(-999.0), missingStrategy = "native",
          monotoneConstraints = cs))
      (0 until 30).map(x =>
        GraftBoost.predictLocal(m, Vectors.dense(x.toDouble))).toArray
    }
    val free = fitted(Nil)
    assert(free.sliding(2).exists(p => p(1) < p(0) - 1e-9),
      "the dip must make the unconstrained fit non-monotone (fixture sanity)")
    val mono = fitted(Seq(1))
    mono.sliding(2).foreach { p =>
      assert(p(1) >= p(0) - 1e-9,
        s"constrained fit must be non-decreasing: ${mono.toSeq}")
    }
  }

  test("staged history + early stopping work on the native loop") {
    val df = (0 until 500).map { i =>
      val x = (i % 10).toDouble
      (x, ((i * 7) % 3).toDouble, if (x >= 5) 1.0 else 0.0)
    }.toDF("x1", "x2", "y")
    val (train, valid) = GraftBoost.calibrationSplit(df, 0.3)
    val p = BoostParams("binary:logistic", numRound = 30, maxDepth = 2,
      eta = 0.5, missing = Some(-999.0), missingStrategy = "native")
    val (m, best, hist, trained) = StagedEval.fitWithEarlyStopping(
      train, valid, Seq("x1", "x2"), "y", p, "auc", earlyStoppingRounds = 3)
    assert(trained < 30,
      s"a saturating metric must stop before numRound: trained=$trained")
    assert(best >= 1 && best <= hist.length)
    assert(m.model.asInstanceOf[SparseBoost.SparseModel].trees.length == best,
      "the returned model must be physically truncated at the best round")
  }

  test("reg:gamma converges to per-region means (log link, gamma deviance)") {
    // two regions with positive skewed-ish labels: x=0 → mean 2,
    // x=1 → mean 20; the gamma MLE per region is the region mean
    val df = (0 until 300).map { i =>
      if (i % 2 == 0) (0.0, Seq(1.0, 2.0, 3.0)(i % 3))
      else (1.0, Seq(10.0, 20.0, 30.0)(i % 3))
    }.toDF("x", "y")
    val m = GraftBoost.train(df, Seq("x"), "y",
      BoostParams("reg:gamma", numRound = 12, maxDepth = 1, eta = 0.5))
    val preds = GraftBoost.predict(m, df)
      .groupBy("x").agg(first("prediction").as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(preds(0.0) - 2.0) < 0.1, s"region 0: ${preds(0.0)} vs 2")
    assert(math.abs(preds(1.0) - 20.0) < 1.0, s"region 1: ${preds(1.0)} vs 20")
    val hist = m.evalsResult("train")("gamma-deviance")
    assert(hist.last < hist.head, s"deviance must fall: ${hist.toSeq}")
    assert(GraftBoost.predictLocal(m, Vectors.dense(0.0)) > 0.0,
      "log link keeps predictions strictly positive")
  }

  test("reg:tweedie handles exact zeros and converges to region means") {
    // zero-inflated target: x=0 rows are 60% exact zeros (mean 1.2),
    // x=1 rows positive (mean 15) — the compound Poisson-gamma shape
    // a gamma objective cannot touch (it needs y > 0)
    val df = (0 until 400).map { i =>
      if (i % 2 == 0) (0.0, if (i % 10 < 6) 0.0 else 3.0)
      else (1.0, Seq(10.0, 15.0, 20.0)(i % 3))
    }.toDF("x", "y")
    val m = GraftBoost.train(df, Seq("x"), "y",
      BoostParams("reg:tweedie", numRound = 15, maxDepth = 1, eta = 0.5,
        tweedieVariancePower = 1.5))
    val preds = GraftBoost.predict(m, df)
      .groupBy("x").agg(first("prediction").as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(math.abs(preds(0.0) - 1.2) < 0.15, s"zero-heavy region: ${preds(0.0)} vs 1.2")
    assert(math.abs(preds(1.0) - 15.0) < 1.0, s"positive region: ${preds(1.0)} vs 15")
    val hist = m.evalsResult("train")("tweedie-nloglik")
    assert(hist.last < hist.head, s"nloglik must fall: ${hist.toSeq}")
  }

  test("Saabas contributions decompose the native margin, missing rows included") {
    val df = (0 until 300).map { i =>
      val x1 = (i % 10).toDouble
      val x2 = ((i * 3) % 7).toDouble
      val miss = i % 6 == 0
      // missing x1 rows behave like the high-x1 region
      (if (miss) -999.0 else x1, x2,
        (if (miss) 9.0 else x1) * 2.0 + x2 * 0.5)
    }.toDF("x1", "x2", "y")
    val m = GraftBoost.train(df, Seq("x1", "x2"), "y",
      BoostParams("reg:squarederror", numRound = 5, maxDepth = 3, eta = 0.5,
        missing = Some(-999.0), missingStrategy = "native"))
    val joined = Contributions.transform(m, df)
      .join(GraftBoost.predict(m, df), Seq("x1", "x2", "y"))
    val maxErr = joined
      .select(max(abs(col("bias") +
        aggregate(col("contribs"), lit(0.0), (a, x) => a + x) -
        col("prediction"))))
      .head().getDouble(0)
    assert(maxErr < 1e-9, s"bias + Σcontribs must reproduce the margin: $maxErr")
    // a missing row's routing must be ATTRIBUTED to the missing
    // feature (default-branch credit, XGBoost pred_contribs shape)
    // the transform output carries the ASSEMBLED feature columns, so
    // the marker already became NaN
    val missContrib = Contributions.transform(m, df)
      .filter(isnan(col("x1")))
      .select(avg(abs(element_at(col("contribs"), 1))))
      .head().getDouble(0)
    assert(missContrib > 0.1,
      s"missing rows must carry x1 attribution through the default branch: $missContrib")
  }

  test("model sink round-trip + serve-time marker substitution + local parity") {
    val df = (0 until 300).map { i =>
      val x = (i % 10) + 1.0
      if (i % 5 == 0) (-999.0, 1.0) else (x, if (x > 5) 1.0 else 0.0)
    }.toDF("x", "y")
    val m = GraftBoost.train(df, Seq("x"), "y",
      BoostParams("binary:logistic", numRound = 5, maxDepth = 2, eta = 0.5,
        missing = Some(-999.0), missingStrategy = "native"))
    val dir = java.nio.file.Files.createTempDirectory("sparse_model").toString
    ModelIO.save(spark, m, dir)
    val loaded = ModelIO.load(spark, dir)
    assert(loaded.missingStrategy == "native")
    val a = GraftBoost.predict(m, df).orderBy("x", "y")
      .select("prediction").collect().map(_.getDouble(0))
    val b = GraftBoost.predict(loaded, df).orderBy("x", "y")
      .select("prediction").collect().map(_.getDouble(0))
    assert(a.sameElements(b), "a reloaded model must score identically")
    // marker −999 and a raw NaN vector are the same serve-time input
    assert(GraftBoost.predictLocal(loaded, Vectors.dense(-999.0)) ==
      GraftBoost.predictLocal(loaded, Vectors.dense(Double.NaN)))
    // local ≡ distributed on a probe row
    assert(GraftBoost.predictLocal(loaded, Vectors.dense(8.0)) ==
      GraftBoost.predict(loaded, Seq((8.0, 0.0)).toDF("x", "y"))
        .select("prediction").head().getDouble(0))
  }
}
