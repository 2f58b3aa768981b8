package graft

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._
import graft.ml.GraftBoost._

/** gblinear ([[LinearBoost]]) — XGBoost's linear booster via the
  * params passthrough. Pins convergence to the CLOSED-FORM ridge
  * solution (the damped Jacobi fixed point is the normal-equations
  * solution for squared error), L1 sparsification, logistic learning,
  * determinism, and the full lifecycle (predict/proba/local/
  * importances/model sink).
  */
class LinearBoostSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("squared error converges to the closed-form ridge solution") {
    // y = 3 x1 − 2 x2 + 1 on a small deterministic design
    val rows = (0 until 200).map { i =>
      val x1 = (i % 10).toDouble
      val x2 = ((i * 7) % 5).toDouble
      (x1, x2, 3.0 * x1 - 2.0 * x2 + 1.0)
    }
    val df = rows.toDF("x1", "x2", "y")
    val lambda = 1.0
    val m = GraftBoost.train(df, Seq("x1", "x2"), "y",
      BoostParams("reg:squarederror", numRound = 200, eta = 0.5,
        lambdaL2 = lambda, booster = "gblinear"))
    val lm = m.model.asInstanceOf[LinearBoost.LinearModel]

    // closed-form ridge with unpenalized intercept, matching the
    // trainer's objective: minimize Σ(f−y)² + λ‖w‖² over (w, b) with
    // margin f = 0.5 + b + w·x. Solve the 3×3 normal equations on
    // the centered-by-nothing design directly.
    val n = rows.length.toDouble
    val xs = rows.map(r => Array(1.0, r._1, r._2))
    val ys = rows.map(_._3 - 0.5) // fold the base score out
    val a = Array.ofDim[Double](3, 3)
    val b = new Array[Double](3)
    for ((x, y) <- xs.zip(ys)) {
      for (p <- 0 until 3; q <- 0 until 3) a(p)(q) += x(p) * x(q)
      for (p <- 0 until 3) b(p) += x(p) * y
    }
    a(1)(1) += lambda; a(2)(2) += lambda // penalize weights, not bias
    // gaussian elimination (3×3)
    for (p <- 0 until 3) {
      val piv = a(p)(p)
      for (q <- p until 3) a(p)(q) /= piv
      b(p) /= piv
      for (r <- 0 until 3 if r != p) {
        val f = a(r)(p)
        for (q <- p until 3) a(r)(q) -= f * a(p)(q)
        b(r) -= f * b(p)
      }
    }
    assert(math.abs(lm.bias - b(0)) < 1e-6, s"bias ${lm.bias} vs ridge ${b(0)}")
    assert(math.abs(lm.weights(0) - b(1)) < 1e-6, s"w0 ${lm.weights(0)} vs ${b(1)}")
    assert(math.abs(lm.weights(1) - b(2)) < 1e-6, s"w1 ${lm.weights(1)} vs ${b(2)}")
    // history: rmse monotone-ish decreasing and near the ridge floor
    val hist = m.evalsResult("train")("rmse")
    assert(hist.last <= hist.head + 1e-12)
  }

  test("alpha drives an irrelevant feature's weight exactly to zero") {
    val df = (0 until 300).map { i =>
      val x1 = (i % 10).toDouble
      val noise = (((i * 31) % 17) - 8).toDouble / 8.0 // mean ~0, no signal
      (x1, noise, 5.0 * x1)
    }.toDF("x1", "x2", "y")
    val m = GraftBoost.train(df, Seq("x1", "x2"), "y",
      BoostParams("reg:squarederror", numRound = 120, eta = 0.5,
        lambdaL2 = 0.0, alphaL1 = 50.0, booster = "gblinear"))
    val lm = m.model.asInstanceOf[LinearBoost.LinearModel]
    assert(lm.weights(1) == 0.0,
      s"soft threshold must zero the noise weight: ${lm.weights.toSeq}")
    assert(math.abs(lm.weights(0) - 5.0) < 0.1,
      s"signal weight survives the penalty: ${lm.weights.toSeq}")
  }

  test("binary logistic separable fit: accuracy, proba, locality, determinism") {
    val df = (0 until 400).map { i =>
      val x = (i % 20).toDouble
      (x, if (x > 9.5) 1.0 else 0.0)
    }.toDF("x", "y")
    val p = BoostParams("binary:logistic", numRound = 60, eta = 0.5,
      booster = "gblinear")
    val m = GraftBoost.train(df, Seq("x"), "y", p)
    val acc = GraftBoost.predict(m, df)
      .select(avg((col("prediction") === col("y")).cast("double")))
      .head().getDouble(0)
    assert(acc == 1.0, s"a linearly separable step must be learned: $acc")
    val hist = m.evalsResult("train")("logloss")
    assert(hist.last < hist.head, "logloss must fall")
    // proba is a 2-vector sigmoid pair
    val pr = GraftBoost.predictProba(m, df.limit(1))
      .select("proba").head().getSeq[Double](0)
    assert(math.abs(pr.sum - 1.0) < 1e-12 && pr.forall(x => x >= 0 && x <= 1))
    // local ≡ distributed
    assert(GraftBoost.predictLocal(m, Vectors.dense(15.0)) == 1.0)
    assert(GraftBoost.predictLocal(m, Vectors.dense(2.0)) == 0.0)
    // two fits are bit-identical (no RNG anywhere in the loop)
    val m2 = GraftBoost.train(df, Seq("x"), "y", p)
    val (l1, l2) = (m.model.asInstanceOf[LinearBoost.LinearModel],
      m2.model.asInstanceOf[LinearBoost.LinearModel])
    assert(l1.weights.sameElements(l2.weights) && l1.bias == l2.bias)
  }

  test("importances are normalized weight magnitudes; sink round-trips") {
    val df = (0 until 200).map { i =>
      ((i % 10).toDouble, ((i * 3) % 4).toDouble, 4.0 * (i % 10) + ((i * 3) % 4))
    }.toDF("x1", "x2", "y")
    val m = GraftBoost.train(df, Seq("x1", "x2"), "y",
      BoostParams("reg:squarederror", numRound = 80, eta = 0.5,
        booster = "gblinear"))
    val imp = GraftBoost.featureImportances(m)
    assert(math.abs(imp.values.sum - 1.0) < 1e-9)
    assert(imp("x1") > imp("x2"))
    val dir = java.nio.file.Files.createTempDirectory("gblinear_model").toString
    ModelIO.save(spark, m, dir)
    val back = ModelIO.load(spark, dir)
    val (a, b) = (m.model.asInstanceOf[LinearBoost.LinearModel],
      back.model.asInstanceOf[LinearBoost.LinearModel])
    assert(a.weights.sameElements(b.weights) && a.bias == b.bias &&
      a.base == b.base && a.objective == b.objective)
    // reloaded model scores identically
    val va = GraftBoost.predict(m, df).orderBy("x1", "x2")
      .select("prediction").collect().map(_.getDouble(0))
    val vb = GraftBoost.predict(back, df).orderBy("x1", "x2")
      .select("prediction").collect().map(_.getDouble(0))
    assert(va.sameElements(vb))
  }

  test("guards: native missing strategy and unsupported objectives are loud") {
    val df = Seq((1.0, 2.0)).toDF("x", "y")
    intercept[IllegalArgumentException] {
      GraftBoost.train(df, Seq("x"), "y",
        BoostParams("reg:squarederror", booster = "gblinear",
          missing = Some(-999.0), missingStrategy = "native"))
    }
    intercept[IllegalArgumentException] {
      GraftBoost.train(df, Seq("x"), "y",
        BoostParams("reg:gamma", booster = "gblinear"))
    }
  }

  test("staged evaluation + best-round truncation + early stopping cover gblinear") {
    val df = (0 until 400).map { i =>
      val x1 = (i % 10).toDouble
      (x1, ((i * 7) % 5).toDouble, 4.0 * x1 - ((i * 7) % 5))
    }.toDF("x1", "x2", "y")
    val p = BoostParams("reg:squarederror", numRound = 30, eta = 1.0,
      lambdaL2 = 0.0, booster = "gblinear")
    val m = GraftBoost.train(df, Seq("x1", "x2"), "y", p)

    // truncation replays the exact training state: truncate(r) equals
    // a fresh fit with numRound = r bit-for-bit (no RNG anywhere)
    val lm = m.model.asInstanceOf[LinearBoost.LinearModel]
    val cut5 = lm.truncate(5)
    val fresh5 = GraftBoost.train(df, Seq("x1", "x2"), "y",
      p.copy(numRound = 5)).model.asInstanceOf[LinearBoost.LinearModel]
    assert(cut5.weights.sameElements(fresh5.weights) && cut5.bias == fresh5.bias)

    // staged rmse history matches the trainer's own per-round history
    val hist = StagedEval.history(m, df, "y", "rmse")
    val own = m.evalsResult("train")("rmse")
    assert(hist.length == own.length)
    hist.zip(own).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"staged $a vs trainer $b") }

    // early stopping: a ZERO-MEAN feature decouples the bias and
    // weight updates (the cross-moment B vanishes), so eta-1 Jacobi
    // solves exactly in one round — rmse is 0.0 from round 1 onward,
    // the strict-improvement stall detector fires inside the first
    // chunk, and far fewer than numRound=60 rounds are trained. (The
    // correlated fixtures above keep strictly improving at ulp scale
    // all 60 rounds, which correctly trains to completion — stalling
    // is a property of the metric, not of the round budget.)
    val df1 = (0 until 200).map { i =>
      val x = (i % 10).toDouble - 4.5
      (x, 4.0 * x)
    }.toDF("x1", "y")
    val (es, best, clipped, trained) = StagedEval.fitWithEarlyStopping(
      df1, df1, Seq("x1"), "y",
      p.copy(numRound = 60), "rmse", earlyStoppingRounds = 3)
    assert(trained < 60, s"early stopping must save rounds: trained=$trained")
    assert(best >= 1 && best <= clipped.length)
    val esl = es.model.asInstanceOf[LinearBoost.LinearModel]
    assert(esl.snapshots.get.length == best)
  }

  test("feature_selector greedy/thrifty beat cyclic; top_k=0 equals shotgun") {
    // one informative feature among four: a selective updater that
    // RANKS coordinates finds x1 every round; the cyclic round-robin
    // wastes 3 of every 4 rounds on noise columns
    val df = (0 until 400).map { i =>
      val x1 = (i % 20).toDouble - 9.5
      val n1 = ((i * 7) % 5).toDouble - 2.0
      val n2 = ((i * 11) % 3).toDouble - 1.0
      val n3 = ((i * 13) % 7).toDouble - 3.0
      (x1, n1, n2, n3, 5.0 * x1)
    }.toDF("x1", "n1", "n2", "n3", "y")
    val feats = Seq("x1", "n1", "n2", "n3")
    val p = BoostParams("reg:squarederror", numRound = 8, eta = 0.8,
      booster = "gblinear", lambdaL2 = 0.0, missingStrategy = "impute")
    def lastLoss(params: BoostParams): Double =
      GraftBoost.train(df, feats, "y", params)
        .evalsResult("train")("rmse").last
    val greedy = lastLoss(p.copy(featureSelector = "greedy", topK = 1))
    val thrifty = lastLoss(p.copy(featureSelector = "thrifty", topK = 1))
    val cyclic = lastLoss(p.copy(featureSelector = "cyclic", topK = 1))
    val shotgun = lastLoss(p)
    assert(greedy < cyclic,
      s"greedy must out-converge round-robin: $greedy vs $cyclic")
    assert(thrifty < cyclic,
      s"thrifty must out-converge round-robin: $thrifty vs $cyclic")
    // ranking selectors with the whole budget reduce to shotgun
    def weightsOf(params: BoostParams) =
      GraftBoost.train(df, feats, "y", params)
        .model.asInstanceOf[LinearBoost.LinearModel].weights.toSeq
    assert(weightsOf(p.copy(featureSelector = "greedy")) == weightsOf(p),
      "topK=0 greedy must be bit-identical to shotgun")
    assert(weightsOf(p.copy(featureSelector = "thrifty", topK = 4)) ==
      weightsOf(p))
    // determinism of the selective path
    assert(weightsOf(p.copy(featureSelector = "greedy", topK = 1)) ==
      weightsOf(p.copy(featureSelector = "greedy", topK = 1)))
    // shuffle/random: deterministic hash draws, still converge on
    // this fixture given enough rounds (every coordinate is visited)
    val pLong = p.copy(numRound = 16, topK = 2)
    val oneRound = lastLoss(p.copy(numRound = 1))
    val shuffleLoss = lastLoss(pLong.copy(featureSelector = "shuffle"))
    val randomLoss = lastLoss(pLong.copy(featureSelector = "random"))
    assert(shuffleLoss.isFinite && shuffleLoss < oneRound,
      s"shuffled-cyclic must keep converging: $shuffleLoss vs $oneRound")
    assert(randomLoss.isFinite && randomLoss < oneRound,
      s"random selector must keep converging: $randomLoss vs $oneRound")
    assert(weightsOf(pLong.copy(featureSelector = "shuffle")) ==
      weightsOf(pLong.copy(featureSelector = "shuffle")))
    assert(weightsOf(pLong.copy(featureSelector = "random")) ==
      weightsOf(pLong.copy(featureSelector = "random")))
    intercept[IllegalArgumentException](p.copy(featureSelector = "bogus"))
  }
}
