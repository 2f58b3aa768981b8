package graft.ml

import org.apache.spark.ml.classification.{
  GBTClassificationModel, GBTClassifier, OneVsRest, OneVsRestModel,
  ProbabilisticClassificationModel, RandomForestClassifier, RandomForestClassificationModel
}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.ml.Model
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed gradient-boosted training/scoring — the Spark-native
  * restatement of the reference's `train`/`predict` dataflow
  * (reference `core.py:268-321` train facade, `core.py:324-382`
  * predict dispatch).
  *
  * The reference's entire distribution machinery — partition triads,
  * locality pinning, the Rabit allreduce tracker (`core.py:183-253`,
  * `tracker.py`) — is structurally subsumed here: one DataFrame
  * co-locates features/label/weight, Spark's scheduler places tasks
  * data-local, and MLlib's boosting aggregates split statistics with
  * `treeAggregate` instead of an external allreduce ring. `fit` is a
  * sequence of distributed jobs; the model returns to the driver like
  * the reference's rank-0 booster (`core.py:126-131, 255-257`).
  *
  * Scale posture: training data should be cached by the caller for
  * iterative boosting; scoring broadcasts the model once into a
  * codegen'd `transform` (vs. the reference's per-task closure
  * serialization, `core.py:367`).
  */
object GraftBoost {

  /** Training parameters, mirroring the reference's canonical param
    * dict (`test_core.py:31-36`: max_depth, eta, objective) plus the
    * sklearn-wrapper knobs (`core.py:388-480`).
    *
    * @param objective        "binary:logistic", "multi:softprob", or
    *                         "reg:squarederror" (reference
    *                         `core.py:580-590` objective semantics)
    * @param numRound         boosting rounds (`num_boost_round`)
    * @param maxDepth         tree depth
    * @param eta              learning rate / step size
    * @param minChildWeight   approximated by minInstancesPerNode
    * @param subsample        row subsampling per tree
    * @param missing          value to treat as missing. MLlib has no
    *                         sparse-skip missing handling
    *                         (`SURVEY.md` §7.6d): occurrences are
    *                         replaced with NaN and imputed to the
    *                         column mean before assembly — a
    *                         documented divergence from XGBoost.
    * @param multiclassStrategy "ovr" = OneVsRest over binary GBT
    *                         (closest to multi:softprob boosting);
    *                         "rf" = RandomForest (single model,
    *                         native probabilities; faster at scale)
    * @param seed             determinism anchor
    */
  final case class BoostParams(
      objective: String = "binary:logistic",
      numRound: Int = 10,
      maxDepth: Int = 3,
      eta: Double = 0.3,
      minChildWeight: Int = 1,
      subsample: Double = 1.0,
      missing: Option[Double] = None,
      multiclassStrategy: String = "ovr",
      seed: Long = 42L
  )

  /** Trained model + training metadata. `numClasses` mirrors the
    * reference's `num_class` model attribute (`core.py:262-264`);
    * `evalsResult` mirrors the per-eval-set history dict
    * (`core.py:120, 259-260`), filled by [[evalHistory]].
    */
  final case class GraftBoostModel(
      model: Model[_],
      featureCols: Seq[String],
      objective: String,
      numClasses: Int,
      evalsResult: Map[String, Map[String, Array[Double]]],
      /** Missing-marker imputation learned at training time
        * (marker value, per-feature means) — applied at scoring so
        * train and serve see identical preprocessing.
        */
      imputation: Option[(Double, Map[String, Double])] = None
  )

  /** Assemble named feature columns into a `features` vector —
    * the `xgb.DMatrix` featurizer equivalence (`core.py:108`;
    * feature-name capture `core.py:107` becomes ML attribute
    * metadata on the vector column). Applies the missing-marker
    * imputation if configured.
    */
  /** Learn per-feature means over non-marker values (the imputation
    * statistics stored on the model for serve-time parity).
    */
  def learnImputation(
      df: DataFrame,
      featureCols: Seq[String],
      marker: Double
  ): Map[String, Double] = {
    val means = df
      .select(featureCols.map(c =>
        avg(when(col(c) =!= marker, col(c))).as(c)): _*)
      .first()
    featureCols.zipWithIndex.map { case (c, i) =>
      c -> Option(means.get(i)).map(_.toString.toDouble).getOrElse(0.0)
    }.toMap
  }

  def assemble(
      df: DataFrame,
      featureCols: Seq[String],
      imputation: Option[(Double, Map[String, Double])]
  ): DataFrame = {
    // Pre-assembled vector column (e.g. embeddings via
    // array_to_vector) passes straight through.
    if (featureCols == Seq("features") &&
        df.schema("features").dataType.typeName == "vector")
      return df
    val cleaned = imputation match {
      case None => df
      case Some((marker, means)) =>
        // Replace the marker with the TRAINING-time column mean.
        // Divergence from XGBoost sparse-skip is documented on
        // BoostParams.missing.
        featureCols.foldLeft(df) { case (d, c) =>
          d.withColumn(c, when(col(c) === marker, means(c)).otherwise(col(c)))
        }
    }
    new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("features")
      .transform(cleaned)
  }

  /** Distributed training — `train(client, params, data, labels, …)`
    * parity (`core.py:268-321`). The label/weight alignment checks of
    * the reference (`core.py:201-206`) are structurally unnecessary:
    * all columns ride one DataFrame.
    *
    * @param df          training frame holding `featureCols`,
    *                    `labelCol`, optionally `weightCol` and an
    *                    `isVal` boolean validation indicator
    * @param validationCol when set, names a boolean column marking
    *                    held-out rows — early stopping stops when the
    *                    validation loss stops improving (reference
    *                    early-stopping semantics, `core.py:435-449`)
    */
  def train(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      params: BoostParams = BoostParams(),
      weightCol: Option[String] = None,
      validationCol: Option[String] = None
  ): GraftBoostModel = {
    val imputation = params.missing.map(m =>
      (m, learnImputation(df, featureCols, m)))
    val data = assemble(df, featureCols, imputation)
      .withColumn("label", col(labelCol).cast("double"))

    params.objective match {
      case "reg:squarederror" =>
        val gbt = new GBTRegressor()
          .setFeaturesCol("features").setLabelCol("label")
          .setMaxIter(params.numRound).setMaxDepth(params.maxDepth)
          .setStepSize(params.eta).setSubsamplingRate(params.subsample)
          .setMinInstancesPerNode(params.minChildWeight)
          .setSeed(params.seed)
        weightCol.foreach(gbt.setWeightCol)
        validationCol.foreach(gbt.setValidationIndicatorCol)
        val model = gbt.fit(data)
        GraftBoostModel(model, featureCols, params.objective, 0, Map.empty, imputation)

      case "binary:logistic" =>
        val gbt = new GBTClassifier()
          .setFeaturesCol("features").setLabelCol("label")
          .setMaxIter(params.numRound).setMaxDepth(params.maxDepth)
          .setStepSize(params.eta).setSubsamplingRate(params.subsample)
          .setMinInstancesPerNode(params.minChildWeight)
          .setSeed(params.seed)
        weightCol.foreach(gbt.setWeightCol)
        validationCol.foreach(gbt.setValidationIndicatorCol)
        val model = gbt.fit(data)
        GraftBoostModel(model, featureCols, params.objective, 2, Map.empty, imputation)

      case "multi:softprob" | "multi:softmax" =>
        // Class inference = the reference's eager distributed
        // distinct (`core.py:561-566`).
        val numClasses = data.select(max(col("label"))).first().getDouble(0).toInt + 1
        val model: Model[_] = params.multiclassStrategy match {
          case "rf" =>
            require(validationCol.isEmpty,
              "RandomForest multiclass has no validation-based early stopping; " +
              "use multiclassStrategy=ovr for validation columns")
            val rf = new RandomForestClassifier()
              .setFeaturesCol("features").setLabelCol("label")
              .setNumTrees(params.numRound).setMaxDepth(params.maxDepth)
              .setSubsamplingRate(params.subsample)
              .setMinInstancesPerNode(params.minChildWeight)
              .setSeed(params.seed)
            weightCol.foreach(rf.setWeightCol)
            rf.fit(data)
          case _ =>
            val base = new GBTClassifier()
              .setFeaturesCol("features").setLabelCol("label")
              .setMaxIter(params.numRound).setMaxDepth(params.maxDepth)
              .setStepSize(params.eta).setSubsamplingRate(params.subsample)
              .setSeed(params.seed)
            weightCol.foreach(base.setWeightCol)
            validationCol.foreach(base.setValidationIndicatorCol)
            val ovr = new OneVsRest().setClassifier(base)
              .setFeaturesCol("features").setLabelCol("label")
            weightCol.foreach(ovr.setWeightCol)
            ovr.fit(data)
        }
        GraftBoostModel(model, featureCols, params.objective, numClasses,
          Map.empty, imputation)

      case other =>
        throw new IllegalArgumentException(s"unsupported objective: $other")
    }
  }

  /** Distributed lazy scoring — `predict(client, model, data)` parity
    * (`core.py:366-377`). Returns the input columns plus `prediction`
    * (double; class id or regression value). The multiclass shape
    * bookkeeping of the reference (`core.py:369-377`) is subsumed by
    * the probability vector column; see [[predictProba]].
    */
  def predict(model: GraftBoostModel, df: DataFrame): DataFrame = {
    val data = assemble(df, model.featureCols, model.imputation)
    val scored = model.model match {
      case m: GBTRegressionModel         => m.transform(data)
      case m: GBTClassificationModel     => m.transform(data)
      case m: RandomForestClassificationModel => m.transform(data)
      case m: OneVsRestModel             => m.transform(data)
      case m => throw new IllegalStateException(s"unknown model ${m.getClass}")
    }
    scored.drop("features", "rawPrediction", "probability")
  }

  /** Class-probability scoring — `predict_proba` parity
    * (`core.py:626-631`): emits `proba` as array<double> of length
    * numClasses (the reference's (n, num_class) matrix,
    * `core.py:374`).
    */
  def predictProba(model: GraftBoostModel, df: DataFrame): DataFrame = {
    val data = assemble(df, model.featureCols, model.imputation)
    model.model match {
      case m: ProbabilisticClassificationModel[_, _] =>
        m.transform(data)
          .withColumn("proba", vector_to_array(col("probability")))
          .drop("features", "rawPrediction", "probability")
      case m: OneVsRestModel =>
        // per-class margins → softmax. Matches the reference's
        // multi:softprob SHAPE contract (n × num_class, rows sum to
        // 1); values are normalized margins, not calibrated
        // probabilities — documented divergence. Use
        // multiclassStrategy=rf for calibrated class frequencies.
        // Work on a copy: mutating the shared model's output column
        // would change later predict() calls' schema.
        val scorer = m.copy(org.apache.spark.ml.param.ParamMap.empty)
          .asInstanceOf[OneVsRestModel].setRawPredictionCol("rawAll")
        val raw = scorer.transform(data)
        val margins = vector_to_array(col("rawAll"))
        val exps = transform(margins, x => exp(x))
        val denom = aggregate(exps, lit(0.0), (acc, x) => acc + x)
        raw
          .withColumn("proba", transform(exps, x => x / denom))
          .drop("features", "rawAll")
      case m =>
        throw new IllegalStateException(s"model has no probabilities: ${m.getClass}")
    }
  }

  /** Local eager scoring of a single feature vector — the reference's
    * local predict path (`core.py:378-382`): no cluster round-trip,
    * the driver-resident model scores directly.
    */
  def predictLocal(model: GraftBoostModel, features: Vector): Double =
    model.model match {
      case m: GBTRegressionModel              => m.predict(features)
      case m: GBTClassificationModel          => m.predict(features)
      case m: RandomForestClassificationModel => m.predict(features)
      case m => throw new UnsupportedOperationException(
        s"local predict unavailable for ${m.getClass}")
    }

  /** Per-round validation history — `evals_result` parity
    * (`core.py:120, 259-260`). MLlib exposes it post-hoc via
    * `evaluateEachIteration`; metric is logloss-family for
    * classification, squared error for regression.
    */
  def evalHistory(
      model: GraftBoostModel,
      evalSets: Map[String, DataFrame],
      labelCol: String
  ): Map[String, Map[String, Array[Double]]] =
    evalSets.map { case (name, df) =>
      val data = assemble(df, model.featureCols, model.imputation)
        .withColumn("label", col(labelCol).cast("double"))
      val (metric, values) = model.model match {
        case m: GBTClassificationModel => ("logloss", m.evaluateEachIteration(data))
        case m: GBTRegressionModel     => ("squarederror", m.evaluateEachIteration(data, "squared"))
        case m => throw new UnsupportedOperationException(
          s"per-iteration history unavailable for ${m.getClass}")
      }
      name -> Map(metric -> values)
    }
}
