package graft.ml

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** spark.ml `Pipeline`/`CrossValidator` integration of the estimator
  * surface (SURVEY §7.3). The reference gets sklearn composability
  * for free by subclassing (`core.py:387` `class XGBRegressor(
  * xgb.XGBRegressor)`, `core.py:487` — `get_params`/`clone`/grid
  * search all work through sklearn's estimator protocol); the Spark
  * analog of that protocol is `org.apache.spark.ml.Estimator` +
  * `Params`, which [[GraftEstimator]]'s mutable-builder style cannot
  * satisfy. These adapters close the gap: `Param`-typed
  * hyperparameters (so `ParamGridBuilder`/`CrossValidator` can copy
  * and sweep them), `fit(Dataset): Model` delegating to the SAME
  * builders (class inference, objective rewrite, missing-value
  * strategies included), and ML persistence in both directions —
  * `DefaultParamsWritable` estimators, a custom writer/reader pair
  * for the model wrapping [[ModelIO]]'s engine-level artifact.
  *
  * Scale posture: identical to the wrapped builders — `fit` is the
  * distributed boosting loop, `transform` a broadcast-model map-side
  * pass; the adapter adds zero data movement.
  */
private[ml] trait GraftBoostMLParams extends Params {

  /** Assembled feature vector column (`VectorAssembler` output). */
  final val featuresCol =
    new Param[String](this, "featuresCol", "feature vector column")
  final def getFeaturesCol: String = $(featuresCol)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)

  final val labelCol = new Param[String](this, "labelCol", "label column")
  final def getLabelCol: String = $(labelCol)
  def setLabelCol(v: String): this.type = set(labelCol, v)

  final val predictionCol =
    new Param[String](this, "predictionCol", "prediction output column")
  final def getPredictionCol: String = $(predictionCol)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  /** Empty string = unweighted (spark.ml's own convention for
    * optional column params).
    */
  final val weightCol =
    new Param[String](this, "weightCol", "instance weight column ('' = none)")
  final def getWeightCol: String = $(weightCol)
  def setWeightCol(v: String): this.type = set(weightCol, v)

  final val numRound = new IntParam(this, "numRound",
    "boosting rounds (n_estimators)", ParamValidators.gtEq(1))
  final def getNumRound: Int = $(numRound)
  def setNumRound(v: Int): this.type = set(numRound, v)

  final val maxDepth = new IntParam(this, "maxDepth",
    "max tree depth", ParamValidators.gtEq(1))
  final def getMaxDepth: Int = $(maxDepth)
  def setMaxDepth(v: Int): this.type = set(maxDepth, v)

  final val eta = new DoubleParam(this, "eta",
    "learning rate", ParamValidators.inRange(0.0, 1.0, false, true))
  final def getEta: Double = $(eta)
  def setEta(v: Double): this.type = set(eta, v)

  final val subsample = new DoubleParam(this, "subsample",
    "row subsample per round", ParamValidators.inRange(0.0, 1.0, false, true))
  final def getSubsample: Double = $(subsample)
  def setSubsample(v: Double): this.type = set(subsample, v)

  /** NaN = no missing marker (Param[Double] can't be optional; NaN is
    * never a legal marker because NaN input is rejected upstream).
    */
  final val missing = new DoubleParam(this, "missing",
    "missing-value marker (NaN = none)")
  final def getMissing: Double = $(missing)
  def setMissing(v: Double): this.type = set(missing, v)

  final val missingStrategy = new Param[String](this, "missingStrategy",
    "impute | sentinel | native",
    ParamValidators.inArray(Array("impute", "sentinel", "native")))
  final def getMissingStrategy: String = $(missingStrategy)
  def setMissingStrategy(v: String): this.type = set(missingStrategy, v)

  final val maxBins = new IntParam(this, "maxBins",
    "histogram bins per feature", ParamValidators.gtEq(2))
  final def getMaxBins: Int = $(maxBins)
  def setMaxBins(v: Int): this.type = set(maxBins, v)

  final val seed = new LongParam(this, "seed", "deterministic seed")
  final def getSeed: Long = $(seed)
  def setSeed(v: Long): this.type = set(seed, v)

  setDefault(featuresCol -> "features", labelCol -> "label",
    predictionCol -> "prediction", weightCol -> "",
    numRound -> 100, maxDepth -> 3, eta -> 0.1, subsample -> 1.0,
    missing -> Double.NaN, missingStrategy -> "impute", maxBins -> 32,
    seed -> 42L)

  protected def validateAndTransformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(featuresCol)),
      s"features column '${$(featuresCol)}' missing from ${schema.fieldNames.toSeq}")
    require(!schema.fieldNames.contains($(predictionCol)),
      s"prediction column '${$(predictionCol)}' already exists")
    schema.add(StructField($(predictionCol), DoubleType))
  }

  protected def optMissing: Option[Double] =
    if ($(missing).isNaN) None else Some($(missing))

  protected def optWeight: Option[String] =
    if ($(weightCol).isEmpty) None else Some($(weightCol))

  /** The engine's assemble pass-through keys on the literal column
    * name `features`; a differently-named vector column is renamed on
    * the way in (metadata-only — no data movement).
    */
  protected def toEngineFrame(df: DataFrame): DataFrame =
    if ($(featuresCol) == "features") df
    else df.withColumnRenamed($(featuresCol), "features")
}

/** spark.ml `Estimator` facade over [[GraftXGBRegressor]]. */
final class GraftXGBRegressorML(override val uid: String)
    extends Estimator[GraftXGBModelML]
    with GraftBoostMLParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXgbReg"))

  override def fit(dataset: Dataset[_]): GraftXGBModelML = {
    validateAndTransformSchema(dataset.schema)
    val b = new GraftXGBRegressor()
      .setNEstimators($(numRound)).setMaxDepth($(maxDepth))
      .setLearningRate($(eta)).setSubsample($(subsample))
      .setMaxBins($(maxBins)).setSeed($(seed))
      .setMissingStrategy($(missingStrategy))
    optMissing.foreach(b.setMissing)
    val inner = b.fit(toEngineFrame(dataset.toDF()), Seq("features"),
      $(labelCol), optWeight).model.get
    copyValues(new GraftXGBModelML(uid, inner, isClassifier = false)
      .setParent(this))
  }

  override def copy(extra: ParamMap): GraftXGBRegressorML = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
}

object GraftXGBRegressorML extends DefaultParamsReadable[GraftXGBRegressorML]

/** spark.ml `Estimator` facade over [[GraftXGBClassifier]] — class
  * inference and the binary→multi objective rewrite ride along
  * because fit delegates to the same builder (`core.py:561-590`).
  */
final class GraftXGBClassifierML(override val uid: String)
    extends Estimator[GraftXGBModelML]
    with GraftBoostMLParams with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftXgbCls"))

  final val objective = new Param[String](this, "objective",
    "binary:logistic (rewritten to multi:softprob on >2 classes)")
  def setObjective(v: String): this.type = set(objective, v)

  final val multiclassStrategy = new Param[String](this,
    "multiclassStrategy", "ovr | softprob | rf",
    ParamValidators.inArray(Array("ovr", "softprob", "rf")))
  def setMulticlassStrategy(v: String): this.type =
    set(multiclassStrategy, v)

  setDefault(objective -> "binary:logistic", multiclassStrategy -> "ovr")

  override def fit(dataset: Dataset[_]): GraftXGBModelML = {
    validateAndTransformSchema(dataset.schema)
    val b = new GraftXGBClassifier()
      .setNEstimators($(numRound)).setMaxDepth($(maxDepth))
      .setLearningRate($(eta)).setSubsample($(subsample))
      .setMaxBins($(maxBins)).setSeed($(seed))
      .setMissingStrategy($(missingStrategy))
      .setObjective($(objective))
      .setMulticlassStrategy($(multiclassStrategy))
    optMissing.foreach(b.setMissing)
    val inner = b.fit(toEngineFrame(dataset.toDF()), Seq("features"),
      $(labelCol), optWeight).model.get
    copyValues(new GraftXGBModelML(uid, inner, isClassifier = true)
      .setParent(this))
  }

  override def copy(extra: ParamMap): GraftXGBClassifierML = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)
}

object GraftXGBClassifierML extends DefaultParamsReadable[GraftXGBClassifierML]

/** The fitted spark.ml `Model`: broadcast-model scoring via
  * [[GraftBoost.predict]] (classifier predictions stay DoubleType —
  * `MulticlassClassificationEvaluator`'s contract). Persistence
  * wraps [[ModelIO]]'s engine artifact plus a small adapter-meta
  * JSON, so `model.write.save(p)` / `GraftXGBModelML.load(p)`
  * round-trips inside spark.ml tooling while the engine artifact
  * stays loadable by [[ModelIO.load]] directly.
  */
final class GraftXGBModelML(
    override val uid: String,
    private[graft] val inner: GraftBoost.GraftBoostModel,
    val isClassifier: Boolean
) extends Model[GraftXGBModelML] with GraftBoostMLParams with MLWritable {

  override def copy(extra: ParamMap): GraftXGBModelML =
    copyValues(new GraftXGBModelML(uid, inner, isClassifier), extra)
      .setParent(parent)

  override def transform(dataset: Dataset[_]): DataFrame = {
    // same loud refusal the estimator side enforces — withColumnRenamed
    // would otherwise mint a DUPLICATE column name
    require(!dataset.columns.contains($(predictionCol)),
      s"prediction column '${$(predictionCol)}' already exists on the input")
    // scoring consumes the features vector (GraftBoost.predict drops
    // it); evaluators need only label + prediction
    val scored = GraftBoost.predict(inner, toEngineFrame(dataset.toDF()))
    if ($(predictionCol) == "prediction") scored
    else scored.withColumnRenamed("prediction", $(predictionCol))
  }

  override def transformSchema(schema: StructType): StructType =
    schema.add(StructField($(predictionCol), DoubleType))

  /** `predict_proba` pass-through for binary/multiclass models. */
  def transformProba(dataset: Dataset[_]): DataFrame =
    GraftBoost.predictProba(inner, toEngineFrame(dataset.toDF()))

  /** `feature_importances_` in feature order. */
  def featureImportances: Map[String, Double] =
    GraftBoost.featureImportances(inner)

  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      // standard spark.ml metadata FIRST: PipelineModel/
      // CrossValidatorModel loading resolves every stage through
      // DefaultParamsReader.loadParamsInstance, which reads
      // <path>/metadata for the class name before dispatching to this
      // class's own reader — without it a fitted pipeline containing
      // this stage saves fine but fails to load (file-not-found)
      org.apache.spark.ml.util.GraftPersistBridge.saveMetadata(
        GraftXGBModelML.this, path, sparkSession)
      ModelIO.save(sparkSession, inner, new Path(path, "graft").toString)
      import org.json4s.DefaultFormats
      import org.json4s.jackson.Serialization
      implicit val fmt: DefaultFormats.type = DefaultFormats
      // uid + params live in the STANDARD metadata file (one source
      // of truth, restored via getAndSetParams); adapter_meta carries
      // only what Params can't: the constructor flag
      val meta = Map("isClassifier" -> isClassifier)
      val fs = new Path(path)
        .getFileSystem(sparkSession.sparkContext.hadoopConfiguration)
      val out = fs.create(new Path(path, "adapter_meta.json"), true)
      try out.write(Serialization.write(meta).getBytes("UTF-8"))
      finally out.close()
    }
  }
}

object GraftXGBModelML extends MLReadable[GraftXGBModelML] {
  override def read: MLReader[GraftXGBModelML] = new MLReader[GraftXGBModelML] {
    override def load(path: String): GraftXGBModelML = {
      import org.json4s.DefaultFormats
      import org.json4s.jackson.JsonMethods
      implicit val fmt: DefaultFormats.type = DefaultFormats
      val fs = new Path(path)
        .getFileSystem(sparkSession.sparkContext.hadoopConfiguration)
      val in = fs.open(new Path(path, "adapter_meta.json"))
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val meta = JsonMethods.parse(json).extract[Map[String, Any]]
      val inner =
        ModelIO.load(sparkSession, new Path(path, "graft").toString)
      if (fs.exists(new Path(path, "metadata"))) {
        // current format: uid from the standard metadata (validated
        // against this class); params restored onto the instance from
        // the SAME file — adapter_meta carries only the constructor
        // flag
        val uid0 = org.apache.spark.ml.util.GraftPersistBridge.loadMetadataUid(
          path, sparkSession, classOf[GraftXGBModelML].getName)
        val m = new GraftXGBModelML(uid0, inner,
          meta("isClassifier").asInstanceOf[Boolean])
        org.apache.spark.ml.util.GraftPersistBridge.loadMetadataInto(
          m, path, sparkSession, classOf[GraftXGBModelML].getName)
        m
      } else {
        // legacy format (pre standard-metadata writer): everything —
        // uid and the column params — lives in adapter_meta.json.
        // Standalone models saved by that code must keep loading, and
        // a partially-written file must fail NAMING the artifact and
        // the missing key — not with a bare NoSuchElementException
        def legacyStr(key: String): String = meta.get(key) match {
          case Some(v: String) => v
          case Some(other) => throw new IllegalArgumentException(
            s"legacy adapter_meta.json at $path: key '$key' is not a " +
            s"string (got $other) — artifact unreadable")
          case None => throw new IllegalArgumentException(
            s"legacy adapter_meta.json at $path is missing key '$key' " +
            "— the artifact was not fully written by the legacy saver")
        }
        val m = new GraftXGBModelML(legacyStr("uid"), inner,
          meta.get("isClassifier") match {
            case Some(b: Boolean) => b
            case _ => throw new IllegalArgumentException(
              s"legacy adapter_meta.json at $path is missing boolean " +
              "key 'isClassifier' — artifact unreadable")
          })
        // column params: restore when present, keep the Param default
        // when a legacy writer omitted one (weightCol has no default
        // and stays unset if absent)
        meta.get("featuresCol").foreach(v => m.setFeaturesCol(v.asInstanceOf[String]))
        meta.get("labelCol").foreach(v => m.setLabelCol(v.asInstanceOf[String]))
        meta.get("predictionCol").foreach(v => m.setPredictionCol(v.asInstanceOf[String]))
        meta.get("weightCol").foreach(v => m.setWeightCol(v.asInstanceOf[String]))
        m
      }
    }
  }

  override def load(path: String): GraftXGBModelML = super.load(path)
}
