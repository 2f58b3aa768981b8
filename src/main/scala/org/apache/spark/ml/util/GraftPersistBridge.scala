package org.apache.spark.ml.util

import org.apache.spark.ml.param.Params
import org.apache.spark.sql.SparkSession

/** Bridge to the `private[ml]` spark.ml persistence helpers.
  *
  * `PipelineModel.load` / `CrossValidatorModel.load` resolve each
  * stage through `DefaultParamsReader.loadParamsInstance`, which reads
  * `<stagePath>/metadata` for the class name BEFORE dispatching to the
  * stage's own `MLReader` — a fitted pipeline containing a stage that
  * never wrote that file fails with file-not-found at load. The graft
  * model adapter therefore writes the standard metadata alongside its
  * own artifact, through this bridge.
  */
object GraftPersistBridge {

  /** Write the standard `<path>/metadata` file (class, uid, params,
    * Spark version) for `instance`.
    */
  def saveMetadata(instance: Params, path: String, spark: SparkSession): Unit =
    DefaultParamsWriter.saveMetadata(instance, path, spark)

  /** Parse `<path>/metadata`, failing loudly when the recorded class
    * is not `expectedClassName`; returns the persisted uid.
    */
  def loadMetadataUid(path: String, spark: SparkSession,
      expectedClassName: String): String =
    DefaultParamsReader.loadMetadata(path, spark, expectedClassName).uid

  /** Parse `<path>/metadata`, set every persisted param on `instance`
    * (the standard DefaultParamsReader path), and return the
    * persisted uid — so adapters restore params from ONE source of
    * truth instead of maintaining a parallel params JSON.
    */
  def loadMetadataInto(instance: Params, path: String, spark: SparkSession,
      expectedClassName: String): String = {
    val meta = DefaultParamsReader.loadMetadata(path, spark, expectedClassName)
    meta.getAndSetParams(instance)
    meta.uid
  }
}
