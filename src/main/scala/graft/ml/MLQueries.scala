package graft.ml

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables
import graft.functions.GraftFunctions._

/** Verify-harness entries for the ML surface (SURVEY §2.2-§2.3).
  *
  * Model outputs aren't SQL-expressible, so these are rows-only
  * checks in the driver harness; the behavioral guarantees live in
  * MLSpec (oracle-equivalence analog of the reference's
  * `test_core.py` suite). Each query aggregates predictions so the
  * output stays small at every scale factor.
  */
object MLQueries {

  /** End-to-end binary train+score on the fact table — the reference
    * lifecycle (`core.py` §3.1-3.3) in one query: derive label,
    * assemble features, distributed fit, broadcast-model transform,
    * confusion-matrix aggregate.
    */
  val mlBinary = GraftQuery(
    "ml_binary_train_predict",
    (s, dir) => {
      val t = Tables(s, dir)
      val feats = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val df = t.lineitem
        .withColumn("label", (col("l_returnflag") === "R").cast("double"))
        .select((feats.map(col) :+ col("label")): _*)
        .cache()
      val model = GraftBoost.train(df, feats, "label",
        GraftBoost.BoostParams("binary:logistic", numRound = 10, maxDepth = 3,
          maxBins = 16))
      val out = GraftBoost.predict(model, df)
        .groupBy(col("label"), col("prediction"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("prediction"))
      df.unpersist()
      out
    },
    None
  )

  /** Regression train+score (`XGBRegressor` lifecycle): predict
    * price from the other numerics, report grouped error stats.
    */
  val mlRegression = GraftQuery(
    "ml_regression_train_predict",
    (s, dir) => {
      val t = Tables(s, dir)
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val df = t.lineitem
        .select((feats.map(col) :+ col("l_extendedprice").as("target")): _*)
        .cache()
      val reg = new GraftXGBRegressor()
        .setNEstimators(10).setMaxDepth(3).setLearningRate(0.3).setMaxBins(16)
      reg.fit(df, feats, "target")
      val out = reg.predict(df)
        .agg(
          count(lit(1)).as("n"),
          count(when(col("prediction") > col("target"), 1)).as("n_over"),
          count(when(abs(col("prediction") - col("target")) < 20000, 1)).as("n_close")
        )
      df.unpersist()
      out
    },
    None
  )

  /** Multiclass train+score over the embeddings table (10 classes,
    * 64-dim float vectors). Uses the RandomForest multiclass strategy
    * (single model, native probabilities) — the scale path; the
    * OneVsRest boosting path is covered in MLSpec.
    */
  val mlMulticlass = GraftQuery(
    "ml_multiclass_embeddings",
    (s, dir) => {
      val t = Tables(s, dir)
      val df = t.embeddings
        .select(
          array_to_vector(toDoubleArray(col("embedding"))).as("features"),
          col("label").cast("double").as("label"))
        .cache()
      val model = GraftBoost.train(df, Seq("features"), "label",
        GraftBoost.BoostParams("multi:softprob", numRound = 20, maxDepth = 5,
          multiclassStrategy = "rf"))
      val out = GraftBoost.predict(model, df)
        .groupBy(col("label"), col("prediction"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("prediction"))
      df.unpersist()
      out
    },
    None
  )

  def all: Seq[GraftQuery] = Seq(mlBinary, mlRegression, mlMulticlass)
}
