package graft.tools

import org.apache.spark.sql.functions._

import graft.ml.{GraftBoost, QuantileBoost}
import graft.sources.Tables

/** One-off margin probe for the strict fitted-vs-fitted gate
  * comparisons (round-9 VERDICT task 5): prints the two compared
  * quantities and their ratio for each strict gate so near-ties can
  * be told apart from structurally-wide gaps.
  *
  * Run: `sbt "Test/runMain graft.tools.GateMarginProbe /root/testdata/sf0.01"`
  */
object GateMarginProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val s = graft.GraftSession.local(cores = 32, appName = "gate-margins")
    val t = Tables(s, dir)

    // ml_regression_train_predict: sse_model vs sse_mean
    locally {
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val df = t.lineitem
        .withColumn("label",
          col("l_quantity") * 100.0 + col("l_discount") * 1000.0 +
            col("l_tax") * 500.0 + col("l_extendedprice") * 0.001)
        .select((feats.map(col) :+ col("label")): _*)
        .cache()
      val m = GraftBoost.train(df, feats, "label",
        GraftBoost.BoostParams("reg:squarederror", numRound = 10,
          maxDepth = 3, maxBins = 16))
      val mean = df.select(avg(col("label"))).head().getDouble(0)
      val r = GraftBoost.predict(m, df).agg(
        sum(pow(col("label") - col("prediction"), 2)).as("sse_model"),
        sum(pow(col("label") - lit(mean), 2)).as("sse_mean")).head()
      println(f"ml_regression: sse_model=${r.getDouble(0)}%.4g " +
        f"sse_mean=${r.getDouble(1)}%.4g ratio=${r.getDouble(0) / r.getDouble(1)}%.4f")
      df.unpersist()
    }

    // ml_quantile_regression: pin_model vs pin_const
    locally {
      val alpha = 0.9
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val df = t.lineitem
        .withColumn("target",
          col("l_quantity") * 100.0 + col("l_extendedprice") * 0.001)
        .select((feats.map(col) :+ col("target")): _*)
        .cache()
      val m = GraftBoost.train(df, feats, "target",
        GraftBoost.BoostParams("reg:quantileerror", numRound = 5,
          maxDepth = 3, maxBins = 16, quantileAlpha = alpha,
          subsample = 0.2))
      def pin(pred: org.apache.spark.sql.Column) = avg(greatest(
        (col("target") - pred) * alpha, (col("target") - pred) * (alpha - 1.0)))
      val q90 = m.model.asInstanceOf[QuantileBoost.QuantileModel].base
      val r = GraftBoost.predict(m, df)
        .agg(pin(col("prediction")).as("pm"), pin(lit(q90)).as("pc"),
          avg((col("target") <= col("prediction")).cast("double")).as("cov"))
        .head()
      println(f"ml_quantile: pin_model=${r.getDouble(0)}%.4f " +
        f"pin_const=${r.getDouble(1)}%.4f ratio=${r.getDouble(0) / r.getDouble(1)}%.4f " +
        f"cov=${r.getDouble(2)}%.4f")
      df.unpersist()
    }

    // ml_tweedie_severity: mae_model vs mae_const
    locally {
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val df = t.lineitem
        .withColumn("label",
          when(col("l_discount") >= 0.05,
            col("l_quantity") * (col("l_discount") - 0.04) * 100.0)
            .otherwise(lit(0.0)))
        .select((feats.map(col) :+ col("label")): _*)
        .cache()
      val m = GraftBoost.train(df, feats, "label",
        GraftBoost.BoostParams("reg:tweedie", numRound = 6, maxDepth = 3,
          maxBins = 16, eta = 0.3, tweedieVariancePower = 1.5))
      val yMean = df.select(avg(col("label"))).head().getDouble(0)
      val r = GraftBoost.predict(m, df).agg(
        avg(abs(col("label") - col("prediction"))).as("mm"),
        avg(abs(col("label") - lit(yMean))).as("mc")).head()
      println(f"ml_tweedie: mae_model=${r.getDouble(0)}%.4f " +
        f"mae_const=${r.getDouble(1)}%.4f ratio=${r.getDouble(0) / r.getDouble(1)}%.4f")
      df.unpersist()
    }

    s.stop()
  }
}
