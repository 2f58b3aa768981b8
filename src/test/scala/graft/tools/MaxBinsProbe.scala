package graft.tools

import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Probe: GBT fit wall-clock + accuracy across maxBins settings. */
object MaxBinsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, dir)
    val feats = Array("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val df = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(feats).setOutputCol("features")
      .transform(t.lineitem
        .withColumn("label", (col("l_returnflag") === "R").cast("double")))
      .select("features", "label").cache()
    df.count()
    for (bins <- Seq(32, 16, 8)) {
      val t0 = System.nanoTime()
      val m = new GBTClassifier().setMaxIter(10).setMaxDepth(3)
        .setMaxBins(bins).setSeed(42).fit(df)
      val fitSec = (System.nanoTime() - t0) / 1e9
      val acc = m.transform(df).filter(col("prediction") === col("label")).count().toDouble / df.count()
      println(f"[probe] maxBins=$bins fit=${fitSec}%.1f s acc=$acc%.4f")
    }
    spark.stop()
  }
}
