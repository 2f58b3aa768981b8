package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ml.GraftBoost
import graft.sources.Tables

/** Phase-timing probe for stream_score: how much of the query is the
  * in-query GBT fit vs the streaming replay, and what the RocksDB
  * state-store backend does to the replay cost.
  */
object StreamScoreProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, appName = "stream-score-probe")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs"); r
    }
    val t = Tables(spark, dir)
    timed("warmup: events count")(t.events.count())
    val feats = Seq("value", "k")
    val batch = t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      .withColumn("label", (col("event_type") === "purchase").cast("double"))
    val model = timed("GBT train (5 rounds, bins 16)") {
      GraftBoost.train(batch, feats, "label",
        GraftBoost.BoostParams(numRound = 5, maxDepth = 3, maxBins = 16))
    }
    timed("batch score + agg") {
      GraftBoost.predict(model, batch)
        .groupBy(col("event_type"), col("prediction"))
        .agg(count(lit(1)).as("n")).collect()
    }
    timed("full stream_score query (incl. train)") {
      graft.SparkEntry.queries("stream_score")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    timed("stream replay: hourly agg (HDFS store)") {
      graft.SparkEntry.queries("stream_hourly_agg")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    timed("stream replay: hourly agg (RocksDB)") {
      graft.SparkEntry.queries("stream_hourly_agg")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    timed("stream replay: sessionize (RocksDB)") {
      graft.SparkEntry.queries("stream_sessionize")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    timed("stream replay: sessionize (HDFS store)") {
      graft.SparkEntry.queries("stream_sessionize")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    for (parts <- Seq(16, 8, 4)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      timed(s"sessionize, $parts state partitions") {
        graft.SparkEntry.queries("stream_sessionize")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      timed(s"hourly agg, $parts state partitions") {
        graft.SparkEntry.queries("stream_hourly_agg")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.stop()
  }
}
