package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.GraftBoost

class StreamScoreSpec extends AnyFunSuite {
  import TestSession._

  test("streaming inference equals batch inference with the same model") {
    val t = graft.sources.Tables(spark, sf)
    val feats = Seq("value", "k")
    val all = t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
    // training input + params must mirror stream_score's fit exactly
    // (incl. the deterministic 1-in-4 training sample and bins)
    val trainDf = all
      .filter(pmod(col("event_id"), lit(4)) === 0)
      .withColumn("label", (col("event_type") === "purchase").cast("double"))
    val model = GraftBoost.train(trainDf, feats, "label",
      GraftBoost.BoostParams(numRound = 5, maxDepth = 3, maxBins = 16))
    // scoring covers EVERY event, like the stream does
    val batchCounts = GraftBoost.predict(model, all)
      .groupBy(col("event_type"), col("prediction")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet

    val streamed = graft.streaming.EventsStream.streamScoreCounts(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(streamed == batchCounts,
      s"stream scoring diverges: ${streamed.diff(batchCounts)} / ${batchCounts.diff(streamed)}")
    // registered (oracle-checkable) form: per-type totals + parity bit
    val summary = SparkEntry.queries("stream_score")(spark, sf).collect()
    assert(summary.nonEmpty && summary.forall(_.getBoolean(2)))
  }

  test("q24 raw-SQL entry runs through spark.sql") {
    val df = SparkEntry.queries("q24_sql_entry")(spark, sf)
    assert(df.columns.toSeq == Seq("l_returnflag", "sum_price", "n"))
    assert(df.count() > 0)
  }
}
