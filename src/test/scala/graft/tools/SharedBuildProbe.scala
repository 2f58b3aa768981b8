package graft.tools

import graft.GraftSession
import graft.operators.{Dedup, Graph, TextAnalysis}

/** Dev tool: time each `_shared_build` component cold, one at a time,
  * so optimization work targets the component that actually costs
  * (totals-only attribution is how per-row regressions hid in round
  * 7). Not part of the library surface.
  */
object SharedBuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 32, appName = "graft-sharedprobe")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt

    def timed(label: String)(f: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        graft.SharedBuilds.clearAll()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"${times.min}%8.2f s  $label (min of $reps)")
    }

    // order matters: each timing clears ALL memos first, then builds
    // only its component (plus that component's own prerequisites)
    timed("dedup jaccard pairs")(
      Dedup.jaccardPairsShared(spark, dir, Dedup.MaxShingleDf).count())
    timed("dedup jaccard pairs + CC")(
      Dedup.jaccardClustersShared(spark, dir, Dedup.MaxShingleDf).count())
    timed("dedup cosine pairs")(
      Dedup.cosinePairsShared(spark, dir, Dedup.CosineThreshold).count())
    timed("graph copurchase")(
      Graph.copurchaseGraphShared(spark, dir)._2.count())
    timed("graph copurchase weighted")(
      Graph.copurchaseWeightedShared(spark, dir).count())
    timed("text bm25 ranked")(
      TextAnalysis.bm25RankedShared(spark, dir).count())
    timed("text scored docs")(
      TextAnalysis.scoredDocsShared(spark, dir).count())
    timed("text per-source excess KL")(
      TextAnalysis.perSourceExcessKlShared(spark, dir).count())
    timed("buildAll (the _shared_build row)")(
      graft.SharedBuilds.buildAll(spark, dir))
    spark.stop()
  }
}
