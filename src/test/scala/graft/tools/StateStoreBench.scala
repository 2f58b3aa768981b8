package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** A/B the streaming state-store backend: run the stateful streaming
  * queries with the default HDFS-backed provider, then with RocksDB,
  * on separate sessions. Dev measurement for BASELINE.md.
  *
  * Usage: sbt "Test/runMain graft.tools.StateStoreBench <sfDir>"
  */
object StateStoreBench {
  private val queries = Seq(
    "stream_hourly_agg", "stream_sessionize", "stream_session_window",
    "stream_dedup_exact", "stream_enrich_profile", "stream_score")

  private def run(provider: Option[String], sfDir: String): Seq[(String, Double)] = {
    val b = SparkSession.builder()
      .master("local[32]")
      .appName(s"graft-statestore-${provider.getOrElse("default")}")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    provider.foreach(p => b.config("spark.sql.streaming.stateStore.providerClass", p))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val times = queries.map { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      q -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    // a fresh session per backend: providerClass is read per query run
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    times
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rocksProvider =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    // interleave and keep the SECOND pair: the first pair absorbs the
    // JVM/codegen warmup, which would otherwise bias whichever backend
    // runs first
    run(None, sfDir); run(Some(rocksProvider), sfDir)
    val hdfs = run(None, sfDir)
    val rocks = run(Some(rocksProvider), sfDir)
    println(f"${"query"}%-24s ${"hdfs"}%8s ${"rocksdb"}%8s")
    hdfs.zip(rocks).foreach { case ((q, h), (_, r)) =>
      println(f"$q%-24s $h%8.2f $r%8.2f")
    }
    println(f"${"TOTAL"}%-24s ${hdfs.map(_._2).sum}%8.2f ${rocks.map(_._2).sum}%8.2f")
  }
}
