package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off: wall-time named queries at a given sf dir. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = GraftSession.local(cores = 32, appName = "time-queries")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, dir).count()
      println(f"TIMED $n ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
    }
    spark.stop()
  }
}
