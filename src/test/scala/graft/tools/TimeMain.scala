package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: wall-time individual queries at a chosen SF with the
  * bench session shape (local[32], 32 shuffle partitions) to chase
  * regressions outside the full sweep. Not part of the library
  * surface.
  */
object TimeMain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 32, appName = "graft-time")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val cnt = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIME $n%-28s $sec%8.2f s  ($cnt rows)")
    }
    spark.stop()
  }
}
