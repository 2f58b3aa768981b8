package graft.tools

import graft.GraftSession
import graft.operators.Similarity

/** One-off probe: residual decay of the Gram power iteration. */
object EigenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(cores = 8, appName = "eigen-probe")
    val cells = Similarity.gramCells(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    val d = Similarity.Dim
    for (iters <- Seq(30, 60, 120, 240, 480)) {
      val (lam, _, resid) = Similarity.topEigen(cells, d, iters)
      println(f"ITERS $iters%4d lambda $lam%.9f resid $resid%.3e rel ${resid / lam}%.3e")
    }
    spark.stop()
  }
}
