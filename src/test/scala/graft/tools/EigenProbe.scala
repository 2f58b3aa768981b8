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
    val g = Array.ofDim[Double](d, d)
    cells.foreach { case (i, j, s) =>
      val v = s.toDouble / 1.0e12; g(i)(j) = v; g(j)(i) = v
    }
    for (iters <- Seq(30, 60, 120, 240, 480)) {
      val (lam, vec) = Similarity.topEigen(cells, d, iters)
      val resid = math.sqrt((0 until d).map { i =>
        val gvi = (0 until d).map(j => g(i)(j) * vec(j)).sum
        val r = gvi - lam * vec(i); r * r
      }.sum)
      println(f"ITERS $iters%4d lambda $lam%.9f resid $resid%.3e rel ${resid / lam}%.3e")
    }
    spark.stop()
  }
}
