package graft.tools
object KLLBench {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(7)
    for (round <- 1 to 3) {
      val sk = new graft.plans.KLLSketch(200)
      val t0 = System.nanoTime()
      var i = 0
      while (i < 2000000) { sk.update(rnd.nextDouble() * 1e5); i += 1 }
      println(f"round $round: 2M updates in ${(System.nanoTime()-t0)/1e6}%.0f ms, p50=${sk.quantile(0.5)}")
    }
  }
}
