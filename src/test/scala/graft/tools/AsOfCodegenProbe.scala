package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.plans.AsOf

/** Dev probe: is the as-of exec inside a WholeStageCodegen span, and
  * what does fusing it buy at sf0.1?
  */
object AsOfCodegenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, appName = "asof-codegen-probe")
    val t = graft.sources.Tables(spark, dir)
    val clicks = t.events.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pt"), col("value").as("pv"))
    val df = AsOf.join(clicks, purchases, Seq("user_id"), Seq("pu"), "ts", "pt")
    df.collect() // drive THIS queryExecution so AQE finalizes its plan
    val plan = df.queryExecution.executedPlan.toString
    println("=== executed plan ===")
    println(plan.linesIterator.take(25).mkString("\n"))
    println("codegen over AsOfJoin: " + plan.linesIterator
      .exists(l => l.contains("AsOfJoin") && l.trim.startsWith("*")))
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    for (flag <- Seq("true", "false", "true")) {
      spark.conf.set("spark.sql.codegen.wholeStage", flag)
      timed(s"q27 wholeStage=$flag") {
        graft.SparkEntry.queries("q27_asof_join_native")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
