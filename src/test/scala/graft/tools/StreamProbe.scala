package graft.tools

import java.util.UUID

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Dev tool: phase-level timing of one streaming replay — where does
  * the wall time of a stream_* bench row actually go (plan/start,
  * micro-batch execution, stop, sink read)?
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-streamprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    for (round <- 1 to 3) {
      println(s"=== round $round: watermark window agg over events ===")
      val schema = graft.sources.Tables.eventsRawSchema(spark, sfDir)
      val src = java.nio.file.Paths.get(sfDir, "events.parquet")
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_src")
      java.nio.file.Files.createSymbolicLink(tmp.resolve("events.parquet"), src)
      val stream = graft.sources.Tables.normalizeEventsTs(
        spark.readStream.schema(schema).parquet(tmp.toString))
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val name = "probe_" + UUID.randomUUID().toString.replace("-", "")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val q = t("start()") {
        agg.writeStream.outputMode(OutputMode.Complete())
          .format("memory").queryName(name).start()
      }
      t("processAllAvailable()")(q.processAllAvailable())
      t("stop()")(q.stop())
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      t("sink count")(spark.table(name).count())
    }
    spark.stop()
  }
}
