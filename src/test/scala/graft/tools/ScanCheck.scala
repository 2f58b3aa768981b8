package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: report the per-task row distribution of a raw parquet
  * scan under the bench session configuration — answers whether a
  * single-row-group file actually serializes the scan stage.
  */
object ScanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scancheck")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("lineitem", "orders", "events", "documents")) {
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val parts = df.rdd.getNumPartitions
      val dist = df.groupBy(spark_partition_id().as("pid"))
        .count().orderBy(desc("count")).collect()
      val nonEmpty = dist.length
      val top = dist.take(3).map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(", ")
      println(s"$t: planParts=$parts nonEmptyParts=$nonEmpty top=[$top]")
    }
    spark.stop()
  }
}
