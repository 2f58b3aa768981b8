package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev loop: dump ONLY the named queries (comma-separated substring
  * match) to outDir in the same layout graft.Verify uses, so
  * tools/check_oracle.py can gate a single new query without paying
  * the full 67-query sweep.
  *
  * Usage: sbt "Test/runMain graft.tools.QueryCheck <sfDir> <outDir> <names>"
  */
object QueryCheck {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          println(s"[querycheck] dumped $name")
        } catch { case e: Throwable =>
          System.err.println(s"[querycheck] $name FAILED: ${e.getMessage}")
        }
      }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
