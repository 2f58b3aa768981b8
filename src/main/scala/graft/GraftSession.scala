package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * Local runs use `local[N]`; the same config block is what a cluster
  * deployment would carry (AQE on, skew-join handling on, partition
  * coalescing on). Shuffle partitions default to the local core count —
  * on a real cluster this is overridden to ~2-3x total cores, and AQE
  * coalesces down from there.
  */
object GraftSession {

  /** Build a local session. `cores` drives both task slots and the
    * shuffle-partition default so local plans don't fan into 200 tiny
    * partitions.
    */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
