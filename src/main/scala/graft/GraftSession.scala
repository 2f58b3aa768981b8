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

  /** Streaming state-store provider class for `stateStore = "rocksdb"`:
    * state lives off-heap in RocksDB instances per partition instead
    * of the default in-memory HDFS-backed map. At 100 TB key domains
    * (billions of session/join keys) the default provider is executor-
    * memory-bound; RocksDB is the posture that survives, at a small
    * constant per-access cost that only shows at tiny state sizes.
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Default state-store choice: `-Dgraft.stateStore=rocksdb` or env
    * `GRAFT_STATE_STORE=rocksdb` opts the whole session in; "hdfs"
    * (the Spark default) otherwise, keeping small-SF benchmarks on
    * the cheaper in-memory path. RocksDbStateStoreSpec pins that both
    * providers produce identical stream results.
    */
  def defaultStateStore: String =
    sys.props.get("graft.stateStore")
      .orElse(sys.env.get("GRAFT_STATE_STORE"))
      .getOrElse("hdfs")

  /** Build a local session. `cores` drives both task slots and the
    * shuffle-partition default so local plans don't fan into 200 tiny
    * partitions. `stateStore` = "hdfs" | "rocksdb" (see
    * [[defaultStateStore]]).
    */
  def local(cores: Int = 32, appName: String = "graft",
      stateStore: String = defaultStateStore): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      // let small parquet files split down to ~totalBytes/parallelism:
      // the default 4 MB open-cost floor leaves the bench-scale tables
      // at 1-3 splits, so scan-side kernels (tokenize/shingle/regex)
      // and the ML loops' per-round histogram passes run on a fraction
      // of the task slots. Scale-safe: open cost only binds for SMALL
      // files — at 100 TB splits are maxPartitionBytes-bound (default
      // 128 MB, untouched) and this setting is inert.
      .config("spark.sql.files.openCostInBytes", (64 * 1024).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (stateStore == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
