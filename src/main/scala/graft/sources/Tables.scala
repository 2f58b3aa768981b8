package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Parquet loaders for the test-table star schema (TESTDATA.md /
  * FIXTURES.md §2). Each accessor is a fresh lazy scan — Catalyst
  * prunes columns and pushes filters into the vectorized Parquet
  * reader, so callers should select/filter directly on these.
  *
  * The reference engine delegates all ingest to its host dataframe
  * library (reference `README.rst:36-39`); here the equivalent surface
  * is `spark.read` itself, wrapped for the known tables.
  */
final case class Tables(spark: SparkSession, dir: String) {

  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")

  /** Events with `ts` normalized to micro-precision TimestampType
    * regardless of how the producer wrote it — see
    * [[Tables.normalizeEventsTs]] for the supported physical schemas.
    */
  def events: DataFrame = Tables.normalizeEventsTs(Tables.eventsRaw(spark, dir))

  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")

  /** Register every table as a temp view so `spark.sql` queries can
    * reference them by name (same names the DuckDB oracle uses).
    */
  def registerAll(): Unit = {
    Seq(
      "region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings"
    ).foreach(n => load(n).createOrReplaceTempView(n))
    events.createOrReplaceTempView("events")
  }
}

object Tables {

  /** Raw batch scan of events.parquet. Plain read first; only if the
    * file carries TIMESTAMP(NANOS) — which vanilla Spark refuses —
    * fall back to the legacy nanos-as-long read. Scoping the legacy
    * flag to the failure path keeps it from leaking into unrelated
    * reads on the shared session when the data is ordinary micros.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    try spark.read.parquet(path)
    catch {
      case e: Throwable if isNanosRefusal(e) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }
  }

  private def isNanosRefusal(e: Throwable): Boolean = {
    val msg = Option(e.getMessage).getOrElse("")
    msg.contains("NANOS") || msg.contains("nanosAsLong") ||
      msg.contains("Illegal Parquet type")
  }

  /** Schema of events.parquet as the engine reads it (post legacy-flag
    * fallback) — the stream source needs it up front.
    */
  def eventsRawSchema(spark: SparkSession, dir: String): StructType =
    eventsRaw(spark, dir).schema

  /** Normalize the `ts` column to TimestampType (session tz is pinned
    * UTC) across the physical encodings the testdata generator has
    * produced over time:
    *   - INT64 nanos read as long (legacy nanosAsLong) → integer-divide
    *     to micros (same truncation DuckDB applies) and rebuild;
    *   - TIMESTAMP(MICROS) isAdjustedToUTC=false → TIMESTAMP_NTZ; cast
    *     to TimestampType, a wall-clock no-op under the UTC session;
    *   - already TimestampType → pass through.
    * A schema this reader does not recognize fails LOUDLY here rather
    * than hash-mismatching 30 queries downstream.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    val tsField = df.schema.fields.find(_.name == "ts").getOrElse(
      sys.error(s"events: no `ts` column in schema ${df.schema.treeString}"))
    tsField.dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        sys.error(
          s"events: unsupported ts type $other — teach Tables.normalizeEventsTs " +
            "about this encoding (testdata generator changed again?)")
    }
  }
}
