package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  // events.parquet carries TIMESTAMP(NANOS), which vanilla Spark
  // refuses; read it as long nanos and rebuild a micro-precision
  // timestamp (integer division ⇒ same truncation DuckDB applies).
  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    load("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
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
