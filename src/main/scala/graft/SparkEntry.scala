package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query list into the maps the
  * verify/bench harness consumes. Each module owns its queries and
  * their DuckDB oracle SQL side by side.
  */
object SparkEntry {

  private def modules: Seq[GraftQuery] =
    Relational.all ++ TpchShapes.all ++ Temporal.all ++ Analytics.all ++ Graph.all ++
      Mining.all ++
      graft.ml.MLQueries.all ++ TextAnalysis.all ++ Dedup.all ++
      Similarity.all ++ Multimodal.all ++ graft.streaming.EventsStream.all ++
      graft.streaming.KafkaShape.all

  private lazy val (queryMap, oracleMap) = GraftQuery.toMaps(modules)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = oracleMap
}
