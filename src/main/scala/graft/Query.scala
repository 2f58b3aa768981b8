package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query exposed through [[SparkEntry]].
  *
  * @param name   stable identifier (drives the verify/bench harness)
  * @param run    builds the DataFrame from a session + scale-factor dir
  * @param oracle equivalent ANSI SQL for the DuckDB oracle; None for
  *               ops whose semantics aren't SQL-expressible (those get
  *               a rows-only check plus their own ScalaTest oracle)
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object GraftQuery {
  /** Collect modules' query lists into the SparkEntry maps. */
  def toMaps(
      qs: Seq[GraftQuery]
  ): (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val queries = qs.map(q => q.name -> q.run).toMap
    val oracles = qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
    (queries, oracles)
  }
}
