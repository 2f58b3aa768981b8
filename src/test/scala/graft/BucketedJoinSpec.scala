package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q34's whole point: the bucketed-warehouse join + bucket-key
  * aggregation runs with ZERO exchanges — no shuffle, no broadcast —
  * and still matches the plain (shuffling) formulation row-for-row.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed join + agg plan has no exchange and matches the plain join") {
    val df = SparkEntry.queries("q34_bucketed_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed custkey join/agg must be exchange-free; got:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")

    val t = graft.sources.Tables(spark, sf)
    val plain = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(graft.functions.GraftFunctions.dec2(col("o_totalprice")))
          .cast("double").as("sum_price"))
    assert(df.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
  }

  test("repeated runs reuse the warehouse database without error") {
    val again = SparkEntry.queries("q34_bucketed_join")(spark, sf)
    assert(again.count() > 0)
  }
}
