package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bridge to Spark's internal Bloom-filter expressions (the machinery
  * behind runtime row-group filtering, SPARK-32268): a mergeable
  * BloomFilterAggregate build plus the codegen'd might-contain probe.
  * Both sides hash through XxHash64 with the default seed, matching
  * how Spark's own runtime filters pair them. Exposed here because
  * the expressions are catalyst-private; same pattern as
  * [[GraftColumnBridge]].
  */
object GraftSketchBridge {
  import GraftColumnBridge._

  /** Aggregate a column into a serialized Bloom filter (binary). */
  def bloomAgg(value: Column, estimatedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(
      XxHash64(Seq(expression(value)), 42L),
      Literal(estimatedItems),
      Literal(numBits)).toAggregateExpression())

  /** Probe a DRIVER-HELD serialized filter (small, broadcast as a
    * literal into codegen) for a value. False positives possible,
    * false negatives never.
    */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    column(BloomFilterMightContain(
      Literal(bloomBytes),
      XxHash64(Seq(expression(value)), 42L)))
}
