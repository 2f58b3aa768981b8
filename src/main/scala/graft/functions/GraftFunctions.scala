package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column helpers shared across the operator modules.
  *
  * == Oracle-exact numeric policy ==
  * The verify harness hash-compares our results against DuckDB. Plain
  * `sum(double)` is add-order-dependent (Spark sums per-partition, the
  * oracle sums sequentially), so money-style aggregates here run
  * through exact decimal arithmetic: cast each term to a decimal wide
  * enough to hold it exactly, sum (decimal addition is exact), and cast
  * the final result back to double. Both engines then produce
  * bit-identical doubles. Integral-valued doubles (quantities, counts)
  * are exact in IEEE double and need no cast.
  */
object GraftFunctions {

  /** Fan a small scan out BY NUMBER before a heavy per-row kernel —
    * the CLAUDE.md tiny-input fan-out rule in one place. Bench-scale
    * tables are 1-3 parquet splits, so tokenize/shingle/regex/edit-
    * distance kernels otherwise run on a fraction of the task slots;
    * a keyed/by-col repartition of so small a shuffle gets coalesced
    * straight back to one partition by AQE, so it must be by-number.
    * At 100 TB the scan has thousands of splits and this shuffle of
    * slim rows sizes with the cluster — harmless.
    */
  def fanOut(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Money column (2 fractional digits) as an exact decimal term. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Rate column (discount/tax, 2 fractional digits, < 10). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Generic double as exact 6-fractional-digit decimal term. */
  def dec6(c: Column): Column = c.cast(DecimalType(25, 6))

  /** Exact sum of a money column, returned as double. */
  def sumMoney(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact sum of an arbitrary double column (6-digit grain). */
  def sumDec(c: Column): Column = sum(dec6(c)).cast(DoubleType)

  /** Exact average of a money column (exact sum / count). */
  def avgMoney(c: Column): Column =
    sum(dec2(c)).cast(DoubleType) / count(lit(1))

  /** `1 - rate` as an exact decimal. */
  def oneMinus(c: Column): Column = lit(1).cast(DecimalType(4, 2)) - rate(c)

  /** `1 + rate` as an exact decimal. */
  def onePlus(c: Column): Column = lit(1).cast(DecimalType(4, 2)) + rate(c)

  /** Timestamp rendered as a sortable string (avoids tz/precision
    * ambiguity in cross-engine comparison).
    */
  def tsString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Cosine similarity between two double-array columns — the codegen
    * VecMath expression; same sequential fold order as the HOF
    * formulation it replaced (bit-stable across engines for identical
    * inputs). Arrays must be same length.
    */
  def cosineSim(a: Column, b: Column): Column = graft.plans.VecMath.cosine(a, b)

  /** Dot product of two double-array columns (sequential fold,
    * codegen'd).
    */
  def dotProduct(a: Column, b: Column): Column = graft.plans.VecMath.dot(a, b)

  /** L2 norm of a double-array column (sequential fold, codegen'd). */
  def l2Norm(a: Column): Column = graft.plans.VecMath.l2(a)

  /** Array<float> → array<double> (exact widening, both engines) —
    * a direct Cast, not a per-element transform lambda.
    */
  def toDoubleArray(c: Column): Column = c.cast("array<double>")
}
