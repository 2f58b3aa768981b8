package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Contiguous global rank WITHOUT a single-partition sort — the
  * DataFrame spelling of `zipWithIndex`: range-partition on the sort
  * key, `row_number` WITHIN each partition, then add broadcast
  * per-partition prefix offsets. The offsets collect is
  * partition-count-sized (never row-scale), so the plan carries no
  * SinglePartition Exchange at any data size. The same scaffold
  * provides the row-scale cumulative sum and exact ntile (q133/q142-
  * class sweeps) that a plain `Window.orderBy(...)` would funnel
  * through one reducer.
  *
  * Sort keys must order rows uniquely for exact results (ties would
  * be broken by physical row order within a partition).
  */
object DistributedRank {

  /** Shared two-pass scaffold: pin the range-partitioned layout (so
    * the offsets job and the consuming job see the SAME partition
    * assignment), collect one LONG per (partition) via `perPid`,
    * prefix-fold it into broadcast offsets `(_pp_pid, _pp_off)`, and
    * hand both to `build`. A partition whose aggregate is NULL (e.g.
    * summing an all-null slice) contributes 0. Returns build's frame
    * plus the release thunk for the internal pin.
    */
  private def withPrefixOffsets(
      df: DataFrame,
      sortExprs: Seq[Column],
      numPartitions: Int,
      perPid: Column
  )(build: (DataFrame, DataFrame) => DataFrame): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df.repartitionByRange(numPartitions, sortExprs: _*)
      .withColumn("_pp_pid", spark_partition_id())
      .cache()
    val vals = ranged.groupBy(col("_pp_pid")).agg(perPid.as("v"))
      .collect()
      .map(r => (r.getInt(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    var running = 0L
    val offDf = vals.toSeq
      .map { case (p, v) => val o = running; running += v; (p, o) }
      .toDF("_pp_pid", "_pp_off")
    (build(ranged, broadcast(offDf)), () => ranged.unpersist(false))
  }

  /** Append `rankCol` (1-based long) ranking `df` by `sortCol`
    * ascending across `numPartitions` range partitions. Returns the
    * ranked frame plus a release thunk dropping the internal
    * range-partitioned pin — call it once the ranked frame (or a
    * downstream cache of it) has materialized.
    */
  def withContiguousRank(
      df: DataFrame,
      sortCol: String,
      rankCol: String,
      numPartitions: Int
  ): (DataFrame, () => Unit) =
    withContiguousRank(df, Seq(col(sortCol)), rankCol, numPartitions)

  /** Composite-sort variant: `sortExprs` may mix directions (e.g.
    * `Seq(col("s").desc, col("id"))`) but must order rows uniquely.
    */
  def withContiguousRank(
      df: DataFrame,
      sortExprs: Seq[Column],
      rankCol: String,
      numPartitions: Int
  ): (DataFrame, () => Unit) =
    withPrefixOffsets(df, sortExprs, numPartitions, count(lit(1))) {
      (ranged, offDf) =>
        val wp = Window.partitionBy(col("_pp_pid")).orderBy(sortExprs: _*)
        ranged.join(offDf, Seq("_pp_pid"))
          .withColumn(rankCol, col("_pp_off") + row_number().over(wp))
          .drop("_pp_pid", "_pp_off")
    }

  /** Append `cumCol` = running sum of LONG column `valueCol` in
    * `sortExprs` order (rows-between unbounded-preceding..current),
    * computed without a single-partition window: per-partition
    * running sums plus broadcast prefix-sum offsets. NULL values
    * count as 0 (SUM semantics). Returns the frame plus the release
    * thunk for the internal pin.
    */
  def withPartitionedCumsum(
      df: DataFrame,
      sortExprs: Seq[Column],
      valueCol: String,
      cumCol: String,
      numPartitions: Int
  ): (DataFrame, () => Unit) = {
    require(df.schema(valueCol).dataType == LongType,
      s"withPartitionedCumsum needs a LONG value column; '$valueCol' is " +
      s"${df.schema(valueCol).dataType.simpleString}")
    withPrefixOffsets(df, sortExprs, numPartitions, sum(col(valueCol))) {
      (ranged, offDf) =>
        val wp = Window.partitionBy(col("_pp_pid")).orderBy(sortExprs: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ranged.join(offDf, Seq("_pp_pid"))
          .withColumn(cumCol, col("_pp_off") + sum(col(valueCol)).over(wp))
          .drop("_pp_pid", "_pp_off")
    }
  }

  /** Exact long integer division a / b (b > 0 literal, a >= 0): the
    * remainder is removed in LONG arithmetic and the now-divisible
    * quotient is taken in DECIMAL — Spark's plain `/` divides as
    * DOUBLE, whose 2^53 mantissa would mis-place tile boundaries at
    * row counts a 100 TB table actually reaches.
    */
  private def exactDiv(a: Column, b: Long): Column =
    ((a - pmod(a, lit(b))).cast("decimal(38,0)") /
      lit(b).cast("decimal(38,0)")).cast("long")

  /** Exact `ntile(k)` over `sortExprs` order WITHOUT a single-
    * partition window — standard SQL tile sizing (the first
    * n mod k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋; identical to
    * Spark's and DuckDB's ntile), derived in exact integer
    * arithmetic from the contiguous rank and the total count.
    */
  def withNtile(
      df: DataFrame,
      sortExprs: Seq[Column],
      k: Int,
      tileCol: String,
      numPartitions: Int
  ): (DataFrame, () => Unit) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (ranked0, release) =
      withContiguousRank(df, sortExprs, "_nt_rank", numPartitions)
    val ranked = ranked0.cache()
    val n = ranked.count()
    release()
    val big = n / k + (if (n % k > 0) 1L else 0L) // ceil(n/k)
    val small = n / k
    val rem = n % k
    val r = col("_nt_rank")
    val tile =
      if (small == 0L) r // fewer rows than tiles: tile = rank
      else when(r <= lit(rem * big), exactDiv(r - 1L, big) + 1L)
        .otherwise(lit(rem) + exactDiv(r - lit(rem * big) - 1L, small) + 1L)
    val out = ranked.withColumn(tileCol, tile.cast("long")).drop("_nt_rank")
    (out, () => ranked.unpersist(false))
  }
}
