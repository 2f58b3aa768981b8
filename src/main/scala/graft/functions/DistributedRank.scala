package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global rank WITHOUT a single-partition sort — the
  * DataFrame spelling of `zipWithIndex`: range-partition on the sort
  * key, `row_number` WITHIN each partition, then add broadcast
  * per-partition prefix offsets. The offsets collect is
  * partition-count-sized (never row-scale), so the plan carries no
  * SinglePartition Exchange at any data size. This is also the
  * scalable form of a row-scale cumulative sum (rank the keys, then
  * prefix-aggregate per partition + offset) — see SCALING.md's
  * q133_abc note.
  *
  * The sort key must be globally unique for the rank to be exact
  * (ties would be broken by physical row order within a partition).
  */
object DistributedRank {

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
      sortExprs: Seq[org.apache.spark.sql.Column],
      rankCol: String,
      numPartitions: Int
  ): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    // pin the ranged layout so the counts job and the rank job see
    // the SAME partition assignment
    val ranged = df.repartitionByRange(numPartitions, sortExprs: _*)
      .withColumn("_rank_pid", spark_partition_id())
      .cache()
    val cnts = ranged.groupBy(col("_rank_pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var running = 0L
    val offDf = cnts.toSeq
      .map { case (p, c) => val o = running; running += c; (p, o) }
      .toDF("_rank_pid", "_rank_off")
    val wp = Window.partitionBy(col("_rank_pid")).orderBy(sortExprs: _*)
    val ranked = ranged.join(broadcast(offDf), Seq("_rank_pid"))
      .withColumn(rankCol, col("_rank_off") + row_number().over(wp))
      .drop("_rank_pid", "_rank_off")
    (ranked, () => ranged.unpersist(false))
  }

  /** Exact `ntile(k)` over `sortExprs` order WITHOUT a single-
    * partition window — standard SQL tile sizing (the first
    * n mod k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋; identical to
    * Spark's and DuckDB's ntile), derived arithmetically from the
    * contiguous rank and the total count.
    */
  def withNtile(
      df: DataFrame,
      sortExprs: Seq[org.apache.spark.sql.Column],
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
      else when(r <= lit(rem * big), (r - 1L) / lit(big) + 1L)
        .otherwise(lit(rem) + (r - lit(rem * big) - 1L) / lit(small) + 1L)
    val out = ranked.withColumn(tileCol, tile.cast("long")).drop("_nt_rank")
    (out, () => ranked.unpersist(false))
  }

  /** Append `cumCol` = running sum of LONG column `valueCol` in
    * `sortExprs` order (rows-between unbounded-preceding..current),
    * computed WITHOUT a single-partition window: range partition on
    * the sort expressions, per-partition running sum, broadcast
    * per-partition prefix-sum offsets. The row-scale cumulative
    * (q133-class ABC/Pareto sweeps) that a plain
    * `Window.orderBy(...)` would funnel through one reducer.
    *
    * The sort expressions must order rows uniquely (ties would make
    * the running sum depend on physical order). Returns the frame
    * plus a release thunk for the internal range-partitioned pin —
    * call it after the result (or a downstream cache) materializes.
    */
  def withPartitionedCumsum(
      df: DataFrame,
      sortExprs: Seq[org.apache.spark.sql.Column],
      valueCol: String,
      cumCol: String,
      numPartitions: Int
  ): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df.repartitionByRange(numPartitions, sortExprs: _*)
      .withColumn("_cs_pid", spark_partition_id())
      .cache()
    val sums = ranged.groupBy(col("_cs_pid"))
      .agg(sum(col(valueCol)).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var running = 0L
    val offDf = sums.toSeq
      .map { case (p, v) => val o = running; running += v; (p, o) }
      .toDF("_cs_pid", "_cs_off")
    val wp = Window.partitionBy(col("_cs_pid")).orderBy(sortExprs: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged.join(broadcast(offDf), Seq("_cs_pid"))
      .withColumn(cumCol, col("_cs_off") + sum(col(valueCol)).over(wp))
      .drop("_cs_pid", "_cs_off")
    (out, () => ranged.unpersist(false))
  }
}
