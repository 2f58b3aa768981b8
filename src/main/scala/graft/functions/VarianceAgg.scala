package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF (SURVEY §2.6 UDF/UDAF row): sample variance via
  * exact decimal moment sums.
  *
  * The buffer carries Σx and Σx² as BigDecimals so partial aggregation
  * is exact and merge order can't perturb the result — the same
  * bit-stability policy GraftFunctions applies to money sums, extended
  * to a user-defined aggregate. Final variance = (Σx² − (Σx)²/n)/(n−1)
  * evaluated in double, matching the oracle's formulation exactly.
  */
/** (n, Σx, Σx²) with exact decimal sums (inputs quantized to 1e-6). */
final case class VarBuf(n: Long, sum: BigDecimal, sumSq: BigDecimal)

object VarianceAgg extends Aggregator[Double, VarBuf, Double] {
  type Buf = VarBuf

  private val grain = new java.math.MathContext(38)

  override def zero: VarBuf = VarBuf(0L, BigDecimal(0, grain), BigDecimal(0, grain))

  override def reduce(b: VarBuf, x: Double): VarBuf = {
    // quantize to 6 fractional digits (same grain as dec6) so the
    // decimal arithmetic is exact and engine-independent
    val d = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    VarBuf(b.n + 1, b.sum + d, b.sumSq + d * d)
  }

  override def merge(a: VarBuf, b: VarBuf): VarBuf =
    VarBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)

  override def finish(b: VarBuf): Double =
    if (b.n < 2) Double.NaN
    else {
      val n = b.n.toDouble
      val sum = b.sum.toDouble
      val sumSq = b.sumSq.toDouble
      (sumSq - sum * sum / n) / (n - 1)
    }

  override def bufferEncoder: Encoder[VarBuf] = Encoders.product[VarBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
