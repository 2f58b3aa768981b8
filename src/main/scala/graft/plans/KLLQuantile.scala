package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** KLL streaming quantile sketch (Karnin–Lang–Liberty 2016): a
  * hierarchy of compactors where level-i items carry weight 2^i.
  * When the sketch overflows, the lowest full level is sorted and a
  * random half of its pairs promoted one level up — total weight is
  * conserved exactly, memory stays O(k · log(n/k)), and two sketches
  * MERGE losslessly level-by-level, which is what makes it an
  * aggregation-tree citizen at 100 TB (unlike exact percentiles,
  * whose state is the data). Rank error is O(1/k) with high
  * probability; KLLQuantileSpec pins an empirical bound.
  *
  * This is the engine-owned counterpart of q33's built-in
  * percentile_approx (Greenwald–Khanna): same posture, independent
  * machinery, exercising the full custom-sketch stack
  * (TypedImperativeAggregate with binary serialize/merge).
  */
final class KLLSketch(val k: Int) extends Serializable {
  require(k >= 8, s"k must be >= 8, got $k")

  /** levels(i): unsorted items of weight 2^i. */
  private[graft] val levels = ArrayBuffer(new ArrayBuffer[Double])
  private[graft] var n: Long = 0L
  // deterministic per-instance coin for compaction parity; fresh after
  // deserialize — sketch guarantees are probabilistic either way
  @transient private lazy val rng = new java.util.Random(0x6b11aa5eL + k)

  private def capacity(level: Int): Int = {
    // top level holds ~k items; lower levels shrink by (2/3)^depth
    val depth = levels.length - 1 - level
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth)).toInt)
  }
  private def size: Int = {
    var s = 0; var i = 0
    while (i < levels.length) { s += levels(i).length; i += 1 }
    s
  }
  // both are consulted on EVERY update — recomputing them per row
  // (range-map + math.pow per level) dominated the whole aggregation,
  // so they are tracked incrementally and refreshed only when a
  // compaction/merge/deserialize restructures the levels
  private var curSize: Int = 0
  private var totalCap: Int = -1
  private[graft] def refreshCaches(): Unit = {
    curSize = size
    totalCap = { var c = 0; var i = 0
      while (i < levels.length) { c += capacity(i); i += 1 }; c }
  }
  refreshCaches()

  def update(v: Double): Unit = {
    levels(0) += v
    n += 1L
    curSize += 1
    if (curSize > totalCap) compress()
  }

  def merge(o: KLLSketch): Unit = {
    var i = 0
    while (i < o.levels.length) {
      while (levels.length <= i) levels += new ArrayBuffer[Double]
      levels(i) ++= o.levels(i)
      i += 1
    }
    n += o.n
    refreshCaches()
    while (curSize > totalCap) compress()
  }

  private def compress(): Unit = {
    var i = 0
    var done = false
    while (!done && i < levels.length) {
      if (levels(i).length >= capacity(i) && levels(i).length >= 2) {
        compactLevel(i); done = true
      }
      i += 1
    }
    // every level under capacity but total over (can happen right
    // after a merge doubles level counts): compact the fullest level
    if (!done) {
      val fullest = (0 until levels.length).maxBy(levels(_).length)
      if (levels(fullest).length >= 2) compactLevel(fullest)
    }
  }

  /** Sort the level, park one unpaired item if the count is odd, and
    * promote a random parity of the remaining pairs — each surviving
    * item doubles its weight, so total weight is conserved exactly.
    */
  private def compactLevel(i: Int): Unit = {
    val sorted = levels(i).toArray
    java.util.Arrays.sort(sorted)
    if (i + 1 == levels.length) levels += new ArrayBuffer[Double]
    val start = sorted.length % 2 // odd count: sorted(0) stays behind
    var j = start + (if (rng.nextBoolean()) 0 else 1)
    while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
    levels(i).clear()
    if (start == 1) levels(i) += sorted(0)
    refreshCaches() // level sizes (and possibly level count) changed
  }

  /** Smallest value whose cumulative weight reaches q of the total —
    * the same rule an exact weighted percentile uses, so a sketch
    * that never compacted returns the exact answer.
    */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0,1]")
    require(n > 0, "empty sketch")
    var m = 0; var i = 0
    while (i < levels.length) { m += levels(i).length; i += 1 }
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var p = 0
    i = 0
    while (i < levels.length) {
      val w = 1L << i
      val lv = levels(i)
      var j = 0
      while (j < lv.length) { vals(p) = lv(j); wts(p) = w; p += 1; j += 1 }
      i += 1
    }
    val order = (0 until m).sortBy(i => vals(i))
    val total = wts.sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var oi = 0
    while (oi < m) {
      cum += wts(order(oi))
      if (cum >= target) return vals(order(oi))
      oi += 1
    }
    vals(order(m - 1))
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(n); out.writeInt(levels.length)
    levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object KLLSketch {
  def deserialize(bytes: Array[Byte]): KLLSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new KLLSketch(in.readInt())
    sk.n = in.readLong()
    val nLevels = in.readInt()
    var i = 0
    while (i < nLevels) {
      while (sk.levels.length <= i) sk.levels += new ArrayBuffer[Double]
      val len = in.readInt()
      var j = 0
      while (j < len) { sk.levels(i) += in.readDouble(); j += 1 }
      i += 1
    }
    sk.refreshCaches()
    sk
  }
}

/** Catalyst-native KLL quantile aggregate: the buffer is the sketch
  * object itself, partials merge as binary sketch unions — the
  * aggregation shape every production sketch uses (HLL++,
  * percentile_approx) applied to an engine-owned implementation.
  * Emits array<double>, one value per requested quantile; null for an
  * empty group.
  */
case class KLLQuantiles(
    child: Expression,
    quantiles: Seq[Double],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KLLSketch] with UnaryLike[Expression] {

  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
    s"quantiles must be in [0,1], got $quantiles")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KLLSketch = new KLLSketch(k)

  override def update(buffer: KLLSketch, input: InternalRow): KLLSketch = {
    // the Column builder casts to double; accept any numeric backing
    // for direct Expression construction (ImplicitCastInputTypes is
    // private[sql], so implicit coercion isn't available out here)
    child.eval(input) match {
      case null                                        => ()
      case d: java.lang.Double                         => buffer.update(d)
      case d: org.apache.spark.sql.types.Decimal       => buffer.update(d.toDouble)
      case x: java.lang.Number                         => buffer.update(x.doubleValue())
      case other => throw new IllegalArgumentException(
        s"kll_quantiles needs numeric input, got ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: KLLSketch, other: KLLSketch): KLLSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KLLSketch): Any =
    if (buffer.n == 0L) null
    else ArrayData.toArrayData(quantiles.map(buffer.quantile).toArray)

  override def serialize(buffer: KLLSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KLLSketch =
    KLLSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): KLLQuantiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KLLQuantiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KLLQuantiles =
    copy(child = newChild)
}

object KLLQuantiles {
  /** Column API: `KLLQuantiles.agg($"x", Seq(0.5, 0.95), k = 200)`.
    * Numeric inputs are cast to double here.
    */
  def agg(c: Column, qs: Seq[Double], k: Int = 200): Column =
    GraftColumnBridge.column(
      KLLQuantiles(GraftColumnBridge.expression(c.cast("double")), qs, k)
        .toAggregateExpression())
}
