package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.functions.{when, xxhash64}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** WEIGHTED theta/KMV sketch: estimates Σ w(key) over DISTINCT keys —
  * "total spend of distinct users", "total bytes of distinct
  * documents" — in one pass and k·16 bytes of state. The k smallest
  * distinct key hashes are retained TOGETHER WITH their key's weight;
  * below capacity the retained set is exact, at capacity the items
  * strictly below θ (the k-th minimum) form a uniform θ-probability
  * sample of the distinct keys and the Horvitz–Thompson estimate
  * Σ_retained w / θ is unbiased (w ≡ 1 degenerates to the (k−1)/θ
  * distinct estimate of [[ThetaSketch]]). Like the unweighted sketch
  * it composes as a SET: per-group sketches union into a global one
  * with no rescan — the weight of a key seen in multiple groups is
  * counted once, which no additive aggregate can do.
  *
  * The weight must be a function of the key (a dimension attribute);
  * for duplicate key arrivals the first-seen weight wins, and the
  * k-min set (hence the estimate) is arrival-order independent.
  */
final class WeightedThetaSketch(val k: Int) extends Serializable {
  require(k >= 16, s"k must be >= 16, got $k")

  /** k smallest distinct hashes (unsigned order) → key weight. */
  private[graft] val mins =
    new java.util.TreeMap[java.lang.Long, java.lang.Double](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })

  def update(h: Long, w: Double): Unit = {
    if (mins.containsKey(h)) return
    if (mins.size < k) { mins.put(h, w); () }
    else if (java.lang.Long.compareUnsigned(h, mins.lastKey) < 0) {
      mins.put(h, w)
      mins.pollLastEntry()
      ()
    }
  }

  def merge(o: WeightedThetaSketch): Unit = {
    val it = o.mins.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); update(e.getKey, e.getValue) }
  }

  /** Weighted-distinct-sum estimate. Iteration over the TreeMap is in
    * fixed unsigned-hash order, so the double accumulation is
    * deterministic for a given data set regardless of arrival or
    * partitioning order.
    */
  def estimateSum(): Double =
    if (mins.size < k) {
      var s = 0.0
      val it = mins.values().iterator()
      while (it.hasNext) s += it.next()
      s
    } else {
      val thetaHash = mins.lastKey
      val theta = (thetaHash >>> 11).toDouble / (1L << 53).toDouble
      var s = 0.0
      val it = mins.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        // strictly below θ: the k-th min defines the boundary and is
        // excluded (its inclusion probability is not θ)
        if (java.lang.Long.compareUnsigned(e.getKey, thetaHash) < 0) s += e.getValue
      }
      s / theta
    }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(mins.size)
    val it = mins.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeLong(e.getKey); out.writeDouble(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
}

object WeightedTheta {
  def deserialize(bytes: Array[Byte]): WeightedThetaSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new WeightedThetaSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { sk.mins.put(in.readLong(), in.readDouble()); i += 1 }
    sk
  }

  /** Serialized weighted sketch of (key, weight) rows (binary) — the
    * group-level build; keys hash through codegen'd xxhash64 upstream.
    */
  def sketchAgg(key: Column, weight: Column, k: Int = 4096): Column =
    GraftColumnBridge.column(
      WeightedThetaAgg(
        GraftColumnBridge.expression(when(key.isNotNull, xxhash64(key))),
        GraftColumnBridge.expression(weight.cast("double")),
        k, emitBinary = true).toAggregateExpression())

  /** Weighted-distinct-sum estimate of (key, weight) rows (double). */
  def estimateAgg(key: Column, weight: Column, k: Int = 4096): Column =
    GraftColumnBridge.column(
      WeightedThetaAgg(
        GraftColumnBridge.expression(when(key.isNotNull, xxhash64(key))),
        GraftColumnBridge.expression(weight.cast("double")),
        k, emitBinary = false).toAggregateExpression())

  /** Weighted-distinct-sum estimate of the UNION of serialized
    * sketches (double) — the rollup: group sketches in, one estimate
    * of the deduplicated union out, first-seen weight per key.
    */
  def unionAgg(sketches: Column): Column =
    GraftColumnBridge.column(
      WeightedThetaUnionAgg(GraftColumnBridge.expression(sketches))
        .toAggregateExpression())
}

/** Build aggregate: children are (pre-hashed key, double weight). */
case class WeightedThetaAgg(
    left: Expression,
    right: Expression,
    k: Int,
    emitBinary: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[WeightedThetaSketch] with BinaryLike[Expression] {

  override def dataType: DataType = if (emitBinary) BinaryType else DoubleType
  override def nullable: Boolean = emitBinary
  override def prettyName: String = "weighted_theta"

  override def createAggregationBuffer(): WeightedThetaSketch =
    new WeightedThetaSketch(k)

  override def update(
      buffer: WeightedThetaSketch, input: InternalRow): WeightedThetaSketch = {
    left.eval(input) match {
      case null    => ()
      case h: Long =>
        right.eval(input) match {
          case null      => () // null weight: skip, like a null key
          case w: Double => buffer.update(h, w)
          case other => throw new IllegalArgumentException(
            s"weighted_theta expects a double weight, got ${other.getClass}")
        }
      case other => throw new IllegalArgumentException(
        s"weighted_theta expects a pre-hashed long key, got ${other.getClass}")
    }
    buffer
  }

  override def merge(
      buffer: WeightedThetaSketch, other: WeightedThetaSketch): WeightedThetaSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: WeightedThetaSketch): Any =
    if (emitBinary) buffer.serialize() else buffer.estimateSum()

  override def serialize(buffer: WeightedThetaSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): WeightedThetaSketch =
    WeightedTheta.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): WeightedThetaAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): WeightedThetaAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedThetaAgg =
    copy(left = newLeft, right = newRight)
}

/** Union aggregate over serialized weighted sketches (k adopted from
  * the first non-empty sketch, mirroring ThetaUnionAgg).
  */
case class WeightedThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[WeightedThetaSketch] with UnaryLike[Expression] {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "weighted_theta_union"

  override def createAggregationBuffer(): WeightedThetaSketch =
    new WeightedThetaSketch(16)

  private def absorb(
      buffer: WeightedThetaSketch, o: WeightedThetaSketch): WeightedThetaSketch =
    if (buffer.mins.isEmpty && buffer.k != o.k) { o.merge(buffer); o }
    else { buffer.merge(o); buffer }

  override def update(
      buffer: WeightedThetaSketch, input: InternalRow): WeightedThetaSketch =
    child.eval(input) match {
      case null           => buffer
      case b: Array[Byte] => absorb(buffer, WeightedTheta.deserialize(b))
      case other => throw new IllegalArgumentException(
        s"weighted_theta_union expects a serialized sketch, got ${other.getClass}")
    }

  override def merge(
      buffer: WeightedThetaSketch, other: WeightedThetaSketch): WeightedThetaSketch =
    absorb(buffer, other)

  override def eval(buffer: WeightedThetaSketch): Any = buffer.estimateSum()

  override def serialize(buffer: WeightedThetaSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): WeightedThetaSketch =
    WeightedTheta.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): WeightedThetaUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): WeightedThetaUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): WeightedThetaUnionAgg =
    copy(child = newChild)
}
