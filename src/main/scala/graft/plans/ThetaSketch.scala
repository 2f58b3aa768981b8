package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{when, xxhash64}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** KMV ("k minimum values") theta sketch for distinct counting with
  * SET semantics (Bar-Yossef et al. 2002; the DataSketches theta
  * family): keep the k smallest distinct 64-bit hash values seen. If
  * fewer than k survive, the retained set IS the distinct hash count
  * (exact up to hash collisions); once k is reached, the k-th minimum
  * normalized hash θ estimates density and (k−1)/θ estimates the
  * distinct count with relative standard error ≈ 1/sqrt(k−2)
  * (k = 4096 ⇒ ~1.6 %).
  *
  * What this adds over HLL++ (q30) and KLL (q35): sketches of this
  * family compose as SETS — the union of two sketches is the k-min
  * merge of their hash sets, so per-partition / per-day / per-source
  * sketches roll up without rescanning data. At 100 TB that is the
  * difference between "distinct users this quarter" being one more
  * KB-sized merge versus a full re-aggregation. Intersection /
  * difference follow the same algebra (estimate over the min of the
  * two thetas); union is what the engine exposes.
  *
  * Hashing rides Spark's codegen'd xxhash64 — the aggregate's input
  * is already the 64-bit hash, so the buffer's work per row is one
  * unsigned compare against the current k-th min (O(1) reject once
  * warm) and an O(log k) tree insert otherwise.
  */
final class ThetaSketch(val k: Int) extends Serializable {
  require(k >= 16, s"k must be >= 16, got $k")

  /** k smallest distinct hashes, unsigned order. */
  private[graft] val mins =
    new java.util.TreeSet[java.lang.Long](new java.util.Comparator[java.lang.Long] {
      override def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  def update(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, mins.last) < 0) {
      if (mins.add(h)) { mins.pollLast(); () }
    }
  }

  def merge(o: ThetaSketch): Unit = {
    val it = o.mins.iterator()
    while (it.hasNext) update(it.next())
  }

  /** Distinct estimate: exact retained count below k, else (k−1)/θ
    * with θ taken from the top 53 bits of the k-th minimum (double
    * mantissa precision — error floor far below the sketch's RSE).
    */
  def estimate(): Long =
    if (mins.size < k) mins.size.toLong
    else {
      val theta = (mins.last >>> 11).toDouble / (1L << 53).toDouble
      math.rint((k - 1).toDouble / theta).toLong
    }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(mins.size)
    val it = mins.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  /** Unsigned θ boundary: the k-th retained min when saturated, else
    * "no boundary" (all observed hashes retained).
    */
  private def thetaBound: Option[Long] =
    if (mins.size < k) None else Some(mins.last)

  /** Intersection-size estimate (the θ-algebra counterpart of the
    * union): common retained hashes below the TIGHTER of the two θ
    * boundaries, scaled by that θ. Exact when both sketches are below
    * capacity (all hashes retained); RSE grows as the intersection
    * shrinks relative to 1/θ — the standard KMV intersection caveat.
    */
  def intersectEstimate(o: ThetaSketch): Long = {
    val cut = (thetaBound, o.thetaBound) match {
      case (None, None)       => None
      case (Some(a), None)    => Some(a)
      case (None, Some(b))    => Some(b)
      case (Some(a), Some(b)) =>
        Some(if (java.lang.Long.compareUnsigned(a, b) <= 0) a else b)
    }
    var common = 0L
    val it = mins.iterator()
    while (it.hasNext) {
      val h = it.next()
      val inRegion = cut.forall(c => java.lang.Long.compareUnsigned(h, c) < 0)
      if (inRegion && o.mins.contains(h)) common += 1L
    }
    cut match {
      case None => common
      case Some(c) =>
        val theta = (c >>> 11).toDouble / (1L << 53).toDouble
        math.rint(common / theta).toLong
    }
  }
}

object ThetaSketch {
  def deserialize(bytes: Array[Byte]): ThetaSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new ThetaSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { sk.mins.add(in.readLong()); i += 1 }
    sk
  }

  /** Serialized sketch of a column's distinct values (binary). Null
    * inputs are skipped, matching COUNT(DISTINCT …).
    */
  def sketchAgg(c: Column, k: Int = 4096): Column =
    GraftColumnBridge.column(
      ThetaSketchAgg(
        GraftColumnBridge.expression(when(c.isNotNull, xxhash64(c))),
        k, emitBinary = true).toAggregateExpression())

  /** Distinct-count estimate of a column (long). */
  def distinctAgg(c: Column, k: Int = 4096): Column =
    GraftColumnBridge.column(
      ThetaSketchAgg(
        GraftColumnBridge.expression(when(c.isNotNull, xxhash64(c))),
        k, emitBinary = false).toAggregateExpression())

  /** Distinct-count estimate of the SET UNION of serialized sketches
    * (long) — the rollup aggregate: feed it the binary column
    * `sketchAgg` produced one level down.
    */
  def unionAgg(sketches: Column): Column =
    GraftColumnBridge.column(
      ThetaUnionAgg(GraftColumnBridge.expression(sketches))
        .toAggregateExpression())

  /** Intersection-size estimate of two serialized sketches (long) —
    * evaluated row-at-a-time (CodegenFallback): the inputs are
    * GROUP-level sketch binaries (a handful of rows), never raw data.
    */
  def intersectEstimate(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaIntersectEstimate(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Row-eval expression over two serialized sketches. Deliberately not
  * codegen'd: it runs on sketch-count-sized frames (pairs of groups),
  * not on data rows.
  */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "theta_intersect_estimate"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaSketch.deserialize(a.asInstanceOf[Array[Byte]])
      .intersectEstimate(ThetaSketch.deserialize(b.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

/** Build aggregate: input rows are pre-hashed longs (xxhash64 runs in
  * whole-stage codegen upstream); partials merge as k-min set unions.
  */
case class ThetaSketchAgg(
    child: Expression,
    k: Int,
    emitBinary: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[ThetaSketch] with UnaryLike[Expression] {

  override def dataType: DataType = if (emitBinary) BinaryType else LongType
  override def nullable: Boolean = emitBinary
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): ThetaSketch = new ThetaSketch(k)

  override def update(buffer: ThetaSketch, input: InternalRow): ThetaSketch = {
    child.eval(input) match {
      case null       => ()
      case h: Long    => buffer.update(h)
      case other => throw new IllegalArgumentException(
        s"theta_sketch expects a pre-hashed long, got ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: ThetaSketch, other: ThetaSketch): ThetaSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: ThetaSketch): Any =
    if (emitBinary) buffer.serialize() else buffer.estimate()

  override def serialize(buffer: ThetaSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): ThetaSketch =
    ThetaSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Union aggregate: input rows are serialized sketches; the buffer is
  * their running k-min union (k adopted from the first sketch seen).
  * This is the rollup path — group-level sketches in, one distinct
  * estimate of the union out, no re-scan of the base data.
  */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[ThetaSketch] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union"

  // placeholder k; real k adopted from the first merged sketch
  override def createAggregationBuffer(): ThetaSketch = new ThetaSketch(16)

  private def absorb(buffer: ThetaSketch, o: ThetaSketch): ThetaSketch =
    if (buffer.mins.isEmpty && buffer.k != o.k) { o.merge(buffer); o }
    else { buffer.merge(o); buffer }

  override def update(buffer: ThetaSketch, input: InternalRow): ThetaSketch =
    child.eval(input) match {
      case null              => buffer
      case b: Array[Byte]    => absorb(buffer, ThetaSketch.deserialize(b))
      case other => throw new IllegalArgumentException(
        s"theta_union expects a serialized sketch (binary), got ${other.getClass}")
    }

  override def merge(buffer: ThetaSketch, other: ThetaSketch): ThetaSketch =
    absorb(buffer, other)

  override def eval(buffer: ThetaSketch): Any = buffer.estimate()

  override def serialize(buffer: ThetaSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): ThetaSketch =
    ThetaSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}
