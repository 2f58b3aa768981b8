package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; the
  * mergeable formulation of Agarwal et al., "Mergeable Summaries",
  * PODS 2012): at most k counters; an unmatched item with no free
  * counter decrements ALL counters (dropping zeros) instead of being
  * stored. Estimated counts UNDERCOUNT by at most n/(k+1), so every
  * item with true frequency > n/(k+1) is guaranteed present — the
  * "no heavy item is ever silently dropped" contract that makes a
  * fixed-size summary usable for corpus vocabulary screening at
  * 100 TB (exact per-term counts need a shuffle whose key domain is
  * the vocabulary; this is one map-side pass + KB-sized merges).
  * Merging adds counters pairwise, then reduces back to k by
  * subtracting the (k+1)-th largest count — the bound degrades
  * additively, never silently.
  *
  * Summary CONTENTS below the guarantee line depend on merge order
  * (Spark partial-aggregation order is nondeterministic), so queries
  * gate on the guarantee — heavy items present — not on raw summary
  * equality.
  */
final class MGSketch(val k: Int) extends Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  private[graft] val counters =
    new java.util.HashMap[String, java.lang.Long](k * 2)
  private[graft] var n: Long = 0L

  def update(item: String): Unit = {
    n += 1L
    val cur = counters.get(item)
    if (cur != null) { counters.put(item, cur + 1L); () }
    else if (counters.size < k) { counters.put(item, 1L); () }
    else decrementAll(1L)
  }

  /** Subtract d from every counter, dropping non-positives. */
  private def decrementAll(d: Long): Unit = {
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove()
      else e.setValue(e.getValue - d)
    }
  }

  def merge(o: MGSketch): Unit = {
    n += o.n
    val it = o.counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counters.get(e.getKey)
      counters.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (counters.size > k) {
      // subtract the (k+1)-th largest count; at most k counters survive
      val counts = new Array[Long](counters.size)
      var i = 0
      val vit = counters.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      decrementAll(cut)
    }
  }

  /** (item, estimated count) pairs, count-descending then item. */
  def items(): Array[(String, Long)] = {
    val out = new Array[(String, Long)](counters.size)
    var i = 0
    val it = counters.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    out.sortBy { case (t, c) => (-c, t) }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeLong(n); out.writeInt(counters.size)
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: a pathological >64KB
      // token (nothing upstream bounds token length) must degrade the
      // summary, not throw UTFDataFormatException mid-shuffle
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }
}

object MGSketch {
  def deserialize(bytes: Array[Byte]): MGSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new MGSketch(in.readInt())
    sk.n = in.readLong()
    val m = in.readInt()
    var i = 0
    while (i < m) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      sk.counters.put(
        new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    sk
  }

  /** Column API: array<struct<term,string cnt,bigint>> of the summary,
    * count-descending. Null inputs are skipped.
    */
  def agg(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MGHeavyHitters(GraftColumnBridge.expression(c), k)
        .toAggregateExpression())
}

/** Catalyst aggregate over string items; buffer is the MG summary,
  * partials merge with the additive-error bound above.
  */
case class MGHeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[MGSketch] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_heavy_hitters"

  override def createAggregationBuffer(): MGSketch = new MGSketch(k)

  override def update(buffer: MGSketch, input: InternalRow): MGSketch = {
    child.eval(input) match {
      case null            => ()
      case s: UTF8String   => buffer.update(s.toString)
      case other => throw new IllegalArgumentException(
        s"mg_heavy_hitters needs string input, got ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: MGSketch, other: MGSketch): MGSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: MGSketch): Any = {
    val rows = buffer.items().map { case (t, c) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: MGSketch): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): MGSketch =
    MGSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): MGHeavyHitters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MGHeavyHitters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MGHeavyHitters =
    copy(child = newChild)
}
