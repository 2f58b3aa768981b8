package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k largest (sortKey, payload)
  * pairs per group with a size-capped buffer.
  *
  * This is the scale-correct formulation of "top k rows per key":
  * Spark's partial aggregation runs the same bounded buffer map-side,
  * so each partition contributes at most k candidates per key to the
  * shuffle — versus the window/rank formulation, which shuffles and
  * sorts EVERY row of every key. At 100 TB with hot keys that is the
  * difference between k·partitions rows and the whole key's data
  * volume on one reducer.
  *
  * Ties on sortKey break toward the smaller tieBreak (ascending), so
  * results are deterministic and match the SQL
  * `row_number() OVER (ORDER BY sortKey DESC, tieBreak)` contract.
  */
final case class TopKEntry(sortKey: Double, tieBreak: Long, payload: Long)

class TopKAgg(k: Int) extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {

  private def better(a: TopKEntry, b: TopKEntry): Boolean =
    a.sortKey > b.sortKey || (a.sortKey == b.sortKey && a.tieBreak < b.tieBreak)

  private def insert(buf: Seq[TopKEntry], x: TopKEntry): Seq[TopKEntry] =
    if (buf.length < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def zero: Seq[TopKEntry] = Seq.empty

  override def reduce(buf: Seq[TopKEntry], x: TopKEntry): Seq[TopKEntry] =
    insert(buf, x)

  override def merge(a: Seq[TopKEntry], b: Seq[TopKEntry]): Seq[TopKEntry] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[TopKEntry]): Seq[TopKEntry] = buf

  override def bufferEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]]()
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]]()
}

/** String-payload sibling of [[TopKEntry]] — term/pair leaderboards
  * (vocabulary-scale groups where the window/rank formulation would
  * funnel the whole vocabulary through one reducer).
  */
final case class TopKStrEntry(sortKey: Double, payload: String)

/** Bounded top-k over (sortKey, string payload) pairs — the same
  * scale argument as [[TopKAgg]]: partial aggregation keeps at most
  * k candidates per partition. Ties on sortKey break toward the
  * LEXICOGRAPHICALLY SMALLER payload, matching
  * `row_number() OVER (ORDER BY sortKey DESC, payload)`.
  */
class TopKStrAgg(k: Int)
    extends Aggregator[TopKStrEntry, Seq[TopKStrEntry], Seq[TopKStrEntry]] {

  private def better(a: TopKStrEntry, b: TopKStrEntry): Boolean =
    a.sortKey > b.sortKey ||
      (a.sortKey == b.sortKey && a.payload < b.payload)

  private def insert(buf: Seq[TopKStrEntry], x: TopKStrEntry): Seq[TopKStrEntry] =
    if (buf.length < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def zero: Seq[TopKStrEntry] = Seq.empty

  override def reduce(buf: Seq[TopKStrEntry], x: TopKStrEntry): Seq[TopKStrEntry] =
    insert(buf, x)

  override def merge(a: Seq[TopKStrEntry], b: Seq[TopKStrEntry]): Seq[TopKStrEntry] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[TopKStrEntry]): Seq[TopKStrEntry] = buf

  override def bufferEncoder: Encoder[Seq[TopKStrEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKStrEntry]]()
  override def outputEncoder: Encoder[Seq[TopKStrEntry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKStrEntry]]()
}
