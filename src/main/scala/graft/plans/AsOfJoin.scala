package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native as-of join — the operator Spark's relational algebra lacks
  * (probe row ← most recent reference row with the same key and
  * time ≤ probe time). The usual workarounds are a range join (row
  * explosion) or a union+window trick (full-width shuffle of both
  * tables through one window); this operator instead runs the
  * textbook sort-merge pass: co-partition by key, sort by (key,
  * time), and stream both sides once with O(1) state — exactly what
  * survives at 100 TB.
  *
  * Implemented as the full custom-operator stack per the build
  * brief's preference (c): logical node + planner Strategy +
  * physical exec, injected via experimentalMethods (equivalently
  * injectable through SparkSessionExtensions).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression
) extends BinaryNode {
  // left rows always survive (left-outer as-of); right side nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression
) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending))
  )

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable pieces; projections/orderings are
    // built per-partition (generated classes don't serialize)
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val lOut = left.output
    val rOut = right.output
    val keySchema = org.apache.spark.sql.types.StructType(
      leftKeys.zipWithIndex.map { case (e, i) =>
        org.apache.spark.sql.types.StructField(s"k$i", e.dataType) })
    val nRight = right.output.length

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val lKey = UnsafeProjection.create(lKeysB, lOut)
      val rKey = UnsafeProjection.create(rKeysB, rOut)
      val rTimeBound = BindReferences.bindReference(rTimeB, rOut)
      val lTimeEval = BindReferences.bindReference(lTimeB, lOut)
      val keyOrdering = TypeUtils.getInterpretedOrdering(keySchema)
      val timeOrdering = TypeUtils.getInterpretedOrdering(lTimeB.dataType)
      // downstream consumers (collect, shuffle) require UnsafeRow
      val outProj = UnsafeProjection.create((lOut ++ rOut).map(_.dataType).toArray)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIt.hasNext) {
            rHead = rIt.next()
            rHeadKey = rKey(rHead).copy()
          } else { rHead = null; rHeadKey = null }

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = lKey(l).copy()
          val lt = lTimeEval.eval(l)
          // consume right rows that are (earlier key) or (same key,
          // time <= left time); remember the last same-key one
          var continue = true
          while (continue && rHead != null) {
            val c = keyOrdering.asInstanceOf[Ordering[Any]]
              .compare(rHeadKey, lk)
            if (c < 0) {
              advanceRight()
            } else if (c == 0) {
              val rt = rTimeBound.eval(rHead)
              if (timeOrdering.asInstanceOf[Ordering[Any]].compare(rt, lt) <= 0) {
                lastMatch = rHead.copy()
                lastMatchKey = rHeadKey
                advanceRight()
              } else continue = false
            } else continue = false
          }
          val matched = lastMatch != null && lastMatchKey != null &&
            keyOrdering.asInstanceOf[Ordering[Any]].compare(lastMatchKey, lk) == 0
          outProj(if (matched) joined(l, lastMatch) else joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: as-of join two DataFrames on equality keys + time. */
object AsOf {
  import org.apache.spark.sql.GraftColumnBridge

  /** Install the planner strategy once per session. */
  def install(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(AsOfJoinStrategy))
      em.extraStrategies = AsOfJoinStrategy +: em.extraStrategies
  }

  /** `left` rows joined to the most recent `right` row with equal
    * keys and rightTime ≤ leftTime (left-outer semantics).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String
  ): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, n: String): Expression =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val node = AsOfJoin(
      lPlan, rPlan,
      leftKeys.map(resolve(lPlan, _)),
      rightKeys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTime),
      resolve(rPlan, rightTime))
    GraftColumnBridge.ofRows(spark, node)
  }
}
