package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, Expression,
  GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection
}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
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
  * Semantics match pandas `merge_asof` / DuckDB ASOF JOIN:
  *  - `joinType` "left" keeps unmatched probe rows (null right side);
  *    "inner" drops them.
  *  - `tolerance` (in the time column's native units — e.g.
  *    microseconds for timestamps) rejects matches older than
  *    leftTime − tolerance.
  *  - Null keys and null times never match (SQL null-equality
  *    semantics): left rows with nulls surface only under "left",
  *    right rows with nulls are skipped.
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
    rightTime: Expression,
    joinType: String = "left",
    tolerance: Option[Double] = None,
    direction: String = "backward"
) extends BinaryNode {
  require(joinType == "left" || joinType == "inner", s"unsupported joinType $joinType")
  require(direction == "backward" || direction == "forward" || direction == "nearest",
    s"unsupported direction $direction")
  // tolerance (and nearest's distance compare) need numeric-backed
  // time values; reject non-numeric time columns at PLAN time —
  // without this the exec's per-row cast would throw
  // ClassCastException at execution time, and only on the first
  // tolerance-checked match
  if (tolerance.isDefined || direction == "nearest") {
    import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}
    Seq("left" -> leftTime.dataType, "right" -> rightTime.dataType).foreach {
      case (_, _: NumericType) | (_, DateType) | (_, TimestampType) | (_, TimestampNTZType) => ()
      case (side, dt) => throw new IllegalArgumentException(
        s"as-of tolerance/nearest requires a numeric, date, or timestamp $side time column; got $dt")
    }
  }
  // under "left", left rows always survive and the right side is
  // nullable; under "inner" every emitted row has a real match
  override def output: Seq[Attribute] =
    if (joinType == "left") left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, jt, tol, dir) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, jt, tol, dir) :: Nil
    case _ => Nil
  }
}

/** Serializable recipe for building the per-partition matcher on the
  * executor (generated classes and projections don't serialize).
  */
case class AsOfMatcherFactory(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    lOut: Seq[Attribute],
    rOut: Seq[Attribute],
    joinType: String,
    tolerance: Option[Double],
    direction: String
) extends Serializable {
  def create(rIt: Iterator[InternalRow]): AsOfMatcher =
    new AsOfMatcher(rIt, this)
}

/** One-pass sort-merge as-of matcher over a co-partitioned, sorted
  * right iterator: `matchLeft` consumes right rows up to each probe's
  * (key, time) frontier with O(1) state and returns the right row to
  * join — the null-filled row for an unmatched probe under "left",
  * or null (drop the probe) under "inner". Shared verbatim by the
  * interpreted path and the whole-stage-codegen path, so the two
  * cannot diverge. Key comparison uses a codegen'd natural ordering.
  */
final class AsOfMatcher(
    rIt: Iterator[InternalRow], f: AsOfMatcherFactory) {
  private val inner = f.joinType == "inner"
  private val lKey = UnsafeProjection.create(f.leftKeys, f.lOut)
  private val rKey = UnsafeProjection.create(f.rightKeys, f.rOut)
  private val rTimeBound = BindReferences.bindReference(f.rightTime, f.rOut)
  private val lTimeEval = BindReferences.bindReference(f.leftTime, f.lOut)
  private val keyOrdering =
    RowOrdering.createNaturalAscendingOrdering(f.leftKeys.map(_.dataType))
  private val timeOrdering = TypeUtils.getInterpretedOrdering(f.leftTime.dataType)
    .asInstanceOf[Ordering[Any]]
  private val nullRight = new GenericInternalRow(f.rOut.length)

  private var rHead: InternalRow = _
  private var rHeadKey: InternalRow = _
  private var lastMatch: InternalRow = _
  private var lastMatchKey: InternalRow = _
  private var lastMatchTime: Any = _
  advanceRight()

  private def advanceRight(): Unit = {
    rHead = null; rHeadKey = null
    // right rows with null keys or null time can never match
    while (rHead == null && rIt.hasNext) {
      val r = rIt.next()
      val k = rKey(r)
      if (!k.anyNull && rTimeBound.eval(r) != null) {
        rHead = r
        rHeadKey = k.copy()
      }
    }
  }

  private val forward = f.direction == "forward"
  private val nearest = f.direction == "nearest"

  // types were validated at plan time for tolerance/nearest; Decimal
  // is the one numeric backing that isn't a java.lang.Number
  private def num(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }

  // timestamps/dates/long epochs back onto integral types whose values
  // exceed double's 2^53 exact range (nanos epochs are ~1.7e18), so
  // distance/tolerance arithmetic runs in exact LONGS whenever both
  // operands are integral — a double path there can round two distinct
  // distances equal and pick the farther candidate
  private def isIntegral(v: Any): Boolean = v match {
    case _: java.lang.Long | _: java.lang.Integer |
         _: java.lang.Short | _: java.lang.Byte => true
    case _ => false
  }

  /** Exact-when-integral distance b − a, as a comparison-safe pair:
    * returns Right(long) for integral operands, Left(double) else.
    */
  private def dist(a: Any, b: Any): Either[Double, Long] =
    if (isIntegral(a) && isIntegral(b))
      Right(b.asInstanceOf[Number].longValue() - a.asInstanceOf[Number].longValue())
    else Left(num(b) - num(a))

  // exact long-vs-double compare: promoting the long to double rounds
  // past 2^53 (nanos-epoch distances live there) and can flip the
  // comparison; route finite mixed compares through exact BigDecimals
  private def longLeqDouble(l: Long, d: Double): Boolean =
    if (d.isNaN || d.isInfinite) l.toDouble <= d
    else BigDecimal(l) <= BigDecimal.exact(d)
  private def doubleLeqLong(d: Double, l: Long): Boolean =
    if (d.isNaN || d.isInfinite) d <= l.toDouble
    else BigDecimal.exact(d) <= BigDecimal(l)

  private def withinTol(d: Either[Double, Long], t: Double): Boolean = d match {
    case Right(l) => longLeqDouble(l, t)
    case Left(x) => x <= t
  }

  private def distLeq(a: Either[Double, Long], b: Either[Double, Long]): Boolean =
    (a, b) match {
      case (Right(x), Right(y)) => x <= y
      case (Left(x), Left(y)) => x <= y
      case (Right(x), Left(y)) => longLeqDouble(x, y)
      case (Left(x), Right(y)) => doubleLeqLong(x, y)
    }

  /** Right row to join with `l`, or null to DROP `l` (inner join,
    * no qualifying match).
    *
    * The walk consumes right rows strictly behind the probe frontier:
    * under backward/nearest that is (same key, time ≤ probe time) —
    * the last consumed row IS the backward candidate; under forward
    * it is (same key, time < probe time), leaving `rHead` parked on
    * the earliest same-key row at/after the probe — the forward
    * candidate, NOT consumed because it may serve later probes too.
    * Nearest compares the two candidates by |Δt| (tolerance-filtered
    * on each side) with ties resolved backward — the rule both the
    * oracle SQL and the spec recompute state.
    */
  def matchLeft(l: InternalRow): InternalRow = {
    val lk = lKey(l).copy()
    val lt = lTimeEval.eval(l)
    // null key / null time on the left never matches
    if (lk.anyNull || lt == null)
      return if (inner) null else nullRight
    var continue = true
    while (continue && rHead != null) {
      val c = keyOrdering.compare(rHeadKey, lk)
      if (c < 0) {
        advanceRight()
      } else if (c == 0) {
        val rt = rTimeBound.eval(rHead)
        val cmp = timeOrdering.compare(rt, lt)
        val consume = if (forward) cmp < 0 else cmp <= 0
        if (consume) {
          if (!forward) {
            lastMatch = rHead.copy()
            lastMatchKey = rHeadKey
            lastMatchTime = rt
          }
          advanceRight()
        } else continue = false
      } else continue = false
    }
    val tol = f.tolerance
    // backward candidate: last consumed same-key row at/before lt
    lazy val backDist = dist(lastMatchTime, lt) // lt − matchTime ≥ 0
    val backOk = !forward && lastMatch != null && lastMatchKey != null &&
      keyOrdering.compare(lastMatchKey, lk) == 0 &&
      (tol.isEmpty || withinTol(backDist, tol.get))
    // forward candidate: rHead parked on the first same-key row
    // at/after (forward) or strictly after (nearest) lt
    val fwdSameKey = (forward || nearest) && rHead != null &&
      keyOrdering.compare(rHeadKey, lk) == 0
    lazy val fwdTime = rTimeBound.eval(rHead)
    lazy val fwdDist = dist(lt, fwdTime) // fwdTime − lt ≥ 0
    val fwdOk = fwdSameKey &&
      (tol.isEmpty || withinTol(fwdDist, tol.get))
    val chosen: InternalRow =
      if (forward) { if (fwdOk) rHead else null }
      else if (!nearest) { if (backOk) lastMatch else null }
      else {
        if (backOk && fwdOk) {
          // tie breaks backward (<=); exact long compare when the
          // time type is integral-backed
          if (distLeq(backDist, fwdDist)) lastMatch
          else rHead
        } else if (backOk) lastMatch
        else if (fwdOk) rHead
        else null
      }
    if (chosen != null) chosen
    else if (inner) null
    else nullRight
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    joinType: String,
    tolerance: Option[Double],
    direction: String = "backward"
) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    if (joinType == "left") left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending))
  )

  private def matcherFactory = AsOfMatcherFactory(
    leftKeys, rightKeys, leftTime, rightTime,
    left.output, right.output, joinType, tolerance, direction)

  override protected def doExecute(): RDD[InternalRow] = {
    val factory = matcherFactory
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val matcher = factory.create(rIt)
      val joined = new JoinedRow
      // downstream consumers (collect, shuffle) require UnsafeRow
      val outProj = UnsafeProjection.create(
        (left.output ++ right.output).map(_.dataType).toArray)
      lIt.flatMap { l =>
        val r = matcher.matchLeft(l)
        if (r == null) None else Some(outProj(joined(l, r)))
      }
    }
  }

  // ---- whole-stage codegen: the probe loop + output projection fuse
  // with downstream operators; the O(1)-state merge walk stays in
  // AsOfMatcher (shared with the interpreted path), invoked once per
  // probe row from generated code — the same split SortMergeJoin uses
  // for its buffered-side scanner.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    Seq(left.execute(), right.execute())

  // rows returned by the matcher are buffered/reused instances
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "leftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val matcherCls = classOf[AsOfMatcher].getName
    val factoryCls = classOf[AsOfMatcherFactory].getName
    val factoryRef = ctx.addReferenceObj("asOfFactory", matcherFactory, factoryCls)
    val matcher = ctx.addMutableState(matcherCls, "asOfMatcher",
      v => s"$v = $factoryRef.create(inputs[1]);", forceInline = true)

    val leftRow = ctx.freshName("leftRow")
    val rightRow = ctx.freshName("rightRow")
    val rowCls = classOf[InternalRow].getName

    // output columns evaluated straight off the two row variables
    ctx.currentVars = null
    ctx.INPUT_ROW = leftRow
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = rightRow
    val rightVars = output.drop(left.output.length).zipWithIndex.map {
      case (a, i) => BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val outVars: Seq[ExprCode] = leftVars ++ rightVars

    s"""
       |while ($leftInput.hasNext()) {
       |  $rowCls $leftRow = ($rowCls) $leftInput.next();
       |  $rowCls $rightRow = $matcher.matchLeft($leftRow);
       |  if ($rightRow == null) continue;
       |  ${consume(ctx, outVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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
    * keys and rightTime ≤ leftTime.
    *
    * @param joinType  "left" (default — unmatched probes survive with
    *                  null right columns) or "inner" (pandas
    *                  `merge_asof` default drops them only under
    *                  tolerance misses; DuckDB ASOF INNER drops all
    *                  unmatched)
    * @param tolerance maximum allowed |leftTime − rightTime|, in the
    *                  time column's native units (microseconds for
    *                  timestamps) — pandas `merge_asof(tolerance=…)`
    * @param direction "backward" (default — most recent right row at
    *                  or before the probe), "forward" (earliest right
    *                  row at or after), or "nearest" (smaller |Δt|,
    *                  ties resolved backward) — pandas
    *                  `merge_asof(direction=…)`
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      joinType: String = "left",
      tolerance: Option[Double] = None,
      direction: String = "backward"
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
      resolve(rPlan, rightTime),
      joinType, tolerance, direction)
    GraftColumnBridge.ofRows(spark, node)
  }
}
