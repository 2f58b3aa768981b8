package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer barrier for expensive per-row kernels: semantically the
  * identity on its child, but reported non-deterministic so Catalyst
  * will neither push a downstream filter through the defining
  * projection nor inline the child into consumers via
  * CollapseProject. Without it, a pattern like
  *
  *   join(...).select(expensive(x).as("d")).filter($"d" >= 0)
  *
  * gets the filter pushed into the join condition, evaluating the
  * kernel TWICE per candidate pair (once in the join, once for the
  * output column) — the dedup_fuzzy_names regression class.
  *
  * Codegen passes straight through the child, so the kernel stays
  * inside the surrounding WholeStageCodegen span; the only effect is
  * on plan shape. The child must itself be deterministic (the flag is
  * a fencing lie, and retries/speculation must still recompute the
  * same value).
  */
case class MaterializeOnceExpr(child: Expression) extends UnaryExpression {
  require(child.deterministic,
    "MaterializeOnce fences a deterministic kernel; wrapping a " +
      "genuinely non-deterministic child would hide retry hazards")

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): MaterializeOnceExpr =
    copy(child = newChild)
}

object MaterializeOnce {
  import org.apache.spark.sql.GraftColumnBridge

  /** Fence `c` so it is evaluated exactly once, in the projection that
    * defines it — downstream predicates stay ABOVE that projection.
    */
  def apply(c: Column): Column =
    GraftColumnBridge.column(MaterializeOnceExpr(GraftColumnBridge.expression(c)))
}
