package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd vector arithmetic over array<double> columns — custom
  * Catalyst expressions replacing the zip_with/aggregate HOF
  * formulations, whose lambdas evaluate interpreted PER ELEMENT (the
  * ANN-LSH index computes 56 plane projections per row; at dim 64
  * that was ~7k interpreted lambda evals per corpus row).
  *
  * Arithmetic is the exact same left-to-right sequential fold the
  * HOFs performed, so results are bit-identical and the DuckDB oracle
  * hashes are unaffected. Null propagation matches the HOFs too:
  * a null element or length mismatch yields null.
  */
object VecMath {
  import org.apache.spark.sql.GraftColumnBridge

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def l2(a: Column): Column =
    GraftColumnBridge.column(L2NormExpr(GraftColumnBridge.expression(a)))

  /** Sequential dot product; null box on null element / length skew. */
  def evalDot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  /** dot/(|a||b|) with each factor a sequential fold — identical
    * arithmetic to the three-aggregate HOF version.
    */
  def evalCosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def evalL2(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  private[plans] def checkArray(dt: DataType, name: String) = dt match {
    case ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$name needs array<double>, got $other")
  }

  /** Both operands must be array<double> — an unvalidated side would
    * read doubles out of differently-sized slots at runtime (garbage,
    * not an error).
    */
  private[plans] def checkBoth(l: DataType, r: DataType, name: String) = {
    val first = checkArray(l, name)
    if (first.isSuccess) checkArray(r, name) else first
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecMath.checkBoth(left.dataType, right.dataType, "vec_dot")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.evalDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double r = graft.plans.VecMath.evalDot($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })
    res
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecMath.checkBoth(left.dataType, right.dataType, "vec_cosine")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.evalCosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double r = graft.plans.VecMath.evalCosine($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })
}

case class L2NormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    VecMath.checkArray(child.dataType, "vec_l2")
  override protected def nullSafeEval(a: Any): Any =
    VecMath.evalL2(a.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): L2NormExpr =
    copy(child = newChild)
  override def prettyName: String = "vec_l2"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |java.lang.Double r = graft.plans.VecMath.evalL2($a);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin
    })
}
