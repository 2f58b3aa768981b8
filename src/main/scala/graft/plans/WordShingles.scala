package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over a token array — a custom
  * Catalyst expression replacing the transform/sequence/element_at
  * higher-order-function pipeline, whose lambdas evaluate interpreted
  * per ELEMENT (measured ~2× the whole dedup pipeline's time at
  * sf0.1). This kernel runs once per ROW as a primitive loop over
  * UTF8String slices (no String materialization), and participates in
  * whole-stage codegen via a static helper call, so shingling stays
  * inside the fused stage.
  *
  * Semantics exactly match the HOF formulation it replaces:
  * fewer than `n` tokens → empty array; otherwise all consecutive
  * n-token windows joined with a single space, first-occurrence
  * distinct.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.evalArray(input.asInstanceOf[ArrayData], n)

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WordShingles.evalArray($c, $n)")
}

object WordShingles {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: distinct n-gram shingles of a token-array column. */
  def wordShingles(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(tokens), n))

  /** Shared kernel for interpreted eval and generated code. */
  def evalArray(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val space = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls — same as the concat_ws it replaces
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}
