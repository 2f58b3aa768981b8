package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import scala.util.hashing.MurmurHash3

/** 64-bit SimHash over a token array — a custom Catalyst expression
  * for an operator Spark lacks natively (the reference has no simhash
  * either; this is part of the training-data-pipeline extension
  * surface).
  *
  * Semantics: each token hashes to 64 bits (two seeded 32-bit
  * murmur3 halves — deterministic across JVMs); every bit votes
  * +1/-1; the sign of each vote total forms the output bit. Documents
  * whose simhashes differ in few bits are near-duplicates.
  *
  * Evaluated per-row with no state, so it parallelizes embarrassingly
  * and keeps dedup a pure column computation — candidate pairing then
  * happens relationally on band keys (see Dedup.simhashBand).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.evalArray(input.asInstanceOf[ArrayData]))

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"

  /** Whole-stage codegen: the vote loop is emitted as a static helper
    * call, keeping the surrounding stage fused (no CodegenFallback
    * row-at-a-time boundary in the dedup hot path).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SimHash64.evalArray($c)")
}

object SimHash64 {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column API: `simhash64(tokensCol)`. */
  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))

  /** Shared kernel for both interpreted eval and generated code. */
  def evalArray(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        val lo = MurmurHash3.stringHash(s, 0x9747b28c)
        val hi = MurmurHash3.stringHash(s, 0x85ebca6b)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
