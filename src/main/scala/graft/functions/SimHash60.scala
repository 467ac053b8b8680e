package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `simhash60(hashes)`: 60-bit SimHash over pre-hashed features — bit b
  * of the result is 1 iff Σ over features of (±1 by the feature-hash's
  * bit b) is positive.
  *
  * The portable HOF formulation (a 60-step `aggregate` whose every step
  * runs an inner `aggregate` over the feature array) re-walks the array
  * 60 times per row through interpreted lambda frames — measured 23 s
  * for the sf0.1 corpus once the bench actually materialized the column
  * (count-pruning had hidden it; see Bench scaladoc). This expression is
  * the same arithmetic as one codegen'd loop: a stack-local 60-slot vote
  * buffer, one pass over the features, zero allocations beyond the
  * buffer. Bit-identical to [[graft.ext.TextAnalysis.simhashHof]]
  * (asserted in GraftFunctionsSpec) and to the x08 DuckDB oracle.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 needs array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val n = hv.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var b = 0
      while (b < 60) {
        votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) acc |= 1L << b
      b += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hv => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      s"""
        int $n = $hv.numElements();
        int[] $votes = new int[60];
        for (int $i = 0; $i < $n; $i++) {
          long $h = $hv.getLong($i);
          for (int $b = 0; $b < 60; $b++) {
            $votes[$b] += ((int) (($h >>> $b) & 1L) << 1) - 1;
          }
        }
        ${ev.value} = 0L;
        for (int $b = 0; $b < 60; $b++) {
          if ($votes[$b] > 0) ${ev.value} |= 1L << $b;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  def simhash60(hv: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(hv)))
}
