package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(s)`: membership probe of a string column against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]] carried as a
  * plan-time reference object (the same class of bounded driver-side
  * state as a broadcast dim). False positives possible, false negatives
  * not — callers use it as a lossy prefilter in front of an exact join,
  * so the *declared result* never depends on the filter's behavior, only
  * the amount of data reaching the shuffle does.
  *
  * The probe is `mightContainString`, matching the `putString` inserts of
  * [[graft.ext.Contamination.buildBloom]] — build and probe are kept in
  * this codebase on purpose, so no Spark-internal hashing choice can
  * silently diverge between the two sides.
  */
// bf rides the closure/reference serialization (BloomFilter is
// Serializable) — NOT @transient, or interpreted eval on executors would
// see null
case class BloomMightContain(child: Expression,
    bf: BloomFilter) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    bf.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = $bfRef.mightContainString($s.toString());")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {
  def bloom_might_contain(s: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(s), bf))
}
