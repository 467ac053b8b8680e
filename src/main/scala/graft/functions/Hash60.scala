package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash60(s)`: the first 60 bits of md5(s) as a non-negative BIGINT —
  * bit-identical to the engine-portable formulation
  * `conv(substring(md5(s), 1, 15), 16, 10)` (the first 15 lowercase hex
  * chars of the digest are exactly the top 60 bits of its first 8
  * bytes), which is what the DuckDB oracles replicate.
  *
  * Why a custom expression (r19): the composed built-in form pays, per
  * value, a fresh `MessageDigest.getInstance` (commons-codec
  * DigestUtils allocates one per call), a 32-char hex-string
  * materialization, a substring copy, and a base-16 string parse
  * (`Conv`). This expression digests the UTF-8 bytes straight into a
  * long with a per-instance reused MessageDigest — same md5, zero
  * intermediate strings. hash60 runs once per token/shingle/n-gram
  * occurrence across the text family (simhash, DSIR, HLL, LM scores,
  * splits), so the per-call constant is corpus-proportional at 100 TB.
  * GraftFunctionsSpec asserts bit-equality against the composed form.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hash60 needs string or binary, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Hash60.digest60(Hash60.localMd.get(), bytes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "hash60Md",
      v => s"""
        try {
          $v = java.security.MessageDigest.getInstance("MD5");
        } catch (java.security.NoSuchAlgorithmException e) {
          throw new RuntimeException(e);
        }""")
    val toBytes = child.dataType match {
      case StringType => ".getBytes()"
      case BinaryType => ""
    }
    // r20: the digest-bytes → long assembly lives in the static helper
    // digest60 (shared with nullSafeEval). The previous inline shift-OR
    // chain tripped a Janino cast/parenthesization parse bug
    // (CompileException: `((long) (d[0] & 0xff)) << 56` "is not a type"),
    // silently falling back to interpreted eval and disabling whole-stage
    // codegen for every enclosing stage.
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.functions.Hash60.digest60($md, $in$toBytes);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  /** Interpreted-path digest, one per thread (MessageDigest is stateful
    * and Expression instances can be shared across task threads).
    */
  private[functions] val localMd =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Public (not private[functions]) so the companion-class static
    * forwarder exists for the generated Java in doGenCode to call.
    */
  def digest60(md: java.security.MessageDigest,
      bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    ((((d(0) & 0xffL)) << 56)
      | ((d(1) & 0xffL) << 48)
      | ((d(2) & 0xffL) << 40)
      | ((d(3) & 0xffL) << 32)
      | ((d(4) & 0xffL) << 24)
      | ((d(5) & 0xffL) << 16)
      | ((d(6) & 0xffL) << 8)
      | (d(7) & 0xffL)) >>> 4
  }

  def hash60(c: Column): Column =
    ColumnBridge.column(Hash60(ColumnBridge.expression(c)))
}
