package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_winnow(text)`: the winnowing fingerprint windows (Schleimer
  * et al., SIGMOD'03) of a string in ONE pass — per-position polynomial
  * k-gram hashes maintained with an O(1) rolling update, then the min of
  * each w-window, emitted as an array (callers dedup/sort with the
  * built-ins). This is what "rolling hash" means computationally: the
  * HOF/md5 formulation recomputes a full digest per gram (O(len·k) digest
  * work — measured 3.8 s over sf0.1's corpus); here each step is a
  * subtract-multiply-add mod M.
  *
  * Hash: h(i) = Σ_t code(c_{i+t})·B^{k-1-t} mod M with B=257,
  * M=1e9+7 — all intermediates < 2^47, so plain long arithmetic
  * replicates in any engine; the DuckDB oracle computes the same
  * polynomial directly per position (ord × literal powers). Codes are
  * UTF-16 units, identical to `ascii()`/`ord()` for the ASCII corpus
  * this targets (documented contract; multibyte text hashes differently
  * but deterministically).
  *
  * Rows shorter than k+w-1 characters yield an empty array (no full
  * window exists) — callers filter, mirroring the oracle's WHERE.
  */
case class RollingWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_winnow needs string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    new GenericArrayData(RollingWinnow.winnow(s, k, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.functions.RollingWinnow.winnow($s.toString(), $k, $w));
    """)

  override protected def withNewChildInternal(
      newChild: Expression): RollingWinnow = copy(child = newChild)
}

object RollingWinnow {
  val M = 1000000007L
  val B = 257L

  /** All w-window minima of the rolling k-gram hashes. The loop is the
    * whole operator — shared verbatim by interpreted eval and codegen
    * (one static call; nothing here benefits from inlined generated
    * code, the cost is the arithmetic itself).
    */
  def winnow(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length - k + 1 // number of k-grams
    if (n < w) return Array.emptyLongArray
    // B^(k-1) mod M for the outgoing-char subtraction
    var bk1 = 1L
    var t = 0
    while (t < k - 1) { bk1 = bk1 * B % M; t += 1 }
    val hs = new Array[Long](n)
    var h = 0L
    t = 0
    while (t < k) { h = (h * B + s.charAt(t).toLong) % M; t += 1 }
    hs(0) = h
    var i = 1
    while (i < n) {
      var sub = (h - s.charAt(i - 1).toLong * bk1 % M) % M
      if (sub < 0) sub += M
      h = (sub * B + s.charAt(i + k - 1).toLong) % M
      hs(i) = h
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    var j = 0
    while (j < n - w + 1) {
      var m = hs(j)
      var x = 1
      while (x < w) { if (hs(j + x) < m) m = hs(j + x); x += 1 }
      out(j) = m
      j += 1
    }
    out
  }

  def rolling_winnow(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(
      RollingWinnow(ColumnBridge.expression(text), k, w))
}
