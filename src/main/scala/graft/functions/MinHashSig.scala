package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(hashes)`: MinHash signature over pre-hashed shingle values
  * — for each of `numHashes` fixed universal hash functions
  * `(a_i·h + b_i) mod p` (p = 2³¹−1, seeds deterministic literals), the
  * minimum over the input array.
  *
  * The portable HOF formulation (128 × `array_min(transform(...))`)
  * allocates 128 intermediate arrays per row and runs interpreted; this
  * expression is one codegen'd loop with a stack-local minima buffer —
  * numHashes × |shingles| fused multiply-mods and a single output
  * allocation. Seeds and semantics are identical to
  * [[graft.ext.Dedup.minhashSignatureHof]] (asserted bit-equal in
  * GraftFunctionsSpec).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = MinHashSig.MersennePrime31

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<bigint>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val n = hv.numElements()
    val out = new Array[Long](numHashes)
    val seeds = MinHashSig.seeds(numHashes)
    var j = 0
    while (j < numHashes) {
      val (a, b) = seeds(j)
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a * hv.getLong(i) + b) % P
        if (v < m) m = v
        i += 1
      }
      out(j) = if (n == 0) Long.MaxValue else m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsA = ctx.addReferenceObj("seedsA",
      MinHashSig.seeds(numHashes).map(_._1), "long[]")
    val seedsB = ctx.addReferenceObj("seedsB",
      MinHashSig.seeds(numHashes).map(_._2), "long[]")
    nullSafeCodeGen(ctx, ev, hv => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
        int $n = $hv.numElements();
        long[] $out = new long[$numHashes];
        for (int $j = 0; $j < $numHashes; $j++) {
          long $m = Long.MAX_VALUE;
          for (int $i = 0; $i < $n; $i++) {
            long $v = ($seedsA[$j] * $hv.getLong($i) + $seedsB[$j]) % ${P}L;
            if ($v < $m) $m = $v;
          }
          $out[$j] = $m;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val MersennePrime31 = 2147483647L // 2^31 - 1

  /** Fixed splitmix-style seed pairs; a,b < 2^30 so a·h+b < 2^61 for
    * h < p — no overflow in signed 64-bit.
    */
  def seeds(numHashes: Int): Array[(Long, Long)] =
    (0 until numHashes).map { i =>
      val a = (0x9E3779B97F4A7C15L * (i + 1) & 0x3FFFFFFFL) | 1L
      val b = 0xBF58476D1CE4E5B9L * (i + 7) & 0x3FFFFFFFL
      (a, b)
    }.toArray

  def minhash_sig(hv: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hv), numHashes))
}
