package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** `pq_encode(embedding)`: all `m` product-quantization subspace codes of
  * a float vector in one pass — element j is the id of the codebook entry
  * whose j-th subvector minimizes the rounded squared L2 distance to the
  * input's j-th subvector (ties → lowest codebook id).
  *
  * Semantically identical to the relational encode in
  * [[graft.ext.Similarity.topKPq]] (explode-by-subspace → broadcast
  * codebook join → `min_by` argmin), asserted row-equal in
  * GraftFunctionsSpec. The relational form materializes
  * corpus·m·|codebook| join rows (10M at sf0.1) through the join +
  * aggregate machinery just to throw all but the argmin away; here the
  * argmin runs as a tight codegen'd loop over a plan-time codebook
  * reference object, one output allocation per row. At 100 TB this is the
  * difference between an encode that rides the scan and one that shuffles
  * a 256×-amplified corpus.
  *
  * Distance arithmetic replicates the relational/oracle form exactly:
  * `round(dot(sv,sv) - 2·dot(sv,cb) + dot(cb,cb), 6)` with left-to-right
  * double accumulation over float terms ([[FloatVecDot]] semantics,
  * including its min-length behavior on short slices) and Spark's
  * HALF_UP BigDecimal rounding — so codes are engine-portable and the
  * DuckDB oracle reproduces them bit-exactly.
  */
case class PqEncode(child: Expression, sub: Int, ids: Array[Long],
    cbVecs: Array[Array[Float]], m: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val len = e.numElements()
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      val start = j * sub
      // slice(e, start+1, sub) semantics: empty past the end, short at it
      val na = math.max(0, math.min(len - start, sub))
      var saa = 0.0
      var i = 0
      while (i < na) {
        val v = e.getFloat(start + i).toDouble
        saa += v * v
        i += 1
      }
      var bestD = Double.MaxValue
      var bestId = Long.MaxValue
      var c = 0
      while (c < ids.length) {
        val cb = cbVecs(c)
        val nb = math.max(0, math.min(cb.length - start, sub))
        var sbb = 0.0
        var sab = 0.0
        val nab = math.min(na, nb)
        i = 0
        while (i < nb) {
          val w = cb(start + i).toDouble
          sbb += w * w
          if (i < nab) sab += e.getFloat(start + i).toDouble * w
          i += 1
        }
        val d = PqEncode.round6(saa - 2.0 * sab + sbb)
        if (d < bestD) { bestD = d; bestId = ids(c) }
        c += 1
      }
      out(j) = bestId
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("pqIds", ids, "long[]")
    val cbRef = ctx.addReferenceObj("pqCodebook", cbVecs, "float[][]")
    nullSafeCodeGen(ctx, ev, e => {
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val start = ctx.freshName("start")
      val na = ctx.freshName("na")
      val saa = ctx.freshName("saa")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val bestD = ctx.freshName("bestD")
      val bestId = ctx.freshName("bestId")
      val c = ctx.freshName("c")
      val cb = ctx.freshName("cb")
      val nb = ctx.freshName("nb")
      val nab = ctx.freshName("nab")
      val sbb = ctx.freshName("sbb")
      val sab = ctx.freshName("sab")
      val w = ctx.freshName("w")
      val d = ctx.freshName("d")
      s"""
        int $len = $e.numElements();
        long[] $out = new long[$m];
        for (int $j = 0; $j < $m; $j++) {
          int $start = $j * $sub;
          int $na = java.lang.Math.max(0, java.lang.Math.min($len - $start, $sub));
          double $saa = 0.0;
          for (int $i = 0; $i < $na; $i++) {
            double $v = (double) $e.getFloat($start + $i);
            $saa += $v * $v;
          }
          double $bestD = Double.MAX_VALUE;
          long $bestId = Long.MAX_VALUE;
          for (int $c = 0; $c < $idsRef.length; $c++) {
            float[] $cb = $cbRef[$c];
            int $nb = java.lang.Math.max(0, java.lang.Math.min($cb.length - $start, $sub));
            int $nab = java.lang.Math.min($na, $nb);
            double $sbb = 0.0;
            double $sab = 0.0;
            for (int $i = 0; $i < $nb; $i++) {
              double $w = (double) $cb[$start + $i];
              $sbb += $w * $w;
              if ($i < $nab) $sab += (double) $e.getFloat($start + $i) * $w;
            }
            double $d = graft.functions.PqEncode.round6($saa - 2.0 * $sab + $sbb);
            if ($d < $bestD) { $bestD = $d; $bestId = $idsRef[$c]; }
          }
          $out[$j] = $bestId;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  // reference-object arrays make instances non-comparable by value; plan
  // canonicalization falls back to identity, which is safe (no reuse).
  override protected def withNewChildInternal(
      newChild: Expression): PqEncode = copy(child = newChild)
}

object PqEncode {

  /** Spark's `round(x, 6)` for doubles: BigDecimal HALF_UP on the
    * canonical decimal representation — the exact rounding the relational
    * form and the DuckDB oracle apply before the argmin.
    *
    * Fast path: away from the .5 rounding boundary, `floor(x·10⁶ + 0.5)`
    * agrees with the BigDecimal result — `BigDecimal.valueOf` perturbs
    * the value by ≤ ~10⁻¹⁶ relative (shortest-round-trip string) and the
    * double multiply by ≤ 1 ulp, both orders of magnitude inside the
    * 10⁻⁴ guard band — so the 10M-per-query BigDecimal allocations of
    * the PQ argmin (measured seconds at sf0.1) collapse to arithmetic.
    * Only boundary-adjacent values (and magnitudes ≥ 10⁴, where the
    * 10⁶-shift ulp starts approaching the band) take the allocation
    * path. Non-negative inputs only on the hot path (squared
    * distances); negatives go straight to BigDecimal where
    * HALF_UP-vs-floor asymmetry would bite.
    */
  def round6(x: Double): Double = {
    // Spark's Round passes non-finite doubles through; BigDecimal.valueOf
    // would throw NumberFormatException on them — one NaN embedding
    // element must degrade (the argmin just never picks a NaN distance,
    // matching NaN-sorts-last), not crash the query
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    if (x >= 0 && x < 1e4) {
      val f = x * 1e6
      val fl = math.floor(f)
      val frac = f - fl
      if (frac < 0.4999 || frac > 0.5001)
        return (if (frac >= 0.5) fl + 1.0 else fl) / 1e6
    }
    java.math.BigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
      .doubleValue()
  }

  /** Column entry point. `codebook` is (id, subvector-source vector)
    * pairs; callers sort by id ascending so the strict `<` argmin keeps
    * the lowest id on distance ties (= `min_by(id, struct(d, id))`).
    */
  def pq_encode(e: Column, sub: Int, codebook: Seq[(Long, Array[Float])],
      m: Int): Column = {
    val sorted = codebook.sortBy(_._1)
    ColumnBridge.column(PqEncode(ColumnBridge.expression(e), sub,
      sorted.map(_._1).toArray, sorted.map(_._2).toArray, m))
  }
}
