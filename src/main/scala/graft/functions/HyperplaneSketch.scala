package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** `hyperplane_sketch(embedding)`: all `tables` random-hyperplane LSH
  * bucket ids of a float vector in one pass — element t is the bucket in
  * table t, the packed sign bits of `nbits` projections against fixed
  * pseudo-random hyperplanes (plane index `t*nbits + bit`).
  *
  * Semantically identical to `tables` × [[graft.ext.Similarity.hyperplaneBucket]]
  * (asserted bit-equal in GraftFunctionsSpec), but those compose
  * `tables × nbits` separate `vec_dot`-against-literal nodes into one
  * projection — measured ~2.5 s *per stage* at sf0.1 from giant-tree
  * evaluation, paid once per join side. Here the whole sketch is a single
  * expression over one shared `float[tables·nbits][dim]` weight matrix
  * (a plan-time reference object, not 12k inline literals), with tight
  * codegen'd loops and a single output allocation per row.
  *
  * The weight derivation ([[planeWeight]], splitmix64) is reproduced
  * bit-exactly by the DuckDB oracle (ExtQueries.bucketsCte), so the
  * candidate sets stay engine-portable.
  */
case class HyperplaneSketch(child: Expression, dim: Int, nbits: Int,
    tables: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sketch needs array<float>, got ${other.simpleString}")
    }

  @transient private lazy val weights: Array[Array[Float]] =
    HyperplaneSketch.weightMatrix(dim, nbits, tables)

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var bit = 0
      while (bit < nbits) {
        val w = weights(t * nbits + bit)
        val n = math.min(e.numElements(), w.length)
        var s = 0.0
        var d = 0
        while (d < n) {
          s += e.getFloat(d).toDouble * w(d).toDouble
          d += 1
        }
        if (s >= 0) b |= (1L << bit)
        bit += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("hyperplaneWeights", weights, "float[][]")
    nullSafeCodeGen(ctx, ev, e => {
      val t = ctx.freshName("t")
      val bit = ctx.freshName("bit")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val b = ctx.freshName("b")
      val w = ctx.freshName("w")
      val out = ctx.freshName("out")
      s"""
        long[] $out = new long[$tables];
        for (int $t = 0; $t < $tables; $t++) {
          long $b = 0L;
          for (int $bit = 0; $bit < $nbits; $bit++) {
            float[] $w = $wRef[$t * $nbits + $bit];
            int $n = java.lang.Math.min($e.numElements(), $w.length);
            double $s = 0.0;
            for (int $d = 0; $d < $n; $d++) {
              $s += (double) $e.getFloat($d) * (double) $w[$d];
            }
            if ($s >= 0) $b |= (1L << $bit);
          }
          $out[$t] = $b;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneSketch = copy(child = newChild)
}

object HyperplaneSketch {

  /** Fixed splitmix64-ish pseudo-random weight in [-1, 1) for (plane,
    * dim) — the single source of truth shared by the inline
    * `hyperplaneBucket` form and the DuckDB oracle replication.
    */
  def planeWeight(plane: Int, d: Int): Double = {
    var z = (plane.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  def weightMatrix(dim: Int, nbits: Int, tables: Int): Array[Array[Float]] =
    Array.tabulate(tables * nbits) { plane =>
      Array.tabulate(dim)(d => planeWeight(plane, d).toFloat)
    }

  def hyperplane_sketch(e: Column, dim: Int, nbits: Int, tables: Int): Column =
    ColumnBridge.column(
      HyperplaneSketch(ColumnBridge.expression(e), dim, nbits, tables))
}
