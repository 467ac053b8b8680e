package graft.ext

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Fixed-memory frequency sketches — the approximate lever behind the
  * exact corpus-statistics queries.
  *
  * The exact heavy-hitter plan (x36) shuffles (term, count) pairs: fine
  * while term cardinality is bounded, unbounded at adversarial
  * cardinality (every n-gram unique). A count-min sketch caps the state
  * at depth×width counters per partition regardless of cardinality, at
  * the price of one-sided error: estimates only ever OVERCOUNT (by ≤
  * eps·N with the configured confidence), so a sketch-driven top-k can
  * admit a false heavy hitter but never drop a true one — the same
  * one-sided contract as the Bloom decontamination prefilter
  * ([[Contamination]]), and like it, meant to sit in front of an exact
  * pass over the (now bounded) survivors.
  */
object Sketches {

  /** Count-min sketch of a string column, built INSIDE the SQL engine via
    * the `count_min_sketch` aggregate (partial sketches per partition,
    * bitwise merge at the final agg — one pass, no RDD drop-down). The
    * returned sketch is bounded driver state (depth ≈ ln(1/(1-confidence))
    * × width ≈ e/eps longs — ~2 MB at the defaults), the same class as
    * the Bloom filter and the PQ codebook. Fixed seed keeps the sketch —
    * and anything gated on it — deterministic across runs.
    */
  def countMin(df: DataFrame, colName: String, eps: Double = 1e-4,
      confidence: Double = 0.99, seed: Int = 42): CountMinSketch = {
    val bytes = df
      .select(expr(
        s"count_min_sketch($colName, ${eps}d, ${confidence}d, $seed)"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }
}
