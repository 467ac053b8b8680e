package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting/sampling for training-data pipelines.
  *
  * A train/val/test split at 100 TB must be a *function of the row*, not
  * of run order: `rand()` seeds differently per task retry and resize,
  * while a hash bucket of the stable document id gives the same
  * assignment on every engine, every run, and every subset of the data —
  * so downstream jobs can recompute membership instead of joining
  * against a materialized split table. md5 keeps it engine-portable
  * (DuckDB reproduces the bucket byte-for-byte in the x18 oracle).
  */
object Sampling {

  /** Uniform deterministic bucket in [0, buckets): the first 8 hex chars
    * of md5("salt:id") as an integer, mod buckets. Changing the salt
    * re-deals every assignment (e.g. per-experiment splits).
    */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets

  /** 80/10/10 train/val/test assignment from [[hashBucket]]. */
  def split(id: Column, salt: String = "split"): Column = {
    val b = hashBucket(id, salt, 100)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }
}
