package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row with
  * `right.time < left.time` (strict; `<=` when `strict=false`) within the
  * same key. Spark has no native ASOF operator; per the engine's
  * custom-operator policy this is expressed by *composition* (preference
  * (a) in the build rules): tag both sides, union, and carry the last
  * non-null right payload forward with an ordered window.
  *
  * Scale shape: one shuffle+sort on (key, time) over left+right — the
  * same cost as the sort phase of a sort-merge join, with no pairwise
  * blow-up regardless of how many rights precede a left. Ties at equal
  * time are resolved by the side ordinal (right sorts after left under
  * strict semantics, so an equal-time right is not visible), which is
  * exactly DuckDB's `ASOF JOIN ... ON l.t > r.t` contract; among several
  * RIGHT rows at the same time the max payload struct wins — a
  * deliberate determinism guarantee, at the documented price that
  * payload columns must be orderable types (structs/atoms, not maps).
  */
object AsOfJoin {

  /** @param rightPayload right-side columns to surface on matched rows
    *                     (null when no right row precedes the left row)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightPayload: Seq[String],
      strict: Boolean = true): DataFrame = {
    val pay = struct(rightPayload.map(col): _*)
    val r0 = right.select(
      col(key), col(time), pay.as("__pay"),
      lit(if (strict) 1 else -1).as("__side"))
    val l0 = left
      .withColumn("__pay", lit(null).cast(r0.schema("__pay").dataType))
      .withColumn("__side", lit(0))
    val u = l0.unionByName(r0, allowMissingColumns = true)
    // __pay as the final sort key pins which of several equal-time right
    // rows wins (max payload struct) — without it the window-frame-last
    // is partitioning-dependent
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    rightPayload.foldLeft(matched) { (df, p) =>
      df.withColumn(p, col(s"__match.$p"))
    }.drop("__pay", "__side", "__match")
  }

  /** Skew-resistant as-of join: identical semantics to [[asOf]], but the
    * big window partitions on (key, time-band) instead of the bare key,
    * so one hot key no longer serializes through a single partition.
    *
    * band = floor(time / bandWidth). Within a band the usual
    * union+carry-forward window applies; the match for rows before the
    * band's first right is the *carry-in*: the last right payload of any
    * earlier band, computed on the one-row-per-(key, band) aggregate —
    * that tiny relation is the only thing still windowed per bare key, so
    * the hot key costs O(#bands), not O(#rows). Every band boundary
    * respects strictness by construction: a right in an earlier band is
    * strictly before any left time in this band.
    *
    * Scale: all row-level shuffles key on (key, band); pick bandWidth so
    * a hot key's densest band fits an executor partition (SCALE.md).
    */
  def asOfBanded(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightPayload: Seq[String],
      bandWidth: Long,
      strict: Boolean = true): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val pay = struct(rightPayload.map(col): _*)
    // exact integer floor division: pmod is non-negative, so (t - pmod) is
    // the floor multiple of bandWidth for negatives too, and SQL `div` on
    // the exact multiple is precise over the full long range — a double
    // division would misplace boundary rows for |t| > 2^53 (epoch-nanos)
    val band = expr(
      s"(cast(`$time` as bigint) - pmod(cast(`$time` as bigint), " +
        s"cast($bandWidth as bigint))) div cast($bandWidth as bigint)")
    val r0 = right.select(
      col(key), col(time), pay.as("__pay"),
      lit(if (strict) 1 else -1).as("__side"), band.as("__band"))
    val l0 = left
      .withColumn("__pay", lit(null).cast(r0.schema("__pay").dataType))
      .withColumn("__side", lit(0))
      .withColumn("__band", band)
    val u = l0.unionByName(r0, allowMissingColumns = true)
    // __pay as the final sort / max_by key on BOTH paths: equal-time
    // right rows then resolve identically (max payload struct) in the
    // within-band window, the cross-band carry, and plain [[asOf]]
    val wIn = Window.partitionBy(col(key), col("__band"))
      .orderBy(col(time).asc, col("__side").asc, col("__pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one row per (key, band) that contains a right: its last payload
    val perBand = r0.groupBy(col(key), col("__band"))
      .agg(max_by(col("__pay"), struct(col(time), col("__side"), col("__pay")))
        .as("__bandLast"))
    // densify over every band seen on either side, then carry the last
    // earlier-band payload forward — the bare-key window runs on band
    // granularity only
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__band").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.select(col(key), col("__band")).distinct()
      .join(perBand, Seq(key, "__band"), "left")
      .withColumn("__carry", last(col("__bandLast"), ignoreNulls = true)
        .over(wCarry))
      .select(col(key), col("__band"), col("__carry"))
    val matched = u
      .withColumn("__in", last(col("__pay"), ignoreNulls = true).over(wIn))
      .join(carry, Seq(key, "__band"), "left")
      .filter(col("__side") === 0)
      .withColumn("__match", coalesce(col("__in"), col("__carry")))
    rightPayload.foldLeft(matched) { (df, p) =>
      df.withColumn(p, col(s"__match.$p"))
    }.drop("__pay", "__side", "__band", "__in", "__carry", "__match")
  }
}
