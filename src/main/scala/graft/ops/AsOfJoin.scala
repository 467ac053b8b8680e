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
  * exactly DuckDB's `ASOF JOIN ... ON l.t > r.t` contract.
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
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    rightPayload.foldLeft(matched) { (df, p) =>
      df.withColumn(p, col(s"__match.$p"))
    }.drop("__pay", "__side", "__match")
  }
}
