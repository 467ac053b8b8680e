package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Event-stream health operators over the `events` table — the
  * pipeline-monitoring face of the engine (the q13/q14 window machinery
  * applied to operational questions rather than analytics).
  */
object Events {

  /** Ingest-rate anomaly detection: per (event_type, day) counts with a
    * trailing-7-day z-score — flags a feed going dark (z ≪ 0) or a
    * scraper runaway (z ≫ 0) before either poisons a training batch.
    *
    * Determinism: the trailing mean/variance come from EXACT integer
    * window sums (m = Σx/k, var = (Σx² − k·m²)/(k−1)) so both engines
    * divide the identical integers; z is only defined where the full
    * 7-day history exists AND the variance is positive (a flat history
    * has no scale to deviate from — null z, never ±inf), and the
    * divisions are when()-guarded so the ANSI path never sees k = 0/1.
    *
    * Scale shape: one keyed daily rollup (partial-aggregated — the only
    * corpus-scale shuffle), then a types×days-bounded ROWS window. At
    * 100 TB of events the window input is still |types|·|days| rows.
    */
  def dailyAnomaly(events: DataFrame, trailing: Int = 7,
      zThreshold: Double = 3.0): DataFrame = {
    require(trailing >= 2, s"trailing must be >= 2: $trailing")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("day")).rowsBetween(-trailing, -1)
    daily
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("sx", sum(col("n")).over(w))
      .withColumn("sxx", sum(col("n") * col("n")).over(w))
      .withColumn("m",
        when(col("k") >= 1, col("sx").cast(DoubleType) / col("k")))
      .withColumn("variance",
        when(col("k") >= 2,
          (col("sxx").cast(DoubleType) - col("k") * col("m") * col("m")) /
            (col("k") - 1)))
      .select(col("event_type"), col("day"), col("n"),
        when(col("k") === trailing, round(col("m"), 6)).as("trail_mean"),
        when(col("k") === trailing && col("variance") > 0,
          round((col("n") - col("m")) / sqrt(col("variance")), 6))
          .as("z"))
      .withColumn("anomaly",
        coalesce(abs(col("z")) >= zThreshold, lit(false)))
  }
}
