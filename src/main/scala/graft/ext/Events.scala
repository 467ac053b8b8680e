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
    * The (event_type, day) grid is DENSIFIED between each type's first
    * and last observed day before the window runs: a day with zero
    * events produces no row in the raw rollup, so without the densify a
    * complete outage — the headline use case — would be absent from the
    * output entirely, and the ROWS frame would silently mean "last 7
    * OBSERVED days", stretching the baseline across gaps. With it,
    * gap days appear as n = 0 rows (z ≪ 0 fires) and the ROWS frame is
    * a true trailing calendar week. Days before first ingest / after
    * last are unknowable, not zero — the grid stays per-type min..max.
    *
    * Determinism: the trailing mean/variance come from EXACT integer
    * window sums (m = Σx/k, var = (Σx² − k·m²)/(k−1)) so both engines
    * divide the identical integers; z is only defined where the full
    * 7-day history exists AND the variance is positive (a flat history
    * has no scale to deviate from — null z, never ±inf), and the
    * divisions are when()-guarded so the ANSI path never sees k = 0/1.
    *
    * Scale shape: one keyed daily rollup (partial-aggregated — the only
    * corpus-scale shuffle), then a |types|-bounded min/max agg whose
    * exploded date grid and the window both stay |types|·|days| rows.
    */
  def dailyAnomaly(events: DataFrame, trailing: Int = 7,
      zThreshold: Double = 3.0): DataFrame = {
    require(trailing >= 2, s"trailing must be >= 2: $trailing")
    val observed = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val grid = observed.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val daily = grid
      .join(observed, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
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
