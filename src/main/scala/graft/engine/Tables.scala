package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated testdata star schema (TESTDATA.md).
  *
  * One parquet file per table under a scale-factor directory. At 100 TB each
  * of these would be a multi-file partitioned dataset; `spark.read.parquet`
  * handles both transparently, and every query in [[graft.SparkEntry]] is
  * written against the DataFrame, never against file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has been written both as parquet TIMESTAMP(MICROS) (reads
    * natively) and as TIMESTAMP(NANOS), which Spark 4 rejects outright
    * ([PARQUET_TYPE_ILLEGAL]) unless read as a long (legacy conf). Adapt to
    * whichever this file carries: if `ts` surfaces as a long it was nanos —
    * convert with integer `div` so truncation matches what nanos→micros
    * readers (DuckDB) do; if it is already a timestamp, pass through.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize the `ts` column to TIMESTAMP (LTZ) whatever the file carried:
    * nanos-as-long → integer `div` to micros (truncation matches DuckDB's
    * nanos→micros read); TIMESTAMP_NTZ → plain cast (session tz is pinned to
    * UTC in GraftSession, so the cast is value-preserving; queries do epoch
    * arithmetic via cast-to-bigint, which NTZ does not support).
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
