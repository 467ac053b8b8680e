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

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as a long
    * (legacy conf) and convert to a micros timestamp — integer `div`, so
    * truncation matches what nanos→micros readers (DuckDB) do.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
