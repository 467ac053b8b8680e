package graft.engine

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Defaults chosen for the 100 TB posture (SURVEY.md §4, §7.4-6):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *    replaces hand-tuned partition counts on a real cluster.
  *  - nested schema pruning on: our FHIR-ish schemas are deeply nested and a
  *    scan must not read whole resource structs for a 2-field projection
  *    (reference prunes by hand in its `$project` stages, db.go:100-104).
  *  - UTC session timezone: date derivations (bundle.go:54-60) must not
  *    depend on cluster-local timezones.
  *  - shuffle.partitions deliberately small for local[32]; on a cluster this
  *    is overridden by AQE + `spark.sql.adaptive.coalescePartitions`.
  */
object GraftSession {
  def build(
      master: String = "local[32]",
      appName: String = "graft",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Apply graft defaults to an externally created session (driver-owned
    * sessions in Verify/Bench). Safe: only sets runtime-settable confs. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
