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
      .config("spark.sql.optimizer.excludedRules", excludedOptimizerRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** InferFiltersFromGenerate synthesizes `size(arr) > 0 AND
    * isnotnull(arr)` under every explode and pushes it below the
    * projection that computes `arr` — for computed arrays (shingles,
    * signatures: interpreted higher-order functions, no codegen CSE)
    * that re-evaluates the whole array expression once per inferred
    * conjunct on every row. Measured: 2–3× the corpus shingle cost on
    * the contamination/inverted-index paths. The rule only prunes rows
    * early (never changes results), and every explode in this engine
    * either already filters empties or tolerates them, so it is excluded
    * session-wide. Arrays read from storage lose nothing measurable.
    */
  private val excludedOptimizerRules =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"

  /** Apply graft defaults to an externally created session (driver-owned
    * sessions in Verify/Bench). Safe: only sets runtime-settable confs. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.optimizer.excludedRules", excludedOptimizerRules)
    spark
  }
}
