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

  /** STATIC (context-creation-time) confs every graft session builder
    * must apply — these cannot go through [[tune]] because Spark
    * refuses them on a live context. One entry (r19 measurement,
    * OPTIMIZATION_r19.md):
    *
    *  - `spark.shuffle.sort.bypassMergeThreshold=1`: never use the
    *    bypass-merge shuffle writer. For every SQL exchange with R
    *    reduce partitions under the threshold (default 200), the
    *    bypass writer creates R per-partition files per MAP TASK and
    *    concatenates them through FileChannel.transferTo (an
    *    mmap/unmap per file) — thread dumps of the r19 baseline
    *    showed the trainer queries' task threads pinned in
    *    FileOutputStream.open0/FileChannelImpl.map0 doing exactly
    *    that, and 32 concurrent tasks contending on the kernel mmap
    *    lock burned ~0.3–0.6 s of KERNEL CPU per task on 3-row
    *    partitions (x122: 26 CPU-s/pass → 3–10 with the serialized
    *    sort writer; x128: 32–42 → 8–10). The serialized sort writer
    *    (UnsafeShuffleWriter — the only writer at production R > 200
    *    anyway) writes ONE data file per map task at any R; its
    *    partition-id pointer sort is noise. Scale posture: at real
    *    cluster R this conf is moot (bypass never fires past 200);
    *    for small-R shuffles it removes an O(R) file-create/mmap term
    *    per map task on any filesystem.
    */
  /** Second entry (r20): `spark.sql.extensions=GraftExtensions` —
    * registers the engine's SQL functions AND the [[SortSampleCut]]
    * AQE prep rule (global-sort range-sampling must not re-execute the
    * query's final stage; see that rule's scaladoc for the evidence).
    * Static because session extensions are fixed at session creation.
    */
  val staticConfs: Seq[(String, String)] = Seq(
    "spark.shuffle.sort.bypassMergeThreshold" -> "1",
    "spark.sql.extensions" -> "graft.engine.GraftExtensions")

  def build(
      master: String = "local[32]",
      appName: String = "graft",
      shufflePartitions: Int = 32): SparkSession = {
    val builder0 = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    val spark = staticConfs.foldLeft(builder0) {
      case (b, (k, v)) => b.config(k, v)
    }
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
