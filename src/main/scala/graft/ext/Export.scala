package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis._

/** The end-of-pipeline materialization operators: the training-shard
  * export composite (quality gate ∘ exact-dedup representative ∘
  * deterministic split ∘ label join ∘ token count) and its shard-level
  * manifest. One library definition backs the x32/x33 declared queries
  * and the ExtSpec semantics fixture — the driver gate's synthetic
  * corpus happens to contain no gate-failures or exact duplicates at
  * the gate SFs, so the spec is what pins the drop/keep and
  * missing-label behaviors.
  */
object Export {

  /** Per-document export decision: keep quality-passing dedup
    * representatives, with split assignment and the (nullable) label
    * from the embedding relation. No trailing order — callers order.
    */
  def trainingExport(docs: DataFrame, emb: DataFrame): DataFrame = {
    val flags = qualityFlags(docs).select(col("doc_id"), col("keep"))
    val rep = docs
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .withColumn("is_rep",
        col("doc_id") === min(col("doc_id"))
          .over(Window.partitionBy(col("fp"))))
      .select(col("doc_id"), col("is_rep"))
    val lab = emb.select(col("vec_id").as("doc_id"), col("label"))
    docs.select(col("doc_id"), col("source"),
      tokenCount(col("text")).cast("long").as("n_tokens"))
      .join(flags, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .filter(col("keep") && col("is_rep"))
      .join(lab, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        Sampling.split(col("doc_id")).as("split"),
        col("n_tokens"), col("label"))
  }

  /** Batch admission control — the incremental-ingest composite: for
    * each NEW-batch document, run the four gates a continuously fed
    * pipeline applies before letting data in, in ONE plan, and emit the
    * verdict with the first-failing-stage reason. Each gate is the
    * already-declared operator: the Gopher quality gate (x19), the exact
    * fingerprint probe vs the base corpus (x31), the fuzzy near-dup
    * probe (x59), and 5-gram decontamination vs the eval set (x23).
    *
    * Scale shape inherits from the parts: quality is per-row + a per-doc
    * bigram agg; the exact probe joins on a 16-byte key against the
    * base's fingerprint column only; the fuzzy probe's candidate mass is
    * ∝ batch (see [[Dedup.incrementalFuzzyDedup]]); the eval shingle set
    * is broadcast (eval benchmarks are small by definition) so the batch
    * never shuffles for the contamination check.
    */
  def batchAdmission(docs: DataFrame, basePred: Column, evalPred: Column,
      n: Int = 3, threshold: Double = 0.5, contamN: Int = 5): DataFrame = {
    val base = docs.filter(basePred)
    val batch = docs.filter(!basePred)
    val quality = qualityFlags(batch)
      .select(col("doc_id"), col("keep").as("keep_quality"))
    val exactDup = batch
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .join(base.select(fingerprint(col("text")).as("fp")).distinct()
        .withColumn("seen", lit(1)), Seq("fp"), "left")
      .select(col("doc_id"), col("seen").isNotNull.as("dup_exact"))
    val fuzzy = Dedup.incrementalFuzzyDedup(base, batch, n, threshold)
      .select(col("doc_id"), col("dup_of_base").as("dup_fuzzy"))
    val evalSh = Dedup.shingled(docs.filter(evalPred), contamN)
      .select(explode(col("sg")).as("sh")).distinct()
    val contaminated = Dedup.shingled(batch, contamN)
      .select(col("doc_id"), explode(col("sg")).as("sh"))
      .join(broadcast(evalSh), Seq("sh"))
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(true))
    quality
      .join(exactDup, Seq("doc_id"))
      .join(fuzzy, Seq("doc_id"))
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("contaminated", coalesce(col("hit"), lit(false)))
      .drop("hit")
      .withColumn("admit", col("keep_quality") && !col("dup_exact") &&
        !col("dup_fuzzy") && !col("contaminated"))
      .withColumn("reason",
        when(!col("keep_quality"), "quality")
          .when(col("dup_exact"), "exact_dup")
          .when(col("dup_fuzzy"), "near_dup")
          .when(col("contaminated"), "contaminated")
          .otherwise("ok"))
  }

  /** Shard-level manifest of an export: per (split, source) volume and
    * token mass — what the writer uses to plan output files.
    */
  def shardManifest(export: DataFrame): DataFrame =
    export.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))

  /** Sequence packing — the concat-and-cut step that turns a
    * variable-length document stream into fixed-token-budget training
    * sequences (GPT-style packing): documents are laid end-to-end in
    * `orderCol` order within each `partCol` shard, and a document whose
    * cumulative START offset falls in `[i·budget, (i+1)·budget)` lands in
    * pack `i`. Deterministic — packing is a pure function of the
    * (part, order, tokens) triple, so re-runs and the DuckDB oracle
    * reproduce pack ids bit-for-bit.
    *
    * Output: one row per (part, pack) with document count, token mass,
    * and the id range — the manifest a shard writer consumes.
    *
    * Scale shape: ONE window partitioned by `partCol` (the running token
    * offset) + one keyed aggregation. Within-shard packing is inherently
    * sequential (each pack id depends on every predecessor's length —
    * that IS the operator), so parallelism comes from the shard column:
    * at 100 TB you pack within `source` × writer-shard partitions, never
    * one global stream; a caller with a single giant source first salts
    * it into bounded sub-shards (the x38 hash-rank pattern) and passes
    * that as `partCol`.
    */
  def packSequences(df: DataFrame, partCol: Column, orderCol: Column,
      tokCol: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    df.select(partCol.as("part"), orderCol.as("ord"), tokCol.as("nt"))
      .withColumn("off", coalesce(sum(col("nt")).over(
        Window.partitionBy(col("part")).orderBy(col("ord"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_id", floor(col("off") / budget))
      .groupBy(col("part"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("pack_tokens"),
        min(col("ord")).as("first_id"),
        max(col("ord")).as("last_id"))
  }
}
