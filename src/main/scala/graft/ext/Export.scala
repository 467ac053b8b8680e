package graft.ext

import org.apache.spark.sql.DataFrame
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

  /** Shard-level manifest of an export: per (split, source) volume and
    * token mass — what the writer uses to plan output files.
    */
  def shardManifest(export: DataFrame): DataFrame =
    export.groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
}
