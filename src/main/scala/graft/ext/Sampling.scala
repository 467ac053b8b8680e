package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting/sampling for training-data pipelines.
  *
  * A train/val/test split at 100 TB must be a *function of the row*, not
  * of run order: `rand()` seeds differently per task retry and resize,
  * while a hash bucket of the stable document id gives the same
  * assignment on every engine, every run, and every subset of the data —
  * so downstream jobs can recompute membership instead of joining
  * against a materialized split table. md5 keeps it engine-portable
  * (DuckDB reproduces the bucket byte-for-byte in the x18 oracle).
  */
object Sampling {

  /** Uniform deterministic bucket in [0, buckets): the first 8 hex chars
    * of md5("salt:id") as an integer, mod buckets. Changing the salt
    * re-deals every assignment (e.g. per-experiment splits).
    */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8),
      16, 10).cast("long") % buckets

  /** 80/10/10 train/val/test assignment from [[hashBucket]]. */
  def split(id: Column, salt: String = "split"): Column = {
    val b = hashBucket(id, salt, 100)
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  /** Leakage-safe train/val/test split: every member of a near-dup
    * cluster receives the split OF ITS CLUSTER LABEL, so two
    * near-duplicate documents can never land on opposite sides of a
    * train/eval boundary — the eval-contamination bug a per-doc hash
    * split ([[split]]) cannot prevent (near-dups hash independently and
    * straddle the cut ~32% of the time at 80/10/10). `clusters` is
    * [[graft.ext.Dedup.dedupClusters]] output (doc_id, cluster); the
    * hash is salted on the CLUSTER id, so singletons (cluster = own id)
    * reproduce the plain x18 assignment exactly and adding edges only
    * ever *merges* assignments, never re-deals untouched docs.
    *
    * Scale shape: one narrow map over the cluster relation — the CC
    * fixpoint upstream is the only heavy step and is already the x17
    * scale path (banded candidates + checkpointed label propagation).
    */
  def leakageSafeSplit(clusters: DataFrame, salt: String = "split"): DataFrame =
    clusters.select(col("doc_id"), col("cluster"),
      split(col("cluster"), salt).as("split"))

  /** Split-leakage audit: the measurement that motivates
    * [[leakageSafeSplit]]. Given verified near-dup pairs (da, db) —
    * any of the [[graft.ext.Dedup]] pair producers — assign each side
    * its NAIVE per-doc split and tabulate the (split_a, split_b) matrix;
    * off-diagonal mass is evaluation contamination (a train doc with a
    * near-duplicate in val/test). At 80/10/10 the expected leak rate of
    * independent hashing is 1 − (0.8² + 0.1² + 0.1²) = 34%, so any
    * corpus with near-dups NEEDS the cluster-aware split; this report is
    * the before/after evidence. At most 9 output rows; one grouped count
    * over the pair relation (which the banded dedup path already bounds).
    */
  def splitLeakageAudit(pairs: DataFrame, salt: String = "split"): DataFrame =
    pairs
      .select(split(col("da"), salt).as("split_a"),
        split(col("db"), salt).as("split_b"))
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))

  /** Deterministic stratified sample: EXACTLY `n` rows per stratum
    * (fewer only if the stratum is smaller) — the eval-set / human-audit
    * draw, where "about n" (a Bernoulli rate) is not acceptable. Rank =
    * row_number over md5("salt:id") within the stratum with an id
    * tie-break, so the draw is a pure function of the row: every engine,
    * run, and data subset re-deals identically, and growing a stratum
    * only ever *displaces* ranks (a kept row can drop out, but the draw
    * never reshuffles randomly).
    *
    * Scale shape: one hash-partitioned window per stratum. A stratum
    * skewed to billions of rows serializes its sort through one
    * partition — there, pre-filter on a PREFIX RANGE of the same sort
    * key (`md5("salt:id") < T` for a hex threshold T expected to keep
    * ≫ n rows per stratum) and rank only the survivors: the window
    * orders by that very key ascending, so the true top-n all satisfy
    * any prefix range that retains ≥ n rows, and the two-phase draw is
    * identical. (A [[hashBucket]]-style modular prefilter does NOT
    * commute with the rank — bucket membership is uncorrelated with the
    * key's lexicographic order, so it silently changes the sample.)
    */
  def stratifiedSample(df: DataFrame, strata: Column, id: Column, n: Int,
      salt: String = "sample"): DataFrame = {
    val w = Window.partitionBy(strata)
      .orderBy(md5(concat(lit(salt + ":"), id.cast("string"))), id)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): every row draws a
    * deterministic uniform u ∈ (0, 1] from its salted id hash and is
    * ranked by the priority ln(u)/w — the k largest priorities are
    * EXACTLY a weight-proportional sample without replacement (the
    * paper's u^(1/w) key under the order-preserving ln). The draw is a
    * pure function of (salt, id, w): identical on every engine, every
    * run, and every partitioning — the property `rand()`-based samplers
    * lose on task retry — and upweighting a row only ever moves it UP
    * the ranking.
    *
    * `w` must be > 0; non-positive-weight rows are excluded (they have
    * zero selection probability by definition). The priority is rounded
    * to 9 dp before ranking so the two engines' last-ulp `ln`
    * differences cannot flip an order, with the id as total tie-break.
    *
    * Scale shape: one narrow map (hash → u → priority) and a global
    * top-k via TakeOrderedAndProject — per-partition k-heaps, no full
    * sort, no shuffle beyond k rows per partition. The 100 TB importance
    * sampler: k rows out, one pass over the corpus.
    */
  def weightedSample(df: DataFrame, id: Column, weight: Column, k: Int,
      salt: String = "wrs"): DataFrame = {
    require(k > 0, s"sample size must be > 0, got $k")
    val h = graft.ext.TextAnalysis.hash60(
      concat(lit(salt + ":"), id.cast("string")))
    // (h + 1) / 2^60 ∈ (2^-60, 1] — never 0, so ln is finite
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0)
    df.filter(weight > 0)
      .withColumn("priority", round(log(u) / weight, 9))
      .orderBy(col("priority").desc, id.asc)
      .limit(k)
  }

  /** Sample-representativeness audit: does a deterministic sample COVER
    * the corpus's semantic regions, or did it silently starve some? Per
    * trained IVF cell ([[Similarity.cellAssignments]]), the corpus
    * share vs the share inside a [[hashBucket]] `samplePct`% sample,
    * the per-cell log-ratio, and the cell's contribution to
    * KL(sample ‖ corpus) — the audit read BEFORE trusting any sampled
    * subset (x18/x38/x103) as an eval or distillation proxy; Σ kl_term
    * near 0 means representative, a large positive cell term means the
    * sample over-concentrated there, a null log_ratio flags a region
    * the sample missed entirely.
    *
    * Determinism contract: counts are exact; the ratio inside ln is the
    * integer-product form (n_s·C)/(n_c·S) — both factors exact in
    * doubles up to 2^53, so both engines take ln of the identical
    * double and the 6/9-dp rounds agree. n_sample = 0 pins log_ratio
    * null and kl_term 0 (the standard 0·ln0 = 0 convention).
    *
    * Scale shape: one corpus pass against the broadcast centroids
    * (the x15 contract) with the sample flag computed inline — no join
    * against a sample table — then everything is cells-bounded.
    */
  def coverageAudit(emb: DataFrame, centroids: DataFrame,
      samplePct: Int = 10, salt: String = "cov"): DataFrame = {
    require(samplePct > 0 && samplePct < 100,
      s"samplePct must be in (0, 100): $samplePct")
    import org.apache.spark.sql.types.DoubleType
    val flagged = Similarity.cellAssignments(emb, centroids)
      .withColumn("in_sample",
        hashBucket(col("vec_id"), salt, 100) < samplePct)
    val per = flagged.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_corpus"),
        sum(when(col("in_sample"), 1L).otherwise(0L)).as("n_sample"))
    val tot = per.agg(sum(col("n_corpus")).as("tc"),
      sum(col("n_sample")).as("ts"))
    val lnRatio = log((col("n_sample") * col("tc")).cast(DoubleType) /
      (col("n_corpus") * col("ts")).cast(DoubleType))
    per.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_corpus"), col("n_sample"),
        round(col("n_corpus").cast(DoubleType) / col("tc"), 6)
          .as("p_corpus"),
        when(col("ts") === 0, lit(null).cast(DoubleType))
          .otherwise(round(col("n_sample").cast(DoubleType) / col("ts"), 6))
          .as("p_sample"),
        when(col("n_sample") > 0, round(lnRatio, 6)).as("log_ratio"),
        when(col("n_sample") > 0,
          round((col("n_sample").cast(DoubleType) / col("ts")) * lnRatio, 9))
          .otherwise(lit(0.0)).as("kl_term"))
  }
}
