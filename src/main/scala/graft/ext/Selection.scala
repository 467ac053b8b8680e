package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.ext.TextAnalysis.{bigrams, hash60, tokens}

/** Data-selection operators: model-based quality scoring and importance
  * weighting over the document corpus — the filters a training-data
  * pipeline runs between dedup and export to decide WHICH surviving
  * documents to train on (and how often).
  *
  * Two published techniques, re-expressed as single Spark plans:
  *   - [[bigramLmScore]]: CCNet-style (Wenzek et al., 2019) language-model
  *     perplexity scoring, with the LM trained on the corpus itself
  *     inside the same plan (no external model artifact).
  *   - [[dsirWeights]]: DSIR (Xie et al., 2023) importance resampling
  *     weights from hashed n-gram features — log-likelihood ratio of a
  *     target distribution vs the raw corpus distribution.
  *
  * The reference engine has no selection surface; these extend it the
  * same way the dedup/retrieval families do.
  */
object Selection {

  /** Exact decimal sum of 6-dp-rounded doubles — the engine-portable
    * aggregation rule ([[Retrieval]] uses the same): rounding first makes
    * every addend exactly representable, decimal summing makes the
    * reduction order irrelevant.
    */
  private def sum6(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast(DoubleType)

  /** Corpus-trained bigram language-model score per document: the mean
    * negative log-likelihood of the document's word bigrams under an
    * add-alpha-smoothed bigram model estimated from the WHOLE corpus.
    * Low score = phrasing the corpus considers ordinary prose; high
    * score = word soup, OCR noise, boilerplate the corpus rarely emits —
    * the CCNet quality signal, with the corpus itself standing in for
    * the clean LM corpus.
    *
    * Model: P(w2|w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha·V), where
    * c(w1 w2) is the corpus bigram count, c(w1 ·) its left-marginal
    * (Σ over w2 — derived from the bigram counts, no second corpus
    * pass), and V the corpus unigram vocabulary size. Per-bigram
    * −ln P is rounded to 6 dp, the per-doc mean is an exact decimal
    * sum / count rounded to 6 dp ([[sum6]]) — ties and hashes are
    * engine-portable. Documents with fewer than two tokens have no
    * bigrams and are absent from the output (callers keep them with a
    * left join; a score is meaningless for them).
    *
    * Returns (doc_id, n_bigrams, lm_score).
    *
    * Scale shape: one tokenize+explode pass over the corpus (Σ tokens
    * rows); the model is an aggregate of that same relation (vocab²-
    * bounded, far smaller than the corpus); per-bigram NLL is computed
    * ON THE MODEL relation (once per distinct bigram, not once per
    * occurrence) and joined back by bigram key — ONE corpus-scale
    * equi-join shuffle, partial-agg'd per-doc mean after it. Hot
    * bigrams (stopword pairs) are absorbed by map-side partial
    * aggregation in the count step and are plain join fan-in (not
    * fan-out) in the score step.
    */
  def bigramLmScore(docs: DataFrame, alpha: Double = 0.5): DataFrame = {
    val bg = docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(bigrams(col("ws"))).as("bg"))
    val counts = bg.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val leftMarginal = counts
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs
      .select(explode(tokens(col("text"))).as("w"))
      .agg(count_distinct(col("w")).as("v"))
    // NLL per DISTINCT bigram: the model relation is small, so the log
    // arithmetic runs |model| times, not |corpus bigrams| times
    val model = counts
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(leftMarginal, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("bg"), round(-log(
        (col("c12") + lit(alpha)) /
          (col("c1") + lit(alpha) * col("v"))), 6).as("nll"))
    bg.join(model, "bg")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum6(col("nll")) / count(lit(1)), 6).as("lm_score"))
  }

  /** DSIR importance weights from hashed bigram features: per document,
    * the log-likelihood ratio of a TARGET feature distribution (the
    * docs matching `isTarget` — the "domain I want more of") vs the RAW
    * corpus distribution, summed over the document's feature
    * occurrences. Positive weight = the document looks more like the
    * target than like the average corpus document; resampling
    * proportionally to exp(weight) is the DSIR selection rule.
    *
    * Features are word bigrams hashed into `buckets` buckets with the
    * engine-portable md5-based [[TextAnalysis.hash60]] (the x18/x22
    * hashing family), so the distributions are `buckets`-dimensional
    * regardless of vocabulary size. Both distributions are add-alpha
    * smoothed: p(f) = (c(f) + alpha) / (N + alpha·B). The per-bucket
    * log-ratio is rounded to 6 dp; the per-doc sum is exact decimal
    * ([[sum6]]). Docs with no bigrams are absent (as in
    * [[bigramLmScore]]).
    *
    * Returns (doc_id, n_feats, dsir_weight).
    *
    * Scale shape: one tokenize+explode+hash pass over the corpus; the
    * per-bucket count table is B rows (two tiny aggregates of the same
    * exploded relation — the target counts ride the raw pass as a
    * conditional sum, so the corpus is NOT read twice); the log-ratio
    * table is B rows and BROADCAST back onto the exploded corpus —
    * zero corpus-scale join shuffle, one partial-agg'd per-doc sum.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 4096, alpha: Double = 0.5): DataFrame = {
    val feats = docs
      .select(col("doc_id"), isTarget.as("is_target"),
        tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("is_target"),
        explode(bigrams(col("ws"))).as("bg"))
      .select(col("doc_id"), col("is_target"),
        (hash60(col("bg")) % buckets).as("f"))
    val bucketCounts = feats.groupBy(col("f"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt"))
    val totals = bucketCounts
      .agg(sum(col("n_raw")).as("big_n_raw"), sum(col("n_tgt")).as("big_n_tgt"))
    val logRatio = bucketCounts
      .crossJoin(broadcast(totals))
      .select(col("f"), round(
        log((col("n_tgt") + lit(alpha)) /
          (col("big_n_tgt") + lit(alpha) * buckets)) -
          log((col("n_raw") + lit(alpha)) /
            (col("big_n_raw") + lit(alpha) * buckets)), 6).as("lr"))
    feats.join(broadcast(logRatio), "f")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        round(sum6(col("lr")), 6).as("dsir_weight"))
  }

  /** Linear quality probe trained inside the engine: squared-loss
    * regression of a 0/1 target (`isTarget`) on the embedding, fit by
    * `iters` rounds of full-batch gradient descent, then scored over the
    * whole corpus — the learned analog of the hand-tuned x19 gate, and
    * the standard cheap "classifier filter" a pipeline trains on a
    * high-quality seed set to rank the rest of the corpus.
    *
    * Every nonassociative step is quantized so the math is
    * engine-portable (the sum6 rule): per-row gradient addends are
    * rounded to 6 dp and summed as DECIMAL (order-irrelevant), and each
    * weight update re-rounds to 6 dp. The margin itself is a raw
    * sequential double dot — [[Similarity.dotHof]] (the double-precision
    * HOF form: the weight side is double, so the float-only codegen
    * vec_dot doesn't apply), whose ascending accumulation DuckDB's
    * list_dot_product replicates.
    *
    * Scale shape: one aggregate-only pass per iteration (dim+1 partial
    * aggregates, NO groupBy shuffle, no explode), weights broadcast back
    * as plan-time literals; driver state is the dim-vector itself. At
    * 100 TB each iteration is a full scan — callers cache/checkpoint the
    * projected (embedding, y) relation once and pay T map-side passes.
    */
  def linearProbe(emb: DataFrame, isTarget: Column, dim: Int = 64,
      iters: Int = 3, lr: Double = 0.1): DataFrame = {
    def round6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val base = emb.select(col("vec_id"), col("embedding"),
      when(isTarget, 1.0).otherwise(0.0).as("y"))
    var w = Array.fill(dim)(0.0)
    for (_ <- 0 until iters) {
      // the margin MUST be materialized as a column before the gradient
      // aggregates: referenced inline it is an independent subtree of all
      // `dim` aggregate expressions, and the interpreted HOF dot would be
      // re-evaluated per DIMENSION per row — O(d²) work per row, the
      // lambda-capture trap the x25 quantizer fix documented
      val scored = base.withColumn("m",
        Similarity.dotHof(col("embedding"), typedlit(w.toSeq)))
      val aggs = (0 until dim).map { d =>
        sum(round((col("m") - col("y")) *
            element_at(col("embedding"), d + 1).cast(DoubleType), 6)
          .cast(DecimalType(38, 12))).as(s"g$d")
      } :+ count(lit(1)).as("n")
      val row = scored.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getLong(dim).toDouble
      w = Array.tabulate(dim) { d =>
        round6(w(d) - lr * (row.getDecimal(d).doubleValue() / n))
      }
    }
    base.select(col("vec_id"), col("y").cast("int").as("label_target"),
      round(Similarity.dotHof(col("embedding"), typedlit(w.toSeq)), 6)
        .as("score"))
  }

  /** c-TF-IDF cluster topic labels (Grootendorst 2022, BERTopic §2.3):
    * each document joins its k-means/IVF cell through the embedding
    * relation, and each cell is labeled with its top `topN` tokens by
    * class-based TF-IDF — `tf(t,c)/len(c) · ln(1 + A/tf(t))` with `A`
    * the mean tokens per cell and `tf(t)` the global token count. The
    * human-readable face of the cluster machinery: what IS cell 3,
    * answered with tokens.
    *
    * Scale shape: one tokenize/explode pass joined to the (vec_id,
    * cell) assignment, then every relation is cell×vocab-bounded —
    * grouped counts partial-aggregate map-side, the label window
    * partitions by cell, the mean-length normalizer is a 1-row
    * broadcast. Deterministic: rounded scores, (score DESC, token)
    * tie-break, and the same argmax cell assignment the IVF oracles
    * replicate.
    */
  def clusterTopicLabels(docs: DataFrame, emb: DataFrame,
      centroids: DataFrame, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Similarity.cellAssignments(emb, centroids)
      .withColumnRenamed("vec_id", "doc_id")
    val toks = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .join(cells, Seq("doc_id"))
    val tfc = toks.groupBy(col("cell"), col("token"))
      .agg(count(lit(1)).as("tf_c"))
    val lenc = tfc.groupBy(col("cell")).agg(sum(col("tf_c")).as("len_c"))
    val tfg = tfc.groupBy(col("token")).agg(sum(col("tf_c")).as("tf_g"))
    val aMean = lenc.agg(avg(col("len_c")).as("a_mean"))
    val scored = tfc.join(lenc, Seq("cell")).join(tfg, Seq("token"))
      .crossJoin(broadcast(aMean))
      .withColumn("ctfidf", round(col("tf_c") / col("len_c") *
        log(lit(1.0) + col("a_mean") / col("tf_g")), 6))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("ctfidf").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("cell"), col("rank"), col("token"), col("tf_c"),
        col("ctfidf"))
  }

  /** Pairwise source drift: symmetric KL divergence between the hashed-
    * bigram distributions of every source pair — the domain-shift
    * monitor that tells a mixing planner which sources are
    * interchangeable and which are distributionally distant. Same
    * feature hashing as [[dsirWeights]] (md5-60bit mod `buckets`), so
    * model state is `buckets`-bounded regardless of corpus size.
    *
    * Each source's distribution is densified over all `buckets` ids
    * (sources × buckets rows — bounded) with add-`alpha` smoothing so
    * zero-count buckets carry mass and every pair term is defined.
    * Determinism: probabilities rounded to 12 dp, per-bucket terms
    * `(p−q)·ln(p/q)` rounded to 9 dp and decimal-summed (the sum6
    * rule), output to 6 dp.
    *
    * Scale shape: one explode→grouped-count pass over the corpus; all
    * downstream relations are (sources × buckets)-bounded, the pair
    * join is keyed on the bucket id.
    */
  def sourceDriftMatrix(docs: DataFrame, buckets: Int = 4096,
      alpha: Double = 0.5): DataFrame = {
    import graft.engine.Checkpoints.MaterializeOps
    // counts is (sources × buckets)-bounded but its lineage is the full
    // corpus hash pass — and it is referenced THREE times downstream
    // (totals, and both sides of the pair self-join), which without a
    // cut re-runs the corpus scan per reference (measured 4.2 s vs
    // 2.1 s at sf0.1). Materialize the tiny relation once.
    val counts = docs
      .select(col("source"), tokens(col("text")).as("ws"))
      .select(col("source"), explode(bigrams(col("ws"))).as("bg"))
      .select(col("source"), (hash60(col("bg")) % buckets).as("f"))
      .groupBy(col("source"), col("f")).agg(count(lit(1)).as("n"))
      .materialized
    val totals = counts.groupBy(col("source")).agg(sum(col("n")).as("tot"))
    val dense = totals
      .select(col("source"), col("tot"),
        explode(sequence(lit(0), lit(buckets - 1))).as("f"))
      .join(counts, Seq("source", "f"), "left")
      .select(col("source"), col("f"),
        round((coalesce(col("n"), lit(0L)) + lit(alpha)) /
          (col("tot") + lit(alpha * buckets)), 12).as("p"))
    val a = dense.select(col("source").as("src_a"), col("f"),
      col("p").as("pa"))
    val b = dense.select(col("source").as("src_b"), col("f"),
      col("p").as("pb"))
    a.join(b, Seq("f"))
      .filter(col("src_a") < col("src_b"))
      .withColumn("term",
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 9))
      .groupBy(col("src_a"), col("src_b"))
      .agg(round(sum6(col("term")), 6).as("sym_kl"))
  }

  /** Temperature-scaled source mixture weights — the multinomial
    * sampling schedule over corpus sources (the `α`-smoothing of
    * multilingual/multi-domain pre-training, Conneau & Lample 2019):
    * each source's sampling weight is its token mass raised to
    * `1/temperature`, normalized; `sample_factor` is the implied
    * up/down-sampling rate relative to proportional sampling
    * (`weight · total_tokens / source_tokens` — >1 means the mix
    * repeats this source's data, <1 means it subsamples).
    *
    * Determinism contract (the x52/x53 rule): the per-source power is
    * rounded to 6 dp FIRST, the normalizer sums those addends as
    * decimals, so the reduction order never changes a weight. One
    * keyed aggregation over the corpus + a 1-row broadcast for the
    * normalizer — source cardinality is dim-table-class by definition.
    */
  def mixtureWeights(docs: DataFrame, temperature: Double = 2.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive: $temperature")
    val perSrc = docs
      .select(col("source"), tokens(col("text")).as("ws"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("ws")).cast("long")).as("n_tokens"))
      .withColumn("a", {
        // the default temperature (2.0 → exponent 0.5) goes through sqrt,
        // which is IEEE-correctly-rounded in every engine; pow is only
        // 1-ulp-bounded, and a cross-engine ulp at a round-to-6dp boundary
        // would flip a weight hash
        val ex = 1.0 / temperature
        val p = if (ex == 0.5) sqrt(col("n_tokens")) else pow(col("n_tokens"), ex)
        round(p, 6)
      })
    val norm = perSrc.agg(
      sum6(col("a")).as("a_total"),
      sum(col("n_tokens")).as("tok_total"))
    perSrc.crossJoin(broadcast(norm))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("a") / col("a_total"), 6).as("weight"),
        round(round(col("a") / col("a_total"), 6) * col("tok_total") /
          col("n_tokens"), 6).as("sample_factor"))
  }

  /** UniMax budget allocation (Chung, Garcia, Roberts et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining"): split a total token budget
    * B across sources so every source is repeated at most `epochCap`
    * times — low-resource sources contribute their full capped mass,
    * and whatever budget remains is split EQUALLY among the sources
    * rich enough to fill it. The fairer alternative to x64's
    * temperature mixture (which over-samples the head and still
    * over-epochs the tail at small T).
    *
    * Closed form of the paper's greedy loop, fully relational: sort
    * sources ascending by capacity cap = epochCap·n_tokens; a source at
    * ascending position i gets its full cap iff
    * cap_i·(L−i+1) ≤ B − Σ_{j<i} cap_j (EXACT integer comparison —
    * BIGINT masses, DECIMAL(38,0) product), and once one source fails
    * the test every later (richer) one fails too, all receiving the
    * identical equal share E = (B − Σ_{j<t} cap_j)/(L−t+1). One
    * ascending-capacity window (cumsum + row_number over the
    * source-cardinality relation) + a 1-row broadcast of the boundary —
    * no iteration, no driver state.
    *
    * Output per source: n_tokens, cap_tokens, alloc_tokens (3-dp; the
    * equal share is one integer division so engines agree bitwise),
    * epochs = alloc/n_tokens (6-dp) — the sampling plan a data loader
    * consumes directly.
    *
    * Scale shape: one tokenize pass to source cardinality, then every
    * relation is sources-bounded. The window sorts SOURCES, not docs.
    */
  def uniMaxAllocation(docs: DataFrame, budget: Long,
      epochCap: Int = 4): DataFrame = {
    require(budget > 0 && epochCap > 0)
    val dec0 = DecimalType(38, 0)
    val perSrc = docs
      .select(col("source"), tokens(col("text")).as("ws"))
      .groupBy(col("source"))
      .agg(sum(size(col("ws")).cast("long")).as("n_tokens"))
      .withColumn("cap", col("n_tokens") * epochCap)
    val w = Window.orderBy(col("cap").asc, col("source").asc)
    val ranked = perSrc
      .withColumn("idx", row_number().over(w))
      .withColumn("pre",
        coalesce(sum(col("cap").cast(dec0))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast(dec0)))
      .withColumn("nsrc", count(lit(1)).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("fits",
        col("cap").cast(dec0) * (col("nsrc") - col("idx") + 1) <=
          lit(budget).cast(dec0) - col("pre"))
    // boundary t = first ascending position where the cap no longer
    // fits; sources past it share (B − Σ_{j<t} cap_j)/(L−t+1) equally
    val boundary = ranked.filter(not(col("fits")))
      .agg(min(col("idx")).as("t"),
        min_by(col("pre"), col("idx")).as("pre_t"))
    ranked.crossJoin(broadcast(boundary))
      .select(col("source"), col("n_tokens"), col("cap").as("cap_tokens"),
        when(col("t").isNull || col("idx") < col("t"),
          col("cap").cast(DoubleType))
          .otherwise(round(
            (lit(budget).cast(dec0) - col("pre_t")).cast(DoubleType) /
              (col("nsrc") - col("t") + 1).cast(DoubleType), 3))
          .as("alloc_tokens"))
      .withColumn("epochs",
        round(col("alloc_tokens") / col("n_tokens"), 6))
      .select(col("source"), col("n_tokens"), col("cap_tokens"),
        col("alloc_tokens"), col("epochs"))
  }

  /** Reliability diagram of a scored relation — the calibration audit
    * (Guo et al., ICML'17, "On Calibration of Modern Neural Networks")
    * run on [[linearProbe]]'s (or any classifier-filter's) scores
    * before its threshold gates data: sigmoid the margin, bin the
    * probability into `bins` equal-width bins, and compare each bin's
    * mean predicted probability against its empirical positive rate.
    * `gap` per bin is the reliability-diagram deviation; `ece_term` is
    * the bin's contribution to Expected Calibration Error (Σ over the
    * output = ECE). An uncalibrated filter makes its "keep everything
    * above 0.9" knob meaningless — this is the audit that says whether
    * 0.9 means 90%.
    *
    * Determinism: p = round(sigmoid, 6); bin = floor(p·bins) clamped
    * (p = 1 joins the top bin); mean_p is a round-then-DECIMAL sum;
    * frac_pos is an exact count ratio — engine-portable throughout.
    *
    * Scale shape: one map + one `bins`-cardinality agg; the 1-row total
    * broadcast shapes the ece terms. Nothing retains the corpus.
    */
  def calibrationCurve(scored: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val dec = DecimalType(38, 12)
    val p = round(lit(1.0) / (lit(1.0) + exp(-score)), 6)
    val binned = scored
      .select(p.as("p"), label.cast("int").as("y"))
      .withColumn("bin",
        least(floor(col("p") * bins), lit((bins - 1).toDouble)).cast("int"))
    val per = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("y").cast("long")).as("n_pos"),
        sum(col("p").cast(dec)).as("p_sum"))
    val tot = per.agg(sum(col("n")).as("n_total"))
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("p_sum").cast(DoubleType) / col("n"), 6).as("mean_p"),
        round(col("n_pos").cast(DoubleType) / col("n"), 6).as("frac_pos"),
        col("n_total"))
      .withColumn("gap",
        round(abs(col("mean_p") - col("frac_pos")), 6))
      .withColumn("ece_term",
        round(col("n").cast(DoubleType) / col("n_total") * col("gap"), 9))
      .select(col("bin"), col("n"), col("n_pos"), col("mean_p"),
        col("frac_pos"), col("gap"), col("ece_term"))
  }

  /** Effective-number-of-samples class weights (Cui, Jia, Lin, Song &
    * Belongie, CVPR'19, "Class-Balanced Loss Based on Effective Number
    * of Samples"): weight_c ∝ (1−β)/(1−β^{n_c}) — the re-weighting that
    * interpolates between no balancing (β = 0) and inverse-frequency
    * (β → 1) by modeling diminishing returns of near-duplicate samples,
    * exactly the regime a deduplicated-but-skewed corpus sits in.
    * Weights are normalized to sum to the class count (mean 1), the
    * paper's convention.
    *
    * Scale shape: one keyed count to label cardinality, then
    * label-bounded arithmetic with a 1-row normalizer broadcast.
    */
  def effectiveNumberWeights(labeled: DataFrame, label: Column,
      beta: Double = 0.999): DataFrame = {
    require(beta > 0 && beta < 1, s"beta must be in (0,1): $beta")
    val counts = labeled.groupBy(label.as("label"))
      .agg(count(lit(1)).as("n"))
      // raw = (1−β)/(1−β^n), 9-dp so the normalizer sums fixed-point
      .withColumn("raw",
        round(lit(1.0 - beta) /
          (lit(1.0) - pow(lit(beta), col("n").cast(DoubleType))), 9))
    val tot = counts.agg(
      sum(col("raw").cast(DecimalType(38, 12))).cast(DoubleType)
        .as("raw_sum"),
      count(lit(1)).as("n_classes"))
    counts.crossJoin(broadcast(tot))
      .select(col("label"), col("n"),
        round(col("raw") * col("n_classes") / col("raw_sum"), 6)
          .as("weight"))
  }

  /** Rank-average quality ensemble — the signal-blending step real
    * curation pipelines run instead of trusting any single filter
    * (cf. the multi-signal gating in Gopher/RefinedWeb/Dolma): each
    * document's x02 quality score, x98 Flesch readability, and x114
    * character entropy are converted to PER-SOURCE percentiles
    * (percent_rank with the doc_id tie-break, the x30 normalizer — so
    * no signal's scale dominates and cross-source score drift cancels)
    * and averaged; `ens_rank` orders each source by the blend. Rank
    * averaging is the standard scale-free ensemble when signals are
    * heterogeneous (a z-score blend would let one heavy-tailed signal
    * swamp the others).
    *
    * Determinism: percentiles are exact rationals (rank−1)/(n−1) from
    * totally-ordered windows (NULLS FIRST pinned explicitly — engines
    * default differently); the average of three such doubles is the
    * identical IEEE value in both engines.
    *
    * Scale shape: the three signal passes are linear (entropy's counts
    * collapse map-side); the windows partition by source — the shuffle
    * a per-source pipeline already pays, never a global sort.
    */
  def qualityEnsemble(docs0: DataFrame): DataFrame = {
    import graft.ext.TextAnalysis
    // r20: all three signal passes are scan-stage text CPU — spread the
    // narrow scan once, before any of them (graft.engine.Spread)
    val docs = graft.engine.Spread.cpuHeavy(docs0)
    val q = docs.select(col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val r = TextAnalysis.readability(docs)
      .select(col("doc_id"), col("flesch"))
    val e = TextAnalysis.cachedCharEntropy(docs)
      .select(col("doc_id"), col("entropy"))
    def pct(c: String) = percent_rank().over(
      Window.partitionBy(col("source"))
        .orderBy(col(c).asc_nulls_first, col("doc_id").asc))
    val blended = q.join(r, Seq("doc_id")).join(e, Seq("doc_id"))
      .withColumn("ens_pct",
        round((pct("quality") + pct("flesch") + pct("entropy")) / 3, 6))
    blended.withColumn("ens_rank",
      row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("ens_pct").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("source"), col("quality"), col("flesch"),
        col("entropy"), col("ens_pct"), col("ens_rank"))
  }

  /** Held-out trigram LM score with stupid backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation" §4): per document,
    * the mean negative log score of its word trigrams under a trigram
    * model trained on the `isHeldIn` slice of the corpus only. Unlike
    * [[bigramLmScore]] (trained on the full corpus, so every scored
    * n-gram is in-model), the held-out model makes the backoff chain
    * real: documents OUTSIDE the training slice hit unseen trigrams,
    * bigrams, even unseen words, and their scores reflect how far their
    * phrasing drifts from the held-in distribution — the cross-domain
    * quality/novelty signal a curation pipeline reads before admitting a
    * new source.
    *
    * Score of trigram (w1 w2 w3), all counts from the training slice:
    *   - c(w1w2w3) > 0 → c(w1w2w3) / c(w1w2)            (trigram MLE)
    *   - else c(w2w3) > 0 → 0.4 · c(w2w3) / c(w2)       (bigram backoff)
    *   - else → 0.4² · (c(w3)+1) / (N+V)                (add-one unigram
    *     floor — total even for words the training slice never saw).
    * Per-trigram −ln rounded to 6 dp; per-doc mean via exact decimal
    * [[sum6]] — engine-portable. Docs with < 3 tokens have no trigrams
    * and are absent (the [[bigramLmScore]] contract).
    *
    * Returns (doc_id, n_trigrams, bo_score).
    *
    * Scale shape: the model is three aggregates of ONE tokenize pass
    * over the training slice (trigram, bigram, unigram counts — each
    * vocab-bounded, far smaller than the corpus). The backoff CASE runs
    * once per DISTINCT corpus trigram on the model relation (left joins
    * on n-gram keys, all model-size), and the scored table joins back to
    * corpus trigram occurrences by key — one corpus-scale equi-join
    * shuffle + a partial-agg'd per-doc mean, exactly the
    * [[bigramLmScore]] plan with a wider model.
    */
  def backoffLmScore(docs: DataFrame, isHeldIn: Column): DataFrame = {
    val withWs = docs.select(col("doc_id"), isHeldIn.as("held_in"),
      tokens(col("text")).as("ws"))
    val train = withWs.filter(col("held_in"))
    val trainWords = train.select(explode(col("ws")).as("w"))
    val c1 = trainWords.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nv = trainWords.agg(count(lit(1)).as("n"),
      count_distinct(col("w")).as("v"))
    val c2 = train
      .select(explode(TextAnalysis.bigrams(col("ws"))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
    val c3 = train
      .select(explode(TextAnalysis.ngramsRaw(col("ws"), 3)).as("tg"))
      .groupBy(col("tg")).agg(count(lit(1)).as("c"))
    val corpusTg = withWs.select(col("doc_id"),
      explode(TextAnalysis.ngramsRaw(col("ws"), 3)).as("tg"))
    val parts = corpusTg.select(col("tg")).distinct()
      .select(col("tg"),
        substring_index(col("tg"), " ", 2).as("w12"),
        substring_index(col("tg"), " ", -2).as("w23"),
        substring_index(substring_index(col("tg"), " ", 2), " ", -1).as("w2"),
        substring_index(col("tg"), " ", -1).as("w3"))
    val model = parts
      .join(c3.select(col("tg"), col("c").as("c123")), Seq("tg"), "left")
      .join(c2.select(col("bg").as("w12"), col("c").as("c12")),
        Seq("w12"), "left")
      .join(c2.select(col("bg").as("w23"), col("c").as("c23")),
        Seq("w23"), "left")
      .join(c1.select(col("w").as("w2"), col("c").as("cw2")),
        Seq("w2"), "left")
      .join(c1.select(col("w").as("w3"), col("c").as("cw3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(nv))
      .select(col("tg"), round(-log(
        when(col("c123").isNotNull,
          col("c123").cast(DoubleType) / col("c12"))
          .when(col("c23").isNotNull,
            lit(0.4) * col("c23").cast(DoubleType) / col("cw2"))
          .otherwise(lit(0.16) *
            (coalesce(col("cw3"), lit(0L)) + lit(1)).cast(DoubleType) /
            (col("n") + col("v")))), 6).as("nll"))
    corpusTg.join(model, Seq("tg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum6(col("nll")) / count(lit(1)), 6).as("bo_score"))
  }

  /** Curriculum schedule: assign each document a training phase by
    * quality percentile WITHIN its source (x30's percentile contract —
    * `percent_rank` ordered by (quality, doc_id), rounded to 6 dp), cut
    * into `phases` equal percentile bands, and roll up to the
    * per-(source, phase) document and token mass a curriculum scheduler
    * consumes (low-quality phases first / last is the caller's policy;
    * this is the mass ledger either order needs).
    *
    * One per-source window (the same partitioning a per-source pipeline
    * already shuffles by) + one keyed aggregation; output is
    * sources × phases rows — dim-table-class.
    */
  def curriculumSchedule(docs: DataFrame, phases: Int = 4): DataFrame = {
    require(phases > 0, s"phases must be positive: $phases")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("q"), col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("nt"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      // pr = 1.0 lands in the last band (floor would index one past it)
      .withColumn("phase",
        least(floor(col("pr") * phases), lit(phases - 1L)).cast("int"))
      .groupBy(col("source"), col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("phase_tokens"))
  }

  /** Per-source QUALITY-RANKED DOC CAP — the RefinedWeb/C4-style
    * "no single domain dominates the mix" rule, but ranked instead of
    * random: each source keeps its top-`cap` documents by the x02
    * quality score (doc_id ascending on 6-dp ties, so the cut is
    * deterministic and engine-portable). x38 caps strata by RANDOM
    * hash-rank (unbiased sampling); x55 caps LEARNED cells; this caps
    * the provenance dimension while spending the quota on the best
    * docs — the shape used when a crawl has a few mega-domains whose
    * long tail is boilerplate.
    *
    * Scale shape: one map pass for the score, one window partitioned
    * by source (distributes across sources; row_number needs no full
    * sort beyond each source's partition). A mega-source whose
    * partition alone overwhelms a task uses the documented x30/x38
    * hatch: a per-source quality-percentile PREFILTER (percent_rank
    * keeps ~cap/n quantile) bounds the window input before ranking.
    */
  def sourceQualityCap(docs: DataFrame, cap: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
  }
}
