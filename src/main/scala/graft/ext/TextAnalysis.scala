package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Text-analysis operators for LLM-data-pipeline use (north star,
  * BASELINE.json): token counting, quality scoring, language-ID heuristics,
  * document fingerprinting, shingling. All pure `Column` expressions
  * (higher-order functions, no UDFs) — they run per-row inside whole-stage
  * codegen with zero shuffle, so they scale linearly to 100 TB of text.
  */
object TextAnalysis {

  /** Whitespace tokenizer. `trim` first so leading/trailing whitespace does
    * not fabricate empty tokens. On an empty string this yields `[""]`
    * (size 1) — matches `regexp_split_to_array` in DuckDB/Postgres.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast(IntegerType)

  /** A BPE-ish subword count without a vocab: runs of letters, runs of
    * digits, and single non-alphanumeric glyphs each count as one token —
    * a cheap, deterministic proxy for tokenizer load estimation.
    */
  def subwordCount(text: Column): Column =
    size(subwords(text)).cast(IntegerType)

  /** The subword token ARRAY behind [[subwordCount]] — letter runs, digit
    * runs, single other glyphs — for consumers that need the tokens
    * themselves (x73's BPE pair counting), not just the count.
    */
  def subwords(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Distinct word n-gram shingles over a MATERIALIZED token-array column
    * — `ws` must be a bound attribute (its own projection), not an inline
    * `tokens(text)` expression: a lambda that captures an expression
    * re-evaluates it per element access, turning one regex split per doc
    * into one per token (O(n²) — measured as the dominant cost of the
    * whole near-dup path). Indexed `transform` + O(1) `try_element_at`
    * lookups, one trailing `slice` to drop the short tail shingles.
    */
  def shinglesFromTokens(ws: Column, n: Int): Column = {
    // fold shifted copies of the token array with zip_with: every array
    // argument is evaluated exactly once per row (lambdas only see
    // elements), so nothing is re-evaluated per token even if an upstream
    // optimizer rule inlines `ws` as a full expression
    val joined = (2 to n).foldLeft(ws) { (acc, k) =>
      zip_with(acc, slice(ws, lit(k), size(ws)),
        (a, b) => concat(a, lit(" "), b))
    }
    // zip_with pads the short side with null; concat(null) → null tail
    // entries, dropped by the slice
    val sh = slice(joined, lit(1), greatest(size(ws) - lit(n - 1), lit(0)))
    when(size(ws) >= n, array_distinct(sh))
      .otherwise(array().cast("array<string>"))
  }

  /** [[shinglesFromTokens]] WITHOUT the distinct — every n-gram
    * occurrence kept, in order. The multiset face for weighted (tf)
    * consumers like x81's shingle TF-IDF, where repeating a shingle
    * must raise its term frequency rather than collapse.
    */
  def shingleOccurrences(ws: Column, n: Int): Column = {
    val joined = (2 to n).foldLeft(ws) { (acc, k) =>
      zip_with(acc, slice(ws, lit(k), size(ws)),
        (a, b) => concat(a, lit(" "), b))
    }
    val sh = slice(joined, lit(1), greatest(size(ws) - lit(n - 1), lit(0)))
    when(size(ws) >= n, sh).otherwise(array().cast("array<string>"))
  }

  /** Convenience form over raw text. For corpus-scale work go through
    * [[graft.ext.Dedup.shingled]], which materializes the token array
    * first (see [[shinglesFromTokens]] for why).
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Exact set-Jaccard of two pre-distinct arrays. Caller filters empty
    * arrays (0/0 is undefined in every engine).
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    // |A∪B| = |A| + |B| − |A∩B| with the SAME intersection count —
    // value-identical to intersecting again for the denominator, at
    // half the array_intersect evaluations (r19: the intersect is the
    // dominant term of every exact verify; the old form also doubled
    // AGAIN when a pushed-down `j >= t` filter inlined the expression)
    inter / (size(a) + size(b) - inter)
  }

  /** Quality-score components (length / punctuation / stopword ratios) and
    * a combined score. Per-row double arithmetic — deterministic and
    * engine-portable (unlike double *aggregation*).
    */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,;:!?]"), lit(0))).cast(IntegerType)

  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(the|and|of|to|a|in|is|it|for|on)\\b"), lit(0))).cast(IntegerType)

  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val stopR = stopwordCount(text).cast(DoubleType) / nTok
    val punctR = punctCount(text).cast(DoubleType) / greatest(length(text), lit(1)).cast(DoubleType)
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    round(lit(0.5) * lenScore + lit(0.3) * least(stopR * 5, lit(1.0))
      + lit(0.2) * (lit(1.0) - least(punctR * 10, lit(1.0))), 6)
  }

  /** Language-ID by marker-token counting — the classic n-gram/stopword
    * heuristic. Scores a fixed marker list per language; highest count wins,
    * ties broken by a fixed language order. (On the synthetic corpus the
    * text is language-independent word soup, so this exercises the operator
    * shape — deterministic scoring + argmax — rather than linguistics.)
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|is|in)\\b",
    "de" -> "\\b(der|die|das|und|ist)\\b",
    "fr" -> "\\b(le|la|les|et|est)\\b",
    "es" -> "\\b(el|la|los|y|es)\\b")

  def langScore(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0))).cast(IntegerType)

  def langId(text: Column): Column = {
    // argmax with first-wins tie-break over the fixed order
    val scored = langMarkers.map { case (l, p) => (l, langScore(text, p)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Non-deduplicated word bigram array — the repetition-signal input
    * (unlike [[shinglesFromTokens]], duplicates are the point here).
    * `ws` must be a materialized token-array column (same lambda-capture
    * rule as shingles).
    */
  def bigrams(ws: Column): Column = {
    val joined = zip_with(ws, slice(ws, lit(2), size(ws)),
      (a, b) => concat(a, lit(" "), b))
    val sh = slice(joined, lit(1), greatest(size(ws) - 1, lit(0)))
    when(size(ws) >= 2, sh).otherwise(array().cast("array<string>"))
  }

  /** Non-deduplicated word n-gram array (space-joined) — generalizes
    * [[bigrams]]; duplicates preserved, repetition signals are the point.
    * `ws` must be a materialized token-array column.
    */
  def ngramsRaw(ws: Column, n: Int): Column = {
    require(n >= 2, s"ngramsRaw needs n >= 2, got $n")
    val joined = (1 until n).foldLeft(ws) { (acc, off) =>
      zip_with(acc, slice(ws, lit(off + 1), size(ws)),
        (a, b) => concat(a, lit(" "), b))
    }
    val sh = slice(joined, lit(1), greatest(size(ws) - (n - 1), lit(0)))
    when(size(ws) >= n, sh).otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition metrics (Rae et al. 2112.11446 App. A) per
    * document:
    *
    *   - `top_bigram`: the most frequent word 2-gram (ties → the
    *     lexicographically smallest), `''` when the doc has none;
    *   - `top_bigram_frac`: characters covered by occurrences of that
    *     2-gram (`count × length(gram)`) over `length(text)` — the
    *     "fraction of characters in the most common 2-gram" filter;
    *   - `dup_trigram_frac`: characters in 3-grams occurring more than
    *     once (`Σ count × length`, overlaps counted per occurrence — the
    *     standard SQL-replicable approximation) over `length(text)`;
    *   - `rep_keep`: the Gopher-band gate
    *     (`top_bigram_frac ≤ 0.2 ∧ dup_trigram_frac ≤ 0.6`).
    *
    * Plan shape: two explode → partial-agg shuffles (bigram, trigram
    * counts, both keyed by doc so partial aggregation combines map-side)
    * and one per-doc window for the argmax — every stage is keyed by
    * `doc_id`, so the operator scales out with the corpus; no global
    * state, no driver collect.
    */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"), length(col("text")).as("n_chars_t"),
      tokens(col("text")).as("ws"))
    val bg = d.select(col("doc_id"), col("n_chars_t"),
        explode(bigrams(col("ws"))).as("bg"))
      .groupBy(col("doc_id"), col("n_chars_t"), col("bg"))
      .agg(count(lit(1)).as("c"))
    val top = bg
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("c").desc, col("bg"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("bg").as("top_bigram"),
        round(col("c") * length(col("bg")).cast(DoubleType) /
          col("n_chars_t"), 6).as("top_bigram_frac"))
    val dup = d.select(col("doc_id"), col("n_chars_t"),
        explode(ngramsRaw(col("ws"), 3)).as("tg"))
      .groupBy(col("doc_id"), col("n_chars_t"), col("tg"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("c") * length(col("tg"))).cast(DoubleType) /
        first(col("n_chars_t")), 6).as("dup_trigram_frac"))
    d.select(col("doc_id"))
      .join(top, Seq("doc_id"), "left")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"),
        coalesce(col("dup_trigram_frac"), lit(0.0)).as("dup_trigram_frac"))
      .withColumn("rep_keep",
        col("top_bigram_frac") <= 0.2 && col("dup_trigram_frac") <= 0.6)
  }

  /** Corpus vocabulary coverage: the `k` most frequent tokens with their
    * counts and the cumulative fraction of ALL token occurrences they
    * cover — the "how head-heavy is this corpus" diagnostic that sizes
    * tokenizer vocabularies and spots boilerplate floods.
    *
    * Scale shape: one explode → global token count (partial-aggregated),
    * then `TakeOrderedAndProject` down to `k` rows — the cumulative-sum
    * window runs over those `k` rows only (single tiny task BY
    * CONSTRUCTION, not over the vocabulary), and the total is a 1-row
    * broadcast crossJoin, never a driver collect.
    */
  def vocabCoverage(docs: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(tokens(col("text")).as("ws"))
    val counts = d.select(explode(col("ws")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val total = d.select(sum(size(col("ws"))).as("total"))
    counts.orderBy(col("c").desc, col("token")).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("cum_frac",
        round(sum(col("c")).over(Window.orderBy(col("c").desc, col("token"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType) / col("total"), 6))
      .select(col("token"), col("c"), col("cum_frac"))
  }

  /** BPE merge-step candidates: the `k` most frequent adjacent
    * subword-token pairs with their merged form — the counting core of
    * one BPE trainer iteration (the argmax pair IS the next merge rule;
    * re-tokenize-and-recount is the outer loop a trainer drives).
    *
    * Same scale shape as [[vocabCoverage]]: explode → partial-aggregated
    * pair count → `TakeOrderedAndProject` (per-partition top-k heaps,
    * no global sort). Subword tokens never contain whitespace, so the
    * single-space join/strip round-trips losslessly.
    */
  def bpePairCounts(docs: DataFrame, k: Int = 20): DataFrame =
    docs
      .select(subwords(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(bigrams(col("ts"))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .select(col("pair"), col("n"),
        regexp_replace(col("pair"), " ", "").as("merged"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)

  /** PMI collocation mining (Church & Hanks 1990): the top-k adjacent
    * word pairs by pointwise mutual information,
    * `pmi = ln(P(ab) / (P(a)·P(b)))` with pair probability over the
    * bigram mass and unigram probabilities over the token mass — the
    * multi-word-expression detector a tokenizer-vocab or
    * stopword-pruning decision reads ("hong kong" is one unit; "of the"
    * is chance). `minCount` floors the pair count (PMI's known bias
    * toward hapax pairs).
    *
    * Scale shape: ONE tokenize pass feeds both the bigram and unigram
    * counts (bound token array, two keyed partial aggs); everything
    * downstream is vocab-bounded — the totals are a 1-row broadcast,
    * the unigram joins are vocab×vocab-bounded on the pair relation,
    * and the top-k is a TakeOrderedAndProject. Determinism: the ln
    * argument is assembled in one fixed association order from exact
    * BIGINT counts (each double op correctly rounded ⇒ bit-identical
    * across engines), rounded to 6 dp.
    */
  def pmiCollocations(docs: DataFrame, k: Int = 20,
      minCount: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val ws = docs.select(tokens(col("text")).as("ws"))
    val uni = ws.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val bi = ws.filter(size(col("ws")) >= 2)
      .select(explode(bigrams(col("ws"))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .select(col("pair"), col("c12"),
        split(col("pair"), " ").getItem(0).as("w1"),
        split(col("pair"), " ").getItem(1).as("w2"))
    // token and bigram mass from ONE cheap per-doc length projection
    // (Σ len and Σ max(len−1, 0) — no second explode pass)
    val totals = docs
      .select(size(tokens(col("text"))).as("len"))
      .agg(sum(col("len")).as("n"),
        sum(greatest(col("len") - 1, lit(0))).as("nb"))
    bi
      .join(uni.select(col("w").as("w1"), col("c1").as("ca")), "w1")
      .join(uni.select(col("w").as("w2"), col("c1").as("cb")), "w2")
      .crossJoin(broadcast(totals))
      .select(col("pair"), col("c12"),
        round(log(
          col("c12").cast(DoubleType) * col("n") * col("n") /
            (col("nb").cast(DoubleType) * col("ca") * col("cb"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("pair").asc)
      .limit(k)
  }

  /** Per-source token Shannon entropy — the corpus-diversity ledger
    * that complements [[vocabCoverage]] (head mass) and the x68 drift
    * matrix (pairwise shift): low entropy flags template/boilerplate
    * floods inside one source before any pairwise work runs, and
    * `evenness` (entropy / ln distinct) normalizes away vocabulary size
    * so sources of different breadth compare on one scale.
    *
    * Scale shape: one tokenize-explode pass to (source, token) counts —
    * Zipf-skewed keys carry partial-aggregated counts, not rows — then
    * everything downstream is (sources × vocab)-bounded. Determinism
    * contract (x68's): probabilities rounded to 12 dp, entropy terms to
    * 9 dp, summed as DECIMAL(38,12), output at 6 dp.
    */
  def sourceTokenEntropy(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = docs
      .select(col("source"), tokens(col("text")).as("ws"))
      .select(col("source"), explode(col("ws")).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
    val tot = counts.groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("n_distinct"))
    val h = counts.join(broadcast(tot), Seq("source"))
      .withColumn("p",
        round(col("n").cast(DoubleType) / col("n_tokens"), 12))
      .withColumn("term", round(col("p") * log(col("p")), 9))
      .groupBy(col("source"))
      .agg(round(-sum(col("term").cast(DecimalType(38, 12)))
        .cast(DoubleType), 6).as("entropy"))
    tot.join(h, Seq("source"))
      .withColumn("evenness",
        when(col("n_distinct") > 1,
          round(col("entropy") / log(col("n_distinct").cast(DoubleType)), 6))
          .otherwise(lit(0.0)))
  }

  /** Zipf-law fit over the top-`topN` token frequencies: OLS regression
    * of ln(count) on ln(rank) — slope ≈ −1 is natural-language territory
    * (Zipf 1949); a flat slope flags template floods and a cliff flags
    * truncated/deduped vocab. One-row output (n_terms, slope, intercept,
    * r2): the single-number corpus-naturalness dial next to x76's
    * entropy and x65's head coverage.
    *
    * Scale shape: token counts partial-aggregate, the top-N lands via
    * TakeOrderedAndProject (per-partition heaps, no global sort), and
    * the rank window + regression run over N rows — a single tiny task
    * by construction, the x65 pattern. Determinism: ln values rounded to
    * 6 dp, products to 9 dp, sums as DECIMAL(38,12) (the x68 contract);
    * the closed-form slope/intercept/r² arithmetic is a fixed literal
    * order replicated in the oracle.
    *
    * `topN` is a DELIBERATE head fit, not a silent cap: Zipf fits are
    * conventionally taken on the frequency head (the tail bends under
    * finite-sample noise and would drag r² down without changing the
    * verdict the dial exists for). What it drops is the tail's own
    * slope — a corpus whose head is natural but whose tail is template
    * spam reads natural here; pair with x99 burstiness / x83 winnowing
    * when tail pathology matters. N is fit-window size, not memory:
    * any topN keeps the regression a single N-row task.
    */
  def zipfFit(docs: DataFrame, topN: Int = 200): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val dec = DecimalType(38, 12)
    val top = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc).limit(topN)
    val w = Window.orderBy(col("cnt").desc, col("w").asc)
    val xy = top.withColumn("rank", row_number().over(w))
      .select(round(log(col("rank").cast(DoubleType)), 6).as("x"),
        round(log(col("cnt").cast(DoubleType)), 6).as("y"))
    val sums = xy.agg(
      count(lit(1)).cast(DoubleType).as("m"),
      sum(col("x").cast(dec)).cast(DoubleType).as("sx"),
      sum(col("y").cast(dec)).cast(DoubleType).as("sy"),
      sum(round(col("x") * col("y"), 9).cast(dec)).cast(DoubleType)
        .as("sxy"),
      sum(round(col("x") * col("x"), 9).cast(dec)).cast(DoubleType)
        .as("sxx"),
      sum(round(col("y") * col("y"), 9).cast(dec)).cast(DoubleType)
        .as("syy"))
    // zero-variance guards: a single-token corpus (m = 1) or all-equal
    // top counts make (m·sxx − sx²) or (m·syy − sy²) zero — Spark's
    // double division would yield ±Infinity/NaN while DuckDB differs, so
    // both engines pin the degenerate fit to NULL explicitly
    val dxx = col("m") * col("sxx") - col("sx") * col("sx")
    val dyy = col("m") * col("syy") - col("sy") * col("sy")
    val nullD = lit(null).cast(DoubleType)
    sums.select(
      col("m").cast("bigint").as("n_terms"),
      when(dxx === 0.0, nullD)
        .otherwise(round((col("m") * col("sxy") - col("sx") * col("sy")) /
          dxx, 6)).as("slope"),
      when(dxx === 0.0, nullD)
        .otherwise(round(
          (col("sy") - (col("m") * col("sxy") - col("sx") * col("sy")) /
            dxx * col("sx")) / col("m"), 6)).as("intercept"),
      when(dxx === 0.0 || dyy === 0.0, nullD)
        .otherwise(round(((col("m") * col("sxy") - col("sx") * col("sy")) *
          (col("m") * col("sxy") - col("sx") * col("sy"))) /
          (dxx * dyy), 6)).as("r2"))
  }

  /** Token burstiness (Church & Gale 1995): cf/df — the mean number of
    * occurrences per CONTAINING document, for tokens with corpus
    * frequency ≥ `minCf`. A bursty token (high cf/df) concentrates in
    * few documents — boilerplate runs, code listings, template fields —
    * where a well-mixed content word spreads thin; the complement of
    * x13's plain document frequency and the per-token face of x62's
    * within-doc repetition gate.
    *
    * Scale shape: one tokenize-explode pass → (doc, token) partial-agg
    * counts → token-level rollup (both keyed partial aggregations;
    * Zipf-hot tokens carry counts, not rows); top-k is a
    * TakeOrderedAndProject.
    */
  def tokenBurstiness(docs: DataFrame, k: Int = 20,
      minCf: Int = 20): DataFrame = {
    val dt = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    dt.groupBy(col("w"))
      .agg(sum(col("n")).as("cf"), count(lit(1)).as("df"))
      .filter(col("cf") >= minCf)
      .select(col("w").as("token"), col("cf"), col("df"),
        round(col("cf").cast(DoubleType) / col("df"), 6).as("burstiness"))
      .orderBy(col("burstiness").desc, col("token").asc)
      .limit(k)
  }

  /** Blocklist gate (the C4 "badwords" filter shape): per-source count
    * of documents containing any blocklist token, with total hit mass —
    * the cheapest content filter a corpus runs, and the per-source rate
    * is the ledger that decides whether a source is filtered or dropped
    * wholesale. Matching is exact on lowercased whitespace tokens (no
    * substring surprises: "class" never matches a blocked "ass").
    *
    * Scale shape: one tokenize pass; the blocklist is a plan-time
    * literal array (broadcast-free — it compiles into the filter
    * lambda), output is sources-bounded.
    */
  def blocklistGate(docs: DataFrame, blocklist: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val bl = array(blocklist.map(t => lit(t.toLowerCase)): _*)
    val perDoc = docs.select(col("source"),
      size(filter(tokens(col("text")),
        t => array_contains(bl, lower(t)))).as("hits"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("hits").cast("long")).as("total_hits"),
        round(sum(when(col("hits") > 0, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)), 6).as("flag_rate"))
  }

  /** Flesch reading-ease per document, with a deterministic vowel-group
    * syllable heuristic (syllables(w) = max(1, count of [aeiouy]+ runs
    * in lowercase w)) — the readability face of the quality suite:
    * Flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), sentences = max(1, count of [.!?]+ runs). Zero shuffle —
    * one map pass, every term a per-row regexp/HOF fold; the per-word
    * syllable transform is a Java∩RE2 regex so the oracle replicates it
    * with list_transform byte-for-byte.
    */
  def readability(docs0: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    // r20: per-doc regex + syllable fold is scan-stage CPU — spread
    val docs = graft.engine.Spread.cpuHeavy(docs0)
    val ws = tokens(col("text"))
    val nw = size(ws).cast(DoubleType)
    val ns = greatest(lit(1),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))))
      .cast(DoubleType)
    val nsy = aggregate(ws, lit(0L), (acc, wd) => acc +
      greatest(lit(1),
        size(regexp_extract_all(lower(wd), lit("[aeiouy]+"), lit(0)))))
      .cast(DoubleType)
    docs.select(col("doc_id"),
      nw.cast("bigint").as("n_words"),
      ns.cast("bigint").as("n_sentences"),
      nsy.cast("bigint").as("n_syllables"),
      when(nw === 0, lit(null).cast(DoubleType))
        .otherwise(round(lit(206.835) - lit(1.015) * (nw / ns) -
          lit(84.6) * (nsy / nw), 6)).as("flesch"))
  }

  /** Per-document Shannon entropy of the character distribution in bits
    * (6-dp) — the gibberish/encoding-garbage gate (natural text sits
    * around 3.5–4.5 bits; a run of one character near 0; uniform random
    * bytes near 8). Shape: chars explode → (doc, char) counts → per-doc
    * rollup — the x36/x73 tokenize-explode shape, where both groupBys
    * partial-aggregate map-side and the shuffle carries (doc, char)
    * count rows, never raw text. (A first draft computed this in-row as
    * a distinct-chars × length HOF fold: the captured char array is
    * re-materialized per distinct char by the interpreted HOFs —
    * measured 46 s for 5 000 docs vs sub-second for this form. In-row
    * loses to one small shuffle by two orders of magnitude here.)
    *
    * Determinism: H = log₂n − (Σ cnt·ln cnt)/(n·ln 2) with the Σ terms
    * 6-dp-rounded and DECIMAL-summed (order-independent), all counts
    * exact integers. Empty/null text pins to entropy 0 with the
    * documented `low = true` (degenerate docs ARE low-entropy).
    */
  def charEntropyPerDoc(docs0: DataFrame,
      lowThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // r20: the per-character explode (~|text| rows per doc) runs in the
    // scan stage — spread narrow scans first (graft.engine.Spread)
    val docs = graft.engine.Spread.cpuHeavy(docs0)
    val nonEmpty = docs
      .filter(coalesce(length(col("text")), lit(0)) > 0)
      .select(col("doc_id"), col("source"),
        explode(transform(sequence(lit(1), length(col("text"))),
          i => col("text").substr(i, lit(1)))).as("c"))
    val counts = nonEmpty.groupBy(col("doc_id"), col("source"), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val ent = counts.groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt")).as("n"),
        sum(round(col("cnt") * log(col("cnt").cast(DoubleType)), 6)
          .cast(DecimalType(38, 12))).as("s"))
      .select(col("doc_id"), col("source"),
        round((log(col("n").cast(DoubleType)) -
          col("s").cast(DoubleType) / col("n")) / log(lit(2.0)), 6)
          .as("entropy"))
    val empties = docs
      .filter(coalesce(length(col("text")), lit(0)) === 0)
      .select(col("doc_id"), col("source"), lit(0.0).as("entropy"))
    ent.union(empties)
      .withColumn("low_entropy", col("entropy") < lowThreshold)
  }

  /** Session-lifetime memo of the per-doc entropy SIGNAL relation —
    * the cachedPairs/cachedKnnEdges pattern for quality signals: a
    * pipeline computes each per-doc signal once and every consumer
    * (the x115 ensemble today) reads the artifact, while x114 keeps
    * computing live so the signal's own cost stays measured. Keyed by
    * plan hash + file fingerprint.
    */
  private val entropyCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int), DataFrame]()

  private[graft] def entropyCacheSize: Int = entropyCache.size()

  /** Invalidation hook, the cache-family analog. */
  def invalidateEntropyCache(): Unit = entropyCache.clear()

  def cachedCharEntropy(docs: DataFrame): DataFrame = {
    val key = (docs.queryExecution.analyzed.semanticHash(),
      Similarity.corpusFingerprint(docs))
    val hit = entropyCache.get(key)
    if (hit != null) hit
    // double-checked build guard, not putIfAbsent: a losing racer's
    // checkpointed relation would leak executor storage for the
    // session (same rationale as Dedup.memoized)
    else entropyCache.synchronized {
      val again = entropyCache.get(key)
      if (again != null) again
      else {
        val built = graft.engine.Checkpoints.materialize(
          charEntropyPerDoc(docs))
        entropyCache.put(key, built)
        built
      }
    }
  }

  /** [[charEntropyPerDoc]]'s per-row form: the identical H from ONE
    * sorted-run fold over the char array — sort once, then a single
    * O(len) pass accumulating Σ round(run·ln run, 6) as DECIMAL(38,12)
    * in a struct accumulator (run boundaries in sorted order, so the
    * sum is the same exact decimal the per-doc groupBy produces and the
    * same oracle matches both forms bit-for-bit; spec-asserted). Unlike
    * the 46-s distinct×length draft this never re-materializes the
    * array: one build, one sort, one fold.
    *
    * Measured at sf0.1: 5.95 s vs the explode form's 2.8 s — Spark's
    * higher-order functions are interpreted (CodegenFallback), and the
    * per-char struct allocation costs more than the explode form's
    * combine-collapsed exchange (~|Σ| rows per doc, not chars). Kept as
    * the zero-shuffle alternative for exchange-hostile deployments; the
    * declared x114 uses [[charEntropyPerDoc]].
    */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 12)
    val chars = array_sort(transform(sequence(lit(1), length(text)),
      i => text.substr(i, lit(1))))
    def runTerm(run: Column): Column =
      round(run.cast(DoubleType) * log(run.cast(DoubleType)), 6).cast(dec)
    val acc0 = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0).cast(dec).as("s"))
    val s = aggregate(chars, acc0,
      (a, c) => struct(
        c.as("prev"),
        when(c === a.getField("prev"), a.getField("run") + 1)
          .otherwise(lit(1L)).as("run"),
        // decimal + widens the scale (38,12)+(38,12) → (38,11); cast
        // back so the accumulator type stays fixed across iterations
        when(c === a.getField("prev"), a.getField("s"))
          .otherwise((a.getField("s") +
            when(a.getField("run") > 0, runTerm(a.getField("run")))
              .otherwise(lit(0).cast(dec))).cast(dec)).as("s")),
      a => (a.getField("s") +
        when(a.getField("run") > 0, runTerm(a.getField("run")))
          .otherwise(lit(0).cast(dec))).cast(dec))
    val n = length(text)
    when(coalesce(n, lit(0)) === 0, lit(0.0))
      .otherwise(round(
        (log(n.cast(DoubleType)) - s.cast(DoubleType) / n) /
          log(lit(2.0)), 6))
  }

  /** Mean word length in characters, rounded to 6 — a Gopher-style
    * quality gate input (word soup and OCR noise sit far from the 3–10
    * band of natural prose).
    */
  def meanWordLen(ws: Column): Column =
    round(aggregate(ws, lit(0L), (acc, w) => acc + length(w))
      .cast(DoubleType) / size(ws), 6)

  /** Non-alphanumeric glyphs per token — high values flag markup/symbol
    * noise.
    */
  def symbolRatio(text: Column): Column =
    round(size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
      .cast(DoubleType) / tokenCount(text), 6)

  /** Gopher-style quality gate over a (doc_id, text) relation: mean word
    * length, symbol-noise ratio, and max-repeated-bigram ratio → keep
    * flag. Per-row signals are pure expressions; the repetition signal
    * is the classic explode → (doc, bigram) count → per-doc max/total
    * two-shuffle. Single definition backing the x19 query and the x32
    * export composite.
    */
  def qualityFlags(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("text"),
      tokens(col("text")).as("ws"))
    val base = d.select(col("doc_id"),
      meanWordLen(col("ws")).as("mean_word_len"),
      symbolRatio(col("text")).as("symbol_ratio"))
    val rep = d.select(col("doc_id"), explode(bigrams(col("ws"))).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("c")).cast(DoubleType) / sum(col("c")), 6)
        .as("max_bigram_ratio"))
    base.join(rep, Seq("doc_id"), "left")
      .withColumn("max_bigram_ratio",
        coalesce(col("max_bigram_ratio"), lit(0.0)))
      .withColumn("keep",
        col("mean_word_len") >= 3 && col("mean_word_len") <= 10 &&
          col("symbol_ratio") <= 0.1 && col("max_bigram_ratio") <= 0.2)
  }

  /** Canonical document fingerprint: md5 of whitespace-normalized,
    * lowercased text. The exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Scrub patterns: the PII/noise classes a pre-training cleaner masks
    * or strips. Kept to the regex subset Java and RE2 (DuckDB) agree on —
    * character classes, `\b`, bounded alternation — so the x40 oracle
    * replicates the pass byte-for-byte.
    */
  val scrubEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val scrubUrl   = "https?://[^\\s]+"
  val scrubNum   = "\\b[0-9]+\\b"
  val scrubStop  = "\\b(the|and|of|to|a|in|is|it|for|on)\\b"

  /** Count of matches of a scrub pattern in the raw text — the audit
    * column emitted next to the scrubbed output.
    */
  def scrubCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast(IntegerType)

  /** The scrub pass itself: emails → `<EMAIL>`, URLs → `<URL>`, free
    * numbers → `<NUM>`, stopwords dropped, whitespace re-collapsed.
    * Order matters (an email contains digits; a URL may contain an
    * email) and is part of the operator contract: email, URL, number,
    * stopword, collapse. Pure per-row regexp_replace chain — zero
    * shuffle, whole-stage codegen, linear to 100 TB.
    */
  def scrub(text: Column): Column = {
    val masked = regexp_replace(
      regexp_replace(
        regexp_replace(text, scrubEmail, "<EMAIL>"),
        scrubUrl, "<URL>"),
      scrubNum, "<NUM>")
    trim(regexp_replace(regexp_replace(masked, scrubStop, ""), "\\s+", " "))
  }

  /** 60-bit word hash used by SimHash: first 15 hex chars of md5, parsed
    * base-16. 15 chars keep it positive in a signed 64-bit integer in every
    * engine (Spark `conv`, DuckDB `CAST('0x…')`), which pins cross-engine
    * semantics — unlike xxhash64, whose availability is Spark-only.
    * Since r19 the engine side runs [[graft.functions.Hash60]] — the
    * identical md5-top-60-bits value computed digest-bytes-to-long
    * (no hex string, no base-16 parse, reused MessageDigest);
    * [[hash60Portable]] keeps the composed built-in form as the
    * semantics oracle (GraftFunctionsSpec asserts bit-equality).
    */
  def hash60(c: Column): Column = graft.functions.Hash60.hash60(c)

  /** The composed-builtin formulation of [[hash60]] — what the DuckDB
    * oracles replicate, kept as the cross-check for the codegen form.
    */
  private[graft] def hash60Portable(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Context-window chunking: each document's token stream split into
    * `chunkTokens`-token windows advancing by `chunkTokens - overlap` —
    * the prep step that turns a variable-length corpus into
    * context-length training rows. Pure per-row fan-out (tokenize once,
    * posexplode the arithmetic start sequence, slice + join) — no
    * shuffle, no UDF, and at 100 TB the operator is embarrassingly
    * parallel map work whose output feeds the x26 packing / x18 split
    * stages.
    *
    * Start positions are `1, 1+step, …` up to `max(len - overlap, 1)`:
    * every token is covered, consecutive full windows share exactly
    * `overlap` tokens, a document shorter than one window yields exactly
    * one chunk, and the final window may run short rather than dropping
    * the tail. `chunk_idx = (start-1)/step` is arithmetic, so the DuckDB
    * oracle reproduces ids without window functions.
    *
    * Empty and whitespace-only documents are dropped BEFORE the
    * fan-out: the forced `greatest(…, 1)` lower bound would otherwise
    * fabricate one degenerate chunk (empty chunk_text) per empty doc —
    * a zero-value training row no downstream consumer wants.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap ($overlap) must be in [0, chunkTokens=$chunkTokens)")
    val step = chunkTokens - overlap
    docs
      // rlike \S, not length(trim(…)): SQL trim strips only spaces, so a
      // tab-only document would slip through a trimmed-length test (in
      // both engines) and still fabricate its degenerate chunk
      .filter(col("text").rlike("\\S"))
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(sequence(lit(1),
          greatest(size(col("ws")) - lit(overlap), lit(1)), lit(step)))
          .as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(slice(col("ws"), col("start"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(lit(chunkTokens), size(col("ws")) - col("start") + 1)
          .cast("long").as("n_tokens"))
  }

  /** Vocabulary-growth audit (Heaps' law curve): cumulative distinct
    * vocabulary vs cumulative token mass in ingest (doc_id) order,
    * sampled per `bucketSize`-doc bucket — the "is new data still adding
    * new language?" diagnostic a curation pipeline reads before paying
    * for another crawl batch (a flattening curve means the source is
    * exhausted; template floods flatten it early).
    *
    * Scale shape: one tokenize pass; "first seen" is a per-token
    * `min(doc_id)` partial agg (linear, map-side combined — x70's
    * first-seen trick applied to unigrams); both per-bucket rollups are
    * keyed aggs. The ONLY window runs over BUCKET cardinality
    * (docs / bucketSize — thousands, not billions; pick bucketSize so it
    * stays driver-trivial at the target corpus), never over docs or
    * tokens.
    */
  def vocabGrowth(docs: DataFrame, bucketSize: Int): DataFrame = {
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    val bucket = expr(s"doc_id div $bucketSize")
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val newPerBucket = toks
      .groupBy(col("token")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr(s"first_doc div $bucketSize").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    val perBucket = docs
      .select(bucket.as("bucket"), tokenCount(col("text")).as("n_toks"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .join(newPerBucket, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_vocab", sum(col("n_new")).over(w))
      .select(col("bucket"), col("n_docs"), col("n_new"),
        col("cum_tokens"), col("cum_vocab"),
        round(col("cum_vocab").cast(DoubleType) / col("cum_tokens"), 6)
          .as("ttr"))
      .orderBy(col("bucket"))
  }

  def simhash(text: Column): Column =
    graft.functions.SimHash60.simhash60(
      transform(array_distinct(tokens(text)), w => hash60(w)))

  /** [[simhash]] under a salted feature-hash family: prefixing every
    * token with `salt` before the md5 yields an independent 60-bit
    * fingerprint word, which is how [[graft.ext.Dedup.simhashNearDupWide]]
    * widens the fingerprint past one long (120-bit = the plain word +
    * the `"w2:"` word) without a new hash primitive — portable to any
    * engine with md5, exactly like [[hash60]] itself.
    */
  def simhashSalted(text: Column, salt: String): Column =
    graft.functions.SimHash60.simhash60(
      transform(array_distinct(tokens(text)),
        w => hash60(concat(lit(salt), w))))

  /** The checked-in BPE merge fixture (src/main/resources/graft/
    * bpe_merges.txt): 64 training-ordered merges learned from the
    * sf0.01 corpus by a standard frequency-greedy char-level trainer
    * (highest pair count, lexicographically-smallest tie-break — fully
    * deterministic). Training order is load-bearing: [[bpeTokenCount]]
    * applies merges sequentially, which equals the classic
    * find-min-rank-pair loop ONLY for training-ordered lists (a pair of
    * pre-merge symbols can never re-form once its merge has run,
    * because merging only ever creates adjacency to NEW symbols).
    */
  lazy val bpeMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "graft/bpe_merges.txt fixture missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty)
      .map { l => val Array(a, b) = l.split(" ", 2); (a, b) }.toVector
    finally in.close()
  }

  /** Symbol-boundary separators for the relational BPE apply. Each
    * symbol is wrapped `␟sym␞` (distinct OPEN and CLOSE control chars),
    * which makes one plain left-to-right `replace` per merge EXACTLY
    * the tokenizer's merge-all-occurrences pass: the pattern
    * `␟a␞␟b␞ → ␟ab␞` can only match whole symbols (anchored by the
    * wrap), and two occurrences never share characters unless they
    * share a symbol (a = b runs), where greedy left-to-right is the
    * tokenizer's own rule. A single shared separator between symbols
    * would break that: in `␟a␟a␟a␟a␟` the 2nd match overlaps the 1st
    * match's trailing separator and a run of 8 merges only 3 pairs per
    * pass instead of 4.
    */
  private[graft] val BpeOpen = "\u001f"
  private[graft] val BpeClose = "\u001e"

  /** A word rendered as wrapped symbols with every merge applied in
    * training order — the relational GPT-2-style BPE apply. The chain
    * is |merges| nested literal `replace` calls evaluated over the
    * DISTINCT-word relation only (vocabulary-bounded — Heaps-law small
    * next to the corpus), never per occurrence.
    */
  private[graft] def bpeSegment(word: Column,
      merges: Seq[(String, String)]): Column =
    merges.foldLeft(
      regexp_replace(word, "(.)", BpeOpen + "$1" + BpeClose)) {
      case (acc, (a, b)) =>
        replace(acc, lit(BpeOpen + a + BpeClose + BpeOpen + b + BpeClose),
          lit(BpeOpen + a + b + BpeClose))
    }

  /** Real-tokenizer token accounting: per document, the whitespace word
    * count and the TRUE BPE token count under the checked-in merges
    * fixture — the apply half of the x73 pair-count machinery, so token
    * budgets (x26 packing, x63 manifests, x107 UniMax) can price in
    * tokenizer units instead of x01's heuristic approximation.
    *
    * Scale shape: one explode to (doc_id, word), one DISTINCT to the
    * vocabulary, the merge chain evaluated once per distinct word, one
    * keyed join back and one per-doc agg. The expensive expression
    * runs on the VOCABULARY relation (bounded by Heaps' law — millions
    * of rows at 100 TB, not trillions); the corpus-scale work is one
    * explode + join + partial-aggregated groupBy. Documents with no
    * parseable words keep a 0-count row (left join + coalesce).
    */
  def bpeTokenCount(docs: DataFrame,
      merges: Seq[(String, String)] = bpeMerges): DataFrame = {
    val dw = docs.select(col("doc_id"), explode(tokens(col("text"))).as("word"))
    val seg = bpeSegment(col("word"), merges)
    val wordCost = dw.select(col("word")).distinct()
      .select(col("word"),
        (length(seg) - length(replace(seg, lit(BpeOpen), lit(""))))
          .cast("long").as("n_sub"))
    // broadcast: wordCost is the DISTINCT-word relation (Heaps-bounded
    // — vocabulary, not corpus), but it hangs off a distinct() so the
    // planner has no stats and picks a sort-merge join that shuffles
    // every word OCCURRENCE in the corpus on a string key — the
    // measured 100× cost of the first cut (25.3 s, SCALE.md round 12).
    // The hint turns it into a map-side hash join: occurrences never
    // leave their partition, and the later per-doc agg partial-
    // aggregates before its exchange. At an extreme web-scale
    // vocabulary (≫10⁷ surface forms) the hint would be dropped in
    // favor of AQE's stats-informed choice.
    val agg = dw.join(broadcast(wordCost), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("w"), sum(col("n_sub")).as("s"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("w"), lit(0L)).as("n_words"),
        coalesce(col("s"), lit(0L)).as("n_bpe_tokens"))
  }

  /** TOKENIZER-EFFICIENCY ledger per source — chars-per-BPE-token
    * (the compression ratio a byte-priced storage/serving budget needs)
    * and BPE-tokens-per-word fertility (the tokenizer-cost number x79
    * reports per language, here per source under the REAL checked-in
    * merge list instead of the x01 heuristic). Sources whose
    * chars/token runs hot (code, tables, non-Latin transliteration)
    * cost disproportionate sequence length per byte — this is the
    * table read when splitting a token budget across sources priced in
    * true tokenizer units (x107's allocation upstream).
    *
    * Scale shape: [[bpeTokenCount]]'s distinct-word trick carries the
    * whole merge cost (vocabulary-bounded, not corpus-bounded); the
    * ledger adds one per-doc length projection and a sources-bounded
    * agg. All ratios are exact-integer quotients rounded at 6 dp —
    * engine-portable.
    */
  def tokenizerEfficiency(docs: DataFrame,
      merges: Seq[(String, String)] = bpeMerges): DataFrame = {
    val per = bpeTokenCount(docs, merges)
    docs
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("nc"))
      .join(per, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nc")).as("n_chars"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe"),
        round(sum(col("nc")).cast(DoubleType) /
          sum(col("n_bpe_tokens")), 6).as("chars_per_token"),
        round(sum(col("n_bpe_tokens")).cast(DoubleType) /
          sum(col("n_words")), 6).as("fertility"))
  }

  /** Corpus-frequency boilerplate share per document — the C4-style
    * cleanup signal the regex scrub (x40) and span dedup (x49/x50)
    * don't cover: a shingle appearing in more than 1/`denom` of all
    * documents (df·denom > N, exact integer arithmetic — no float
    * threshold) is boilerplate by ubiquity, and each document reports
    * how much of its distinct-shingle mass is that. High fractions mark
    * templated/navigation-heavy documents for the quality gates; the
    * flagged shingle list itself is the data-driven stop-gram
    * complement of x97's literal blocklist.
    *
    * Scale shape: two partial-aggregated shuffles on the shingle string
    * (df count, then the flag join — the df relation is
    * vocabulary-bounded by Heaps' law, never corpus-scale) and one on
    * doc_id. Documents shorter than `n` tokens carry no shingles and
    * don't appear — the documented contract.
    */
  def boilerplateStats(docs: DataFrame, n: Int = 3,
      denom: Int = 20): DataFrame = {
    val nDocs = docs.count()
    val f = graft.ext.Dedup.shingled(docs, n)
      .select(col("doc_id"), explode(col("sg")).as("s"))
    val df = f.groupBy(col("s")).agg(count(lit(1)).as("df"))
    f.join(df, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sg"),
        sum(when(col("df") * denom > nDocs, 1L).otherwise(0L))
          .as("n_boiler"))
      .select(col("doc_id"), col("n_sg"), col("n_boiler"),
        round(col("n_boiler").cast(DoubleType) / col("n_sg"), 6)
          .as("boiler_frac"))
  }

  /** The portable HOF formulation of [[simhash]] — kept as the
    * cross-check oracle for the codegen expression (GraftFunctionsSpec
    * asserts bit-equality). 60 interpreted passes over the feature array
    * per row (measured 23 s at sf0.1 vs ~0.5 s for the expression), so
    * never on the declared path.
    */
  private[graft] def simhashHof(text: Column): Column = {
    val hashes = transform(array_distinct(tokens(text)), w => hash60(w))
    // variable-amount shifts need the SQL expressions (the Scala
    // shiftright/shiftleft helpers only take literal Int amounts)
    def shr(h: Column, b: Column) = call_function("shiftright", h, b)
    def shl(h: Column, b: Column) = call_function("shiftleft", h, b)
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, b) => {
        val vote = aggregate(hashes, lit(0L),
          (s, h) => s + (shr(h, b) % 2) * 2 - 1)
        acc + when(vote > 0, shl(lit(1L), b)).otherwise(lit(0L))
      })
  }
}
