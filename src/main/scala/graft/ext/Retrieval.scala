package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.ext.TextAnalysis.tokens

/** Retrieval primitives over the document corpus: Okapi BM25 lexical
  * scoring and reciprocal-rank fusion of ranked lists — the query-side
  * operations a training-data pipeline runs for hard-negative mining,
  * eval-set retrieval, and hybrid (lexical + vector) corpus search.
  *
  * The reference engine has no retrieval surface; these extend the
  * engine the same way the dedup/ANN family does, and x52 composes
  * [[bm25]] with the existing ANN top-k into a hybrid search.
  */
object Retrieval {

  /** Exact decimal sum for 6-dp-rounded double scores. Summing doubles
    * is partial-agg-order dependent; a decimal sum is associative, so
    * the aggregate is reproducible across runs and engines. (The shared
    * [[graft.ops.CoreOps.exactSum]] is money-scale DECIMAL(18,2) —
    * scores need the 6 dp the per-term rounding kept.)
    */
  private def scoreSum(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast(DoubleType)

  /** Okapi BM25 scores for a literal term query over the corpus:
    * score(D, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl))
    * with the standard idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
    * Returns (doc_id, score) for every document matching ≥1 term,
    * score carrying exactly 6 decimals (per-term scores are rounded to
    * 6 dp, then summed exactly — see [[scoreSum]] — so equal-scoring
    * docs tie deterministically and rank tie-breaks are portable).
    *
    * Scale shape: document length and the filtered query-term explode
    * ride the SAME map-side pass over the corpus (no shuffle before the
    * (doc, term) tf aggregate, whose key count is bounded by matches ×
    * |Q|); df and the corpus stats are ≤|Q|-row / 1-row broadcasts.
    * The corpus is tokenized twice (stats + tf) — two map passes, no
    * materialization, the same trade [[TextAnalysis]]'s tf-idf makes.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val perDoc = docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        filter(col("ws"), w => w.isInCollection(terms)).as("qws"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = perDoc
      .select(col("doc_id"), col("dl"), explode(col("qws")).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // fractional literals are spelled with the SAME operation order the
    // DuckDB oracle uses, so both engines execute identical IEEE ops
    tf.join(broadcast(dfq), "word")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("ts", round(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))), 6))
      .groupBy(col("doc_id"))
      .agg(round(scoreSum(col("ts")), 6).as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of ranked lists:
    * each list contributes 1/(c + rank) per document; fused score is the
    * exact sum of the 6-dp-rounded contributions (portable ties, as in
    * [[bm25]]). Returns (doc_id, rrf, n_lists).
    *
    * Feed it bounded lists (top-k per ranker): fusion then never sees
    * more than Σk rows, so the rank windows upstream stay post-limit
    * single-partition windows over k rows — the 100 TB shape is
    * TakeOrderedAndProject per ranker, not a global sort.
    */
  def rrfFuse(lists: Seq[DataFrame], c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    lists
      .map(_.select(col("doc_id"),
        round(lit(1.0) / (lit(c) + col("rank")), 6).as("contrib")))
      .reduce(_.unionAll(_))
      .groupBy(col("doc_id"))
      .agg(round(scoreSum(col("contrib")), 6).as("rrf"),
        count(lit(1)).as("n_lists"))
  }
}
