package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Benchmark decontamination: which training documents share an n-gram
  * with the (bounded) evaluation set. The exact inverted-index join is
  * the declared x23 shape; [[bloomPrefiltered]] puts a Bloom sketch of
  * the eval shingles in front of it — the 100 TB lever, because the
  * train side is filtered map-side *before* the shuffle, so the exchange
  * carries only shingles that might hit the eval set instead of the
  * whole exploded corpus. False positives survive the prefilter but die
  * in the exact join (a shingle not in the eval set joins to nothing),
  * so the output is bit-identical to the exact path and shares its
  * oracle.
  */
object Contamination {

  /** Distributed Bloom build over a string column: `putString` per row,
    * `mergeInPlace` per partition pair. Build and probe
    * ([[graft.functions.BloomMightContain]], `mightContainString`) both
    * live in this codebase so the hashing contract can't drift. The
    * filter is bounded driver state (~1.2 MB at 1M items / 1% fpp) — the
    * eval set is small by definition; the *train* side never collects.
    */
  def buildBloom(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double): BloomFilter =
    df.select(col(colName)).na.drop().rdd
      .treeAggregate(BloomFilter.create(expectedItems, fpp))(
        (bf, row) => { bf.putString(row.getString(0)); bf },
        (a, b) => { a.mergeInPlace(b); a })

  /** Exploded (id, shingle) sides of the asymmetric join. The shingle
    * relation is checkpointed so the eval branch (read twice when a
    * Bloom build intervenes) and the train branch don't re-shingle.
    */
  private def sides(docs: DataFrame, evalPred: Column,
      n: Int): (DataFrame, DataFrame) = {
    val sg = Dedup.shingled(docs, n).localCheckpoint()
    (sg.filter(evalPred)
      .select(col("doc_id").as("eval_id"), explode(col("sg")).as("sh")),
      sg.filter(!evalPred)
        .select(col("doc_id").as("train_id"), explode(col("sg")).as("sh")))
  }

  private def sharedCountJoin(ev: DataFrame, tr: DataFrame): DataFrame =
    ev.join(tr, Seq("sh"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))

  /** The exact asymmetric inverted-index join — the declared x23 shape,
    * in one place so the query, the Bloom variant, and the specs can't
    * drift apart.
    */
  def exact(docs: DataFrame, evalPred: Column, n: Int = 5): DataFrame = {
    val (ev, tr) = sides(docs, evalPred, n)
    sharedCountJoin(ev, tr)
  }

  /** Exact contamination join with a Bloom prefilter on the train side.
    * `evalPred` splits the corpus (eval = benchmark docs, train = rest).
    * Output = the exact asymmetric inverted-index join ([[exact]]).
    */
  def bloomPrefiltered(docs: DataFrame, evalPred: Column, n: Int = 5,
      expectedItems: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val (ev, tr) = sides(docs, evalPred, n)
    val bf = buildBloom(ev, "sh", expectedItems, fpp)
    sharedCountJoin(ev, tr.filter(
      graft.functions.BloomMightContain.bloom_might_contain(col("sh"), bf)))
  }
}
