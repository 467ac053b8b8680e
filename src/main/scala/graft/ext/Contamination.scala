package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.engine.Checkpoints.MaterializeOps

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

  /** Typed Aggregator wrapping the Bloom build so it runs INSIDE the SQL
    * engine (partial per-partition buffers, merge at the final agg —
    * visible in the plan and the SQL metrics) instead of dropping to the
    * RDD API. The buffer is the mutable BloomFilter itself
    * (java-serialized only when partials cross the partition boundary);
    * the output is its portable byte form.
    */
  private class BloomAgg(expectedItems: Long, fpp: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
    def reduce(bf: BloomFilter, s: String): BloomFilter = {
      if (s != null) bf.putString(s)
      bf
    }
    def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
      a.mergeInPlace(b); a
    }
    def finish(bf: BloomFilter): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Distributed Bloom build over a string column: `putString` per row,
    * `mergeInPlace` per partition pair, as a DataFrame-native typed
    * [[Aggregator]] (one partial-agg pass, no RDD API). Build and probe
    * ([[graft.functions.BloomMightContain]], `mightContainString`) both
    * live in this codebase so the hashing contract can't drift. The
    * filter is bounded driver state (~1.2 MB at 1M items / 1% fpp) — the
    * eval set is small by definition; the *train* side never collects.
    */
  def buildBloom(df: DataFrame, colName: String, expectedItems: Long,
      fpp: Double): BloomFilter = {
    val agg = new BloomAgg(expectedItems, fpp).toColumn.name("bloom")
    val bytes = df.select(col(colName)).na.drop()
      .as[String](Encoders.STRING)
      .select(agg)
      .head()
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Exploded (id, shingle) sides of the asymmetric join. NEVER
    * materialize the train branch: it is the whole corpus, and an eager
    * checkpoint of it pays a full extra pass plus block-manager storage
    * for millions of shingle arrays (measured: a 5.9× regression on the
    * exact path). Each branch reads the parquet once with the eval
    * predicate pushed down, so nothing is computed twice within one
    * plan. `materializeEval` checkpoints ONLY the (small by definition)
    * eval branch, for callers that read it twice (the Bloom build).
    */
  private def sides(docs: DataFrame, evalPred: Column, n: Int,
      materializeEval: Boolean): (DataFrame, DataFrame) = {
    val sg = Dedup.shingled(docs, n)
    val ev = sg.filter(evalPred)
      .select(col("doc_id").as("eval_id"), explode(col("sg")).as("sh"))
    val tr = sg.filter(!evalPred)
      .select(col("doc_id").as("train_id"), explode(col("sg")).as("sh"))
    (if (materializeEval) ev.materialized else ev, tr)
  }

  /** Join the big exploded train side against the small eval side. With
    * `broadcastEval` the eval side is broadcast-hinted: the train side
    * streams through a BroadcastHashJoin with NO shuffle of the exploded
    * corpus — the property that makes this shape survive a 100× scale-up
    * (the only exchange left carries the grouped (eval_id, train_id)
    * pairs, kilobytes).
    */
  private def sharedCountJoin(ev: DataFrame, tr: DataFrame,
      broadcastEval: Boolean): DataFrame =
    tr.join(if (broadcastEval) broadcast(ev) else ev, Seq("sh"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))

  /** The exact asymmetric inverted-index join — the declared x23 shape,
    * in one place so the query, the Bloom variant, and the specs can't
    * drift apart. Reads each branch exactly once: no checkpoint.
    *
    * HARD REQUIREMENT: with `broadcastEval` (the default, and the shape
    * PlanSpec gates), `evalPred` must select a BOUNDED benchmark-sized
    * slice — its exploded shingles are collected to the driver and
    * shipped to every executor, so an eval side beyond broadcast scale
    * (~eval docs × shingles ≈ tens of MB) fails the build or OOMs. For
    * an oversized eval set pass `broadcastEval = false` to fall back to
    * a shuffle join of both exploded sides.
    */
  def exact(docs: DataFrame, evalPred: Column, n: Int = 5,
      broadcastEval: Boolean = true): DataFrame = {
    val (ev, tr) = sides(docs, evalPred, n, materializeEval = false)
    sharedCountJoin(ev, tr, broadcastEval)
  }

  /** Exact contamination join with a Bloom prefilter on the train side.
    * `evalPred` splits the corpus (eval = benchmark docs, train = rest).
    * Output = the exact asymmetric inverted-index join ([[exact]]).
    * The eval branch is read twice (Bloom build + join), so only that
    * branch is checkpointed. The [[exact]] `broadcastEval` bound applies
    * identically — and the Bloom build additionally holds the eval
    * shingle sketch (~1.2 MB at 1M items) on the driver.
    */
  def bloomPrefiltered(docs: DataFrame, evalPred: Column, n: Int = 5,
      expectedItems: Long = 1 << 20, fpp: Double = 0.01,
      broadcastEval: Boolean = true): DataFrame = {
    val (ev, tr) = sides(docs, evalPred, n, materializeEval = true)
    val bf = buildBloom(ev, "sh", expectedItems, fpp)
    sharedCountJoin(ev, tr.filter(
      graft.functions.BloomMightContain.bloom_might_contain(col("sh"), bf)),
      broadcastEval)
  }
}
