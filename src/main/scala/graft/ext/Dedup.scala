package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.ext.TextAnalysis._

/** Deduplication operators for LLM training-data pipelines: exact
  * (hash-groupBy), brute-force n-gram Jaccard (the small-scale oracle
  * path), and MinHash+LSH banding (the 100 TB path). SimHash lives in
  * [[TextAnalysis.simhash]]; embedding near-dup in [[Similarity]].
  *
  * Scale design: exact dedup is one hash-shuffle on a 16-byte key.
  * MinHash-LSH is linear — signatures are per-row expressions (no UDF, no
  * shuffle), banding explodes each doc into `bands` rows, and the only
  * shuffles are the band-bucket self-join (keys are 8-byte hashes, heavily
  * pruned) and the final pair-dedup. Candidate pairs are then verified with
  * the exact Jaccard, so LSH parameters only affect recall probability,
  * never the *meaning* of the output — with b=64, r=2 the miss probability
  * at j=0.5 is (1-0.25)^64 ≈ 1e-8, so output equals brute force w.h.p.
  */
object Dedup {

  /** Exact dedup: group by canonical fingerprint, keep the smallest doc_id
    * as the cluster representative. One shuffle on the md5 key; at 100 TB
    * the payload crossing the wire is (fingerprint, id) pairs only.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(fingerprint(col("text")).as("fp"), col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Shingle-set prep shared by the pairwise paths. */
  def shingled(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), wordShingles(col("text"), n).as("sg"))
      .filter(size(col("sg")) > 0)

  /** Brute-force all-pairs n-gram Jaccard ≥ threshold. O(n²) pairs — the
    * correctness oracle and the right choice only when one side fits in a
    * broadcast. A lossless size-ratio prune (J(A,B) ≤ min|·|/max|·|) cuts
    * the quadratic constant without changing results.
    */
  def jaccardPairsBrute(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val sg = shingled(docs, n)
    val a = sg.select(col("doc_id").as("da"), col("sg").as("sga"))
    val b = sg.select(col("doc_id").as("db"), col("sg").as("sgb"))
    a.join(b, col("da") < col("db"))
      .filter(
        least(size(col("sga")), size(col("sgb"))).cast(DoubleType) /
          greatest(size(col("sga")), size(col("sgb"))) >= threshold)
      .select(col("da"), col("db"),
        round(jaccard(col("sga"), col("sgb")), 6).as("j"))
      .filter(col("j") >= threshold)
  }

  /** MinHash signature as a per-row expression array: for hash i,
    * min over shingles of a universal hash of the shingle's 60-bit md5
    * value. Seeds are fixed literals → deterministic across runs (the
    * exact-verify step makes their choice semantically irrelevant).
    */
  private val MersennePrime31 = 2147483647L // 2^31 - 1

  def minhashSignature(sg: Column, numHashes: Int): Column = {
    // Universal hash in a 31-bit space: with h' = h mod p and a,b < 2^30,
    // a*h' + b < 2^61 — no ANSI long overflow at any input.
    val seeds = (0 until numHashes).map { i =>
      val a = (0x9E3779B97F4A7C15L * (i + 1) & 0x3FFFFFFFL) | 1L
      val b = 0xBF58476D1CE4E5B9L * (i + 7) & 0x3FFFFFFFL
      (a, b)
    }
    val hv = transform(sg, s => pmod(hash60(s), lit(MersennePrime31)))
    array(seeds.map { case (a, b) =>
      array_min(transform(hv, h => pmod(h * lit(a) + lit(b), lit(MersennePrime31))))
    }: _*)
  }

  /** MinHash + LSH banding near-dup: the scale path.
    *
    * sig → band keys (hash r consecutive sig slots) → explode to
    * (band, key, id) → self-join per bucket → distinct candidate pairs →
    * exact-Jaccard verify ≥ threshold. Tuned b=64, r=2 (numHashes=128) for
    * near-certain recall at j ≥ 0.5.
    */
  def jaccardPairsLsh(
      docs: DataFrame,
      n: Int = 3,
      threshold: Double = 0.5,
      numHashes: Int = 128,
      bands: Int = 64): DataFrame = {
    val rows = numHashes / bands
    val sg = shingled(docs, n)
    val withBands = sg
      .withColumn("sig", minhashSignature(col("sg"), numHashes))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bkey",
        hash(col("band"), slice(col("sig"), col("band") * rows + 1, lit(rows))))
      .select(col("doc_id"), col("band"), col("bkey"))
    val l = withBands.select(col("band"), col("bkey"), col("doc_id").as("da"))
    val r = withBands.select(col("band"), col("bkey"), col("doc_id").as("db"))
    val candidates = l
      .join(r, Seq("band", "bkey"))
      .filter(col("da") < col("db"))
      .select("da", "db")
      .distinct()
    val a = sg.select(col("doc_id").as("da"), col("sg").as("sga"))
    val b = sg.select(col("doc_id").as("db"), col("sg").as("sgb"))
    candidates
      .join(a, "da")
      .join(b, "db")
      .select(col("da"), col("db"),
        round(jaccard(col("sga"), col("sgb")), 6).as("j"))
      .filter(col("j") >= threshold)
  }
}
