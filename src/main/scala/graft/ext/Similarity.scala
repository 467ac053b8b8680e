package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path is
  * bucketed pruning (LSH by random hyperplane sign / IVF by coarse
  * centroid) so a 100 TB corpus is probed, not scanned, per query. Vector
  * math runs through [[graft.functions.FloatVecDot]] — a codegen'd
  * Catalyst expression with the same left-to-right double accumulation as
  * the portable HOF form, minus its per-row array allocation.
  */
object Similarity {

  /** dot(a,b): the custom codegen expression. [[dotHof]] is the portable
    * higher-order-function formulation, kept as the semantics oracle
    * (GraftFunctionsSpec asserts bit-equality).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VecDot.vec_dot(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Embedding near-duplicate pairs: all pairs with rounded cosine ≥
    * threshold. Norms are computed once per row *before* the pair join —
    * at n² pairs that one precompute is the difference between 2n and 2n²
    * norm evaluations.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val withNorm = emb.select(
      col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val a = withNorm.select(col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Brute-force cosine top-k: each query vector against the full corpus.
    * The query side is broadcast (it is small by construction); ranking is
    * a per-query window over rounded similarity with id tie-break, so
    * results are total-ordered and engine-portable.
    */
  def topKBrute(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), norm(col("embedding")).as("cn"))
    val q = queries.select(col("vec_id").as("qid"),
      col("embedding").as("qe"), norm(col("embedding")).as("qn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cos"))
  }

  /** Random-hyperplane LSH bucket id: sign bits of dot products with
    * `nbits` fixed pseudo-random hyperplanes (deterministic literals
    * derived from the dimension index — no RNG at plan time). Vectors in
    * the same bucket are near in angle w.h.p.; a multi-probe search scans
    * the query's bucket plus Hamming-1 neighbors.
    */
  def hyperplaneBucket(e: Column, dim: Int, nbits: Int,
      planeOffset: Int = 0): Column = {
    def planeWeight(bit0: Int, d: Int): Double = {
      val bit = bit0 + planeOffset
      // fixed splitmix64-ish pseudo-random weight in [-1, 1)
      var z = (bit.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L)
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    (0 until nbits).map { bit =>
      // the projection is a dot product against a literal weight vector —
      // one codegen'd vec_dot per plane instead of dim scalar terms per
      // plane (the scalar form made a 4k-node expression tree per sketch
      // and measurably stressed codegen/driver heap)
      val weights = (0 until dim).map(d => planeWeight(bit, d).toFloat)
      val proj = dot(e, typedlit(weights))
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Scale path for embedding near-dup: random-hyperplane bucketing with
    * Hamming-1 multi-probe as the candidate generator, exact cosine as
    * the verifier — same candidates-then-verify structure as MinHash-LSH
    * for text (Dedup.jaccardPairsLsh). Cost is Σ bucket² instead of n²;
    * every shuffle keys on the bucket id. Recall is probabilistic in the
    * bucket bits (angle ≥ ~66° pairs may be missed), so: rows-only check,
    * with the subset+agreement property asserted against the brute pairs
    * in ExtSpec.
    */
  def nearDupPairsLsh(emb: DataFrame, threshold: Double,
      dim: Int = 64, nbits: Int = 4, tables: Int = 16): DataFrame = {
    // multi-table LSH (the banding trick in hyperplane space): T
    // independent 4-bit sketches; a pair is a candidate if ANY table
    // buckets it together. At cos=0.4 (~66°), P(all 4 planes agree) ≈
    // 0.16 per table → ≥1-of-16 recall ≈ 0.94; near-dups at cos≥0.9 are
    // caught w.p. ~1. Exact-verify keeps the output meaning exact.
    val withMeta = emb.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"),
      array((0 until tables).map(t =>
        struct(lit(t).as("t"),
          hyperplaneBucket(col("embedding"), dim, nbits, t * nbits)
            .as("b"))): _*).as("buckets"))
    val banded = withMeta
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(col("buckets")).as("tb"))
    val a = banded.select(col("tb"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = banded.select(col("tb"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, Seq("tb"))
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Top-k via the bounded-heap [[graft.functions.TopKAgg]] — identical
    * output to [[topKBrute]] (scores pre-rounded, id tie-break) but with
    * partial aggregation: each map task reduces its scored slice to ≤ k
    * pairs before the shuffle, so the exchange carries O(queries × k)
    * rows instead of O(corpus × queries) — the difference between a
    * viable and a doomed plan at 100 TB corpus scale.
    */
  def topKAggregated(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"),
      col("embedding").as("ce"), norm(col("embedding")).as("cn"))
    val q = queries.select(col("vec_id").as("qid"),
      col("embedding").as("qe"), norm(col("embedding")).as("qn"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6).as("cos"))
    val topk = udaf(new graft.functions.TopKAgg(k))
    scored
      .groupBy(col("qid"))
      .agg(topk(col("cos"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("t._2").as("cid"), col("t._1").as("cos"))
  }

  /** IVF-style top-k: a fixed set of coarse "centroid" vectors partitions
    * the corpus into cells (assignment = nearest centroid by cosine); a
    * query probes only its own `nprobe` nearest cells. At rest the cell id
    * is a partition/bucket column, so a 100 TB corpus is pruned to a few
    * cells per query. Deterministic here (centroids = the first
    * `nCentroids` corpus vectors — a k-means step would slot in without
    * changing the plan shape). Approximate by design → rows-only check.
    */
  def topKIvf(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 8, nprobe: Int = 2): DataFrame = {
    val cent = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent_e"),
        norm(col("embedding")).as("cent_n"))
    // cell assignment is an aggregation (max_by / bounded top-k), not a
    // window rank: partial aggregation collapses the vectors×centroids
    // product map-side instead of sorting it through a shuffle
    val c = corpus
      .select(col("vec_id").as("cid"), col("embedding").as("ce"),
        norm(col("embedding")).as("cn"))
      .join(broadcast(cent))
      .withColumn("cent_cos",
        dot(col("ce"), col("cent_e")) / (col("cn") * col("cent_n")))
      .groupBy(col("cid"))
      .agg(first(col("ce")).as("ce"), first(col("cn")).as("cn"),
        max_by(col("cent_id"), col("cent_cos")).as("cell"))
    val probeAgg = udaf(new graft.functions.TopKAgg(nprobe))
    val q = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        norm(col("embedding")).as("qn"))
      .join(broadcast(cent))
      .withColumn("cent_cos",
        dot(col("qe"), col("cent_e")) / (col("qn") * col("cent_n")))
      .groupBy(col("qid"))
      .agg(first(col("qe")).as("qe"), first(col("qn")).as("qn"),
        probeAgg(col("cent_cos"), col("cent_id")).as("cells"))
      .select(col("qid"), col("qe"), col("qn"),
        explode(col("cells")).as("cellStruct"))
      .withColumn("cell", col("cellStruct._2"))
      .drop("cellStruct")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6).as("cos"))
      .distinct() // a pair can meet in several probed cells
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cos"))
  }

  /** Bucketed (LSH) top-k: candidates limited to the query's bucket; the
    * bucket column is groupable/bucketable at rest, so at scale the join
    * is partition-pruned instead of all-pairs. Approximate by design —
    * recall depends on nbits; verify-side rank semantics identical to
    * [[topKBrute]].
    */
  def topKLsh(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = 64, nbits: Int = 4): DataFrame = {
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("ce"),
      norm(col("embedding")).as("cn"),
      hyperplaneBucket(col("embedding"), dim, nbits).as("bucket"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      norm(col("embedding")).as("qn"),
      hyperplaneBucket(col("embedding"), dim, nbits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")), 6).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("cos"))
  }
}
