package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup
import graft.ops.AsOfJoin

/** The skew levers, exercised on skewed fixtures — every bench number
  * comes from uniform synthetic data, so these specs are what proves the
  * documented escape hatches actually win where they claim to:
  *
  *  - [[Dedup.jaccardPairsPrefix]] vs [[Dedup.jaccardPairsIndexHashed]]
  *    on a hot-shingle (Zipfian-head) corpus: the plain inverted index
  *    shuffles Σ freq² collision rows into its pair aggregate — quadratic
  *    in the hot shingle's frequency — while prefix filtering keeps hot
  *    shingles out of every prefix. The assertions count the actual
  *    collision relations (the rows crossing the pair-key shuffle), a
  *    deterministic stand-in for shuffle bytes, and require identical
  *    final output.
  *  - [[AsOfJoin.asOfBanded]] vs [[AsOfJoin.asOf]] on a hot-key event
  *    stream: the bare-key window serializes the hot key through one
  *    partition; banding caps the per-partition row count at band
  *    granularity. Identical output, bounded max group.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipfian-head corpus: every doc opens with the same hot 15-token
    * phrase (13 hot 3-gram shingles shared by ALL docs) and closes with
    * 15 doc-unique tokens; 20 docs are duplicated verbatim under new ids
    * — the only true near-dup pairs (cross-doc Jaccard via the hot head
    * alone is 13/43 ≈ 0.30 < 0.5).
    */
  private lazy val skewedDocs = {
    val hot = (0 until 15).map(i => s"hot$i").mkString(" ")
    val base = (0 until 400).map { id =>
      (id.toLong, hot + " " + (0 until 15).map(i => s"d${id}u$i").mkString(" "))
    }
    val dups = (0 until 20).map(id => (1000L + id, base(id)._2))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("prefix filtering beats the plain inverted index on a hot-shingle " +
    "corpus: same output, collision rows collapse") {
    val threshold = 0.5
    val viaIndex = Dedup.jaccardPairsIndexHashed(skewedDocs, 3, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val viaPrefix = Dedup.jaccardPairsPrefix(skewedDocs, 3, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(viaIndex == viaPrefix, "skew path must not change results")
    assert(viaIndex.size == 20, "exactly the 20 duplicated docs pair up")
    assert(viaIndex.forall(_._3 == 1.0))

    // the scale claim: rows crossing the pair-key shuffle. The hot
    // shingles put every doc pair into the plain index's collision
    // relation (Σ freq² ≈ 13 × C(420,2)); the prefix keeps only each
    // doc's 15 rarest shingles — its unique tail — so collisions reduce
    // to the true duplicate pairs
    val sg = Dedup.shingled(skewedDocs, 3).localCheckpoint()
    val indexRows = Dedup.indexCollisions(sg, threshold).count()
    val prefixRows = Dedup.prefixCollisions(sg, threshold).count()
    assert(indexRows > 1000000L, s"fixture lost its skew: $indexRows")
    assert(prefixRows * 20 < indexRows,
      s"prefix path stopped beating the plain index on skew: " +
        s"prefix=$prefixRows index=$indexRows")
  }

  test("banded as-of join bounds the hot key's window partition: same " +
    "output, per-partition rows capped at band granularity") {
    // hot key: 5000 left rows on one key; 50 cold keys × 10 rows
    val left = ((0 until 5000).map(t => ("hot", t.toLong)) ++
      (for (k <- 0 until 50; t <- 0 until 10)
        yield (s"k$k", t.toLong * 7))).toDF("key", "t")
    val right = ((0 until 500).map(i => ("hot", i.toLong * 10, s"r$i")) ++
      (0 until 50).map(k => (s"k$k", 20L, s"c$k")))
      .toDF("key", "t", "payload")

    val plain = AsOfJoin.asOf(left, right, "key", "t", Seq("payload"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val banded = AsOfJoin.asOfBanded(left, right, "key", "t", Seq("payload"),
      bandWidth = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(banded == plain, "banding must not change as-of semantics")

    // the scale claim, on the union relation both operators window over:
    // the bare-key partitioning serializes all hot-key rows through ONE
    // sort partition; (key, band) caps it at one band's density
    val u = left.select($"key", $"t")
      .unionByName(right.select($"key", $"t"))
    val maxBare = u.groupBy($"key").count()
      .agg(max($"count")).as[Long].head()
    val band = (col("t") - pmod(col("t"), lit(100L))) / 100L
    val maxBanded = u.groupBy($"key", band.as("band")).count()
      .agg(max($"count")).as[Long].head()
    assert(maxBare >= 5000L)
    assert(maxBanded * 10 <= maxBare,
      s"banding stopped bounding the hot key: bare=$maxBare banded=$maxBanded")
  }

  test("source overlap on a stopword shingle: pair fan-out stays " +
    "|sources|^2-bounded, never doc^2") {
    // every doc in every source opens with the same hot 3-gram — the
    // worst case for any doc-level formulation (freq = corpus size) —
    // plus one shingle shared only by sources s0/s1 and unique tails
    val hot = "the of and"
    def doc(src: Int, i: Int) = {
      val shared = if (src <= 1) " common a b" else ""
      (src * 1000L + i, s"$hot$shared u${src}x$i y${src}x$i z${src}x$i",
        s"s$src")
    }
    val sources = 5
    def corpus(docsPerSource: Int) =
      (for (s <- 0 until sources; i <- 0 until docsPerSource)
        yield doc(s, i)).toDF("doc_id", "text", "source")

    val small = corpus(40) // 200 docs
    val big = corpus(400) // 2000 docs — 10× the corpus, same sources
    val out = Dedup.sourceOverlap(big, 3).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // the hot shingle contributes exactly 1 to every source pair;
    // "common a b"-region shingles add s0-s1-only counts on top
    assert(out.size == sources * (sources - 1) / 2)
    assert(out.filter { case ((a, b), _) => a != "s0" || b != "s1" }
      .forall(_._2 == 1L), s"cross-pair counts must be hot-shingle only: $out")
    assert(out(("s0", "s1")) > 1L)

    // the scale claim: rows entering the pair expansion are per-shingle
    // source SETS (≤ |sources| each), so the fan-out is identical at 10×
    // the corpus — while any doc-level self-join would grow ~100×
    def pairFanout(docs: org.apache.spark.sql.DataFrame): Long = {
      val srcsPerShingle = docs
        .select(col("source"),
          graft.ext.TextAnalysis.tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("source"),
          explode(graft.ext.TextAnalysis.shinglesFromTokens(col("ws"), 3))
            .as("sg"))
        .groupBy(unhex(md5(col("sg"))).as("h"))
        .agg(collect_set(col("source")).as("srcs"))
      srcsPerShingle
        .agg(sum(size(col("srcs")) * size(col("srcs")))).as[Long].head()
    }
    def docFanout(docs: org.apache.spark.sql.DataFrame): Long = {
      // what a doc-level inverted self-join would shuffle: Σ freq²
      val freqs = docs
        .select(graft.ext.TextAnalysis.tokens(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(explode(
          graft.ext.TextAnalysis.shinglesFromTokens(col("ws"), 3)).as("sg"))
        .groupBy(col("sg")).agg(count(lit(1)).as("f"))
      freqs.agg(sum(col("f") * col("f"))).as[Long].head()
    }
    val (fanSmall, fanBig) = (pairFanout(small), pairFanout(big))
    val docBig = docFanout(big)
    assert(docBig > 4000000L, s"fixture lost its skew: doc-level $docBig")
    assert(fanBig <= fanSmall * 12,
      s"pair fan-out must track shingle vocabulary, not corpus size: " +
        s"small=$fanSmall big=$fanBig")
    assert(fanBig * 100 < docBig,
      s"source-set fan-out stopped beating doc-level freq²: " +
        s"pairs=$fanBig docLevel=$docBig")
  }

  test("substring overlap with a boilerplate header: maxDf collapses the " +
    "hot fingerprint's freq² rows, planted pairs unchanged") {
    // every doc carries the same 40-char header → a handful of hot
    // fingerprints with df = corpus size; 10 planted pairs share a long
    // rare tail (≥ minShared rare fingerprints each)
    val header = "THIS SOFTWARE IS PROVIDED AS IS WITHOUT WARRANTY "
    def tail(seed: Int) = {
      val r = new scala.util.Random(seed)
      (0 until 160).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    val base = (0 until 300).map(i => (i.toLong, header + tail(i)))
    val clones = (0 until 10).map(j => (2000L + j, header + tail(j)))
    val d = (base ++ clones).toDF("doc_id", "text")

    val exact = Dedup.substringOverlapPairs(d, k = 16, w = 8,
      minShared = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.substringOverlapPairs(d, k = 16, w = 8,
      minShared = 10, maxDf = Some(50L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == (0 until 10).map(j => (j.toLong, 2000L + j)).toSet,
      s"planted tail-sharing pairs: $exact")
    assert(capped == exact,
      "the df cap must only drop boilerplate fingerprints, not pairs")

    // the scale claim: rows crossing the fingerprint self-join = Σ df².
    // The boilerplate fingerprints put ~corpus² rows into the exact
    // join; the cap removes exactly them
    val fps = d
      .filter(length(col("text")) >= 16 + 8 - 1)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.RollingWinnow.rolling_winnow(col("text"), 16, 8)))
        .as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val joinRowsExact = fps.agg(sum(col("df") * col("df")))
      .as[Long].head()
    val joinRowsCapped = fps.filter(col("df") <= 50)
      .agg(sum(col("df") * col("df"))).as[Long].head()
    assert(joinRowsExact > 300L * 300L,
      s"fixture lost its boilerplate skew: $joinRowsExact")
    assert(joinRowsCapped * 20 < joinRowsExact,
      s"df cap stopped collapsing the hot fingerprint: " +
        s"capped=$joinRowsCapped exact=$joinRowsExact")
  }

  test("semantic dedup on a skewed corpus: more trained centroids bound " +
    "the hot cell, clone recall stays total") {
    import graft.ext.Similarity
    // hot region: 400 unit vectors fanning 90° in the (e0, e1) plane —
    // one dense angular blob; 100 cold vectors on the other axes; 20
    // planted exact clones of hot vectors. All deterministic.
    val dim = 8
    def arc(i: Int): Seq[Float] = {
      // scatter angles across ids (151 coprime to 400) so the first-N
      // Lloyd init starts spread over the blob instead of huddled at
      // its edge — the deterministic stand-in for k-means++ seeding
      val theta = ((i * 151) % 400) * (math.Pi / 2) / 400
      Seq(math.cos(theta).toFloat, math.sin(theta).toFloat) ++
        Seq.fill(dim - 2)(0.0f)
    }
    // distinct e0 jitter per id — no accidental clones among the cold
    // vectors (a modular-only jitter repeats every lcm cycle), and the
    // spacing keeps every cold-cold rounded cosine below the threshold
    def cold(i: Int): Seq[Float] =
      (0 until dim).map(d =>
        if (d == 2 + i % 6) 1.0f
        else if (d == 0) i * 0.01f
        else 0.0f)
    val vecs = (0 until 400).map(i => (i.toLong, arc(i))) ++
      (0 until 100).map(i => (400L + i, cold(i))) ++
      (0 until 20).map(j => (1000L + j, arc(j * 20)))
    val e = vecs.toDF("vec_id", "embedding")
    // threshold admits ONLY exact clones: adjacent arc vectors are
    // 0.225° apart (rounded cos 0.999992 < 0.999999 <= clone 1.0)
    val th = 0.999999
    def run(k: Int) = Similarity.semanticDedup(e, th,
      Similarity.trainCentroids(e, nCentroids = k))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    val out2 = run(2)
    val out8 = run(8)
    // identical vectors share rounded centroid cosines, so a clone and
    // its original always land in the same cell — clone recall is total
    // at ANY centroid count, and nothing else passes the threshold
    for ((out, k) <- Seq((out2, 2), (out8, 8))) {
      val nonReps = out.filterNot(_._3).map(_._1).toSet
      assert(nonReps == (0 until 20).map(j => 1000L + j).toSet,
        s"k=$k: flagged $nonReps")
    }
    // the scale claim: the quadratic within-cell verify is bounded by
    // the LARGEST cell; training more centroids splits the hot blob
    def maxCell(out: Array[(Long, Long, Boolean)]): Int =
      out.groupBy(_._2).values.map(_.length).max
    val (m2, m8) = (maxCell(out2), maxCell(out8))
    assert(m2 >= 250, s"fixture lost its skew: max cell k=2 is $m2")
    assert(m8 * 2 <= m2,
      s"more centroids stopped bounding the hot cell: k=2 max $m2, " +
        s"k=8 max $m8")
  }
}
