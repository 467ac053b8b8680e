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
}
