package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Landed-corpus consolidation at SEED scale — round-15 verdict
  * stretch #8. ConsolidateProbe measured the fold's metadata economics
  * over 150 tiny batches; this measures the fold's DATA cost where it
  * is largest: a 190 k-vector seeded kNN face, driven through one
  * b-tail fold (which copies the whole corpus once — the seed is a b
  * dir) and one forced FULL fold (c-list at budget: everything
  * re-copied into one dir), confirming at that scale that
  *
  *  - each fold's wall is one bounded corpus rewrite (the ~2
  *    copies/row amortization's unit cost),
  *  - the trained model survives every fold bit-identically
  *    (restamp, never re-train), and
  *  - the face keeps EXTENDING afterwards (frozen centroids, no
  *    rebuild) — the post-fold batch wall is extension-sized, not
  *    seed-sized.
  *
  * Usage: runMain graft.tools.SeedFoldProbe <dir>
  */
object SeedFoldProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Checkpoints.MaterializeOps
    import graft.ext.Similarity
    import graft.streaming.Streams
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).materialized
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-seedfold-c").toString
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-seedfold-i").toString
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SEEDFOLD $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    def land(id: Int, lo: Long, hi: Long): String = {
      val d = s"$corpusDir/b$id"
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .write.mode("overwrite").parquet(d)
      d
    }
    def cents(): Seq[String] = Similarity
      .readKnnCentroids(spark, indexPath)
      .collect().map(_.toString).sorted.toSeq
    // seed: 190 k vectors as b0 (Production default — trains)
    var prev: Option[Vector[String]] = None
    val b0 = land(0, 0L, 190000L)
    prev = Some(timed("seed") {
      Streams.knnIndexBatch(spark, corpusDir, b0, prev, indexPath, k = 3)
    })
    val seedCents = cents()
    println(s"SEEDFOLD model k=${seedCents.size} cells")
    // four 2 000-vector extensions (the steady-state batch shape)
    for (b <- 1 to 4) {
      val d = land(b, 190000L + (b - 1) * 2000L, 190000L + b * 2000L)
      prev = Some(timed(s"extend b$b") {
        Streams.knnIndexBatch(spark, corpusDir, d, prev, indexPath, k = 3)
      })
    }
    val nRows = spark.read.parquet(prev.get: _*).count()
    // fold 1 — the b tail (= the whole corpus incl. the 190 k seed)
    prev = Some(timed("fold:b-tail") {
      Streams.consolidateLanded(spark, corpusDir, prev.get,
        (o, n) => Similarity.restampKnnIndex(spark, indexPath, o, n))
    })
    require(cents() == seedCents, "fold 1 must not retrain")
    require(spark.read.parquet(prev.get: _*).count() == nRows,
      "fold 1 must preserve every row")
    println(s"SEEDFOLD after fold 1: dirs=${prev.get.size}")
    // one more extension over the folded layout, then the FULL fold
    val d5 = land(5, 198000L, 200000L)
    prev = Some(timed("extend b5") {
      Streams.knnIndexBatch(spark, corpusDir, d5, prev, indexPath, k = 3)
    })
    prev = Some(timed("fold:FULL") {
      Streams.consolidateLanded(spark, corpusDir, prev.get,
        (o, n) => Similarity.restampKnnIndex(spark, indexPath, o, n),
        maxConsolidated = 1)
    })
    require(cents() == seedCents, "full fold must not retrain")
    require(spark.read.parquet(prev.get: _*).count() == nRows + 2000,
      "full fold must preserve every row")
    println(s"SEEDFOLD after full fold: dirs=${prev.get.size} " +
      s"rows=${nRows + 2000}")
    // and the face still extends over the fully-folded layout —
    // restart-shaped (prev = None lists the manifest view); fresh ids
    // derived from the tail so the batch is non-empty and disjoint
    val d6 = s"$corpusDir/b6"
    emb.filter(col("vec_id") >= 188000L && col("vec_id") < 190000L)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .write.mode("overwrite").parquet(d6)
    timed("extend b6") {
      Streams.knnIndexBatch(spark, corpusDir, d6, None, indexPath, k = 3)
    }
    require(cents() == seedCents, "post-full-fold batch must extend")
    spark.stop()
  }
}
