package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The FULL at-rest IVF lifecycle one decade PAST the kMax cap —
  * round-15 verdict #4. Raising `spark.graft.ivf.kMax` to 8192 was
  * previously claimed safe by extrapolation (2 MB k-row model, √k
  * coarse relation); this measures the claim end to end on the 100×
  * corpus (the 200 k-vector GenCorpus table, perCell sized so the
  * adaptive k pins AT the raised cap):
  *
  *  1. SEED through `IndexProfile.Production()` with NO explicit
  *     trainer flag — the hierKMin auto-switch must route the hier
  *     trainer at this k (the stamp's profile token is printed as
  *     evidence);
  *  2. PROBE 50 seed-disjoint queries at the DEFAULT adaptive nprobe
  *     (conf fraction) and at the legacy fixed nprobe = 2, recall@10
  *     vs brute for both — the read-side dial at a k where fixed-2
  *     probes 0.02% of cells;
  *  3. EXTEND with the 10 k id-tail batch under the frozen model;
  *  4. run the cell-compaction sweep over the accreted cells
  *     (budget 1, so every touched cell compacts — the sweep's cost
  *     shape at this cell count).
  *
  * Usage: runMain graft.tools.CapLifecycleProbe <dir> [perCell=23]
  *   [kMax=8192]
  */
object CapLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val perCell = if (args.length > 1) args(1).toInt else 23
    val kMax = if (args.length > 2) args(2).toInt else 8192
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Checkpoints.MaterializeOps
    import graft.ext.{IndexProfile, Similarity}
    spark.conf.set(Similarity.KMaxKey, kMax.toString)
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).materialized
    val base = all.filter(col("vec_id") < 190000L).materialized
    val batch = all.filter(col("vec_id") >= 190000L)
    val n = base.count()
    val k = Similarity.adaptiveCellCount(base, perCell = perCell)
    println(s"CAPLC dir=$dir n=$n batch=${batch.count()} k=$k kMax=$kMax")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"CAPLC $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val path = java.nio.file.Files
      .createTempDirectory("graft-caplc").toString
    // 1. seed — plain Production(): the auto-switch must pick hier
    timed("seed") {
      Similarity.ensureIvfIndex(base, path, nCentroids = k,
        profile = IndexProfile.Production())
    }
    val stamp = graft.engine.AtRest
      .readStamp(spark, path, "_graft_ivf_meta").getOrElse("<none>")
    println(s"CAPLC stamp trainer token: " +
      stamp.split('|').head.split(':').last)
    // 2. probe: adaptive default vs legacy fixed 2, recall vs brute
    val q = base.filter(col("vec_id") >= 50000L && col("vec_id") < 50050L)
      .materialized
    val brute = timed("brute") {
      Similarity.topKBrute(base, q, k = 10)
        .select(col("qid"), col("cid")).materialized
    }
    val nb = brute.count().toDouble
    def recall(tag: String, nprobe: Int,
        truth: org.apache.spark.sql.DataFrame = brute,
        nTruth: Double = nb): Unit = {
      val hit = timed(s"probe:$tag") {
        truth.join(
          Similarity.topKIvfIndexed(path, q, k = 10, nprobe = nprobe)
            .select(col("qid"), col("cid"), lit(1).as("h")),
          Seq("qid", "cid"), "left")
          .agg(count(col("h"))).head().getLong(0)
      }
      println(f"CAPLC recall@10 $tag = ${hit / nTruth}%.4f")
    }
    recall("adaptive", 0) // conf default fraction
    recall("fixed2", 2)
    // 3. extend under the frozen model
    timed("extend") {
      Similarity.extendIvfIndex(base, batch, path, nCentroids = k,
        profile = IndexProfile.Production(), unionView = Some(all))
    }
    // 4. compaction sweep at budget 1: every accreted cell compacts
    timed("compact") {
      Similarity.compactIvfIndex(spark, path, maxFilesPerCell = 1)
    }
    // post-lifecycle probe still healthy (stamp moved to the union;
    // truth recomputed over base ∪ batch — the index now holds both)
    val bruteAll = Similarity.topKBrute(all, q, k = 10)
      .select(col("qid"), col("cid")).materialized
    recall("post", 0, bruteAll, bruteAll.count().toDouble)
    spark.stop()
  }
}
