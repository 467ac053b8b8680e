package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The at-rest index compaction measured at scale: a long-lived
  * streaming deployment appends one file set per touched cell per
  * micro-batch ([[graft.ext.Similarity.extendIvfIndex]]'s append), so
  * probe cost grows with STREAM LIFETIME (file-open + footer overhead
  * per tiny file), not data size — exactly the degradation
  * [[graft.ext.Similarity.compactIvfIndex]] bounds. This probe seeds a
  * production IVF index over the first (n − batches·batchSize) vectors
  * of `<dir>/embeddings.parquet`, streams the remainder in as
  * maintenance batches through the REAL streaming face
  * ([[graft.streaming.Streams.ivfIndexBatch]], compaction disabled),
  * then measures: total/max-per-cell file counts, the 50-query probe
  * wall BEFORE compaction, the compaction sweep itself at the given
  * per-cell budget, and the probe wall AFTER — plus a repeat sweep to
  * show the no-op pre-check price.
  *
  * Usage: runMain graft.tools.CompactProbe <dir> [batches=20]
  *   [batchSize=500] [budget=8]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val batchSz = if (args.length > 2) args(2).toInt else 500
    val budget = if (args.length > 3) args(3).toInt else 8
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
    val n = emb.count()
    val baseN = n - nBatches.toLong * batchSz
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-cprobe-c").toString
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-cprobe-i").toString
    val k = Similarity.adaptiveCellCount(emb.filter(col("vec_id") < baseN))
    def land(name: String, lo: Long, hi: Long): String = {
      val d = s"$corpusDir/$name"
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .write.mode("overwrite").parquet(d)
      d
    }
    val t0 = System.nanoTime()
    var prev = Streams.ivfIndexBatch(spark, corpusDir,
      land("b0", 0, baseN), None, indexPath, nCentroids = k,
      cellFileBudget = Int.MaxValue)
    val tSeed = (System.nanoTime() - t0) / 1e9
    var tExt = 0.0
    for (b <- 1 to nBatches) {
      val lo = baseN + (b - 1).toLong * batchSz
      val d = land(s"b$b", lo, lo + batchSz)
      val te = System.nanoTime()
      prev = Streams.ivfIndexBatch(spark, corpusDir, d, Some(prev),
        indexPath, nCentroids = k, cellFileBudget = Int.MaxValue)
      tExt += (System.nanoTime() - te) / 1e9
    }
    def fileStats(): (Int, Int) = {
      val cells = new java.io.File(indexPath).listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("cell="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet")))
      (cells.sum, if (cells.isEmpty) 0 else cells.max)
    }
    val q = emb.filter(col("vec_id") >= 5000 && col("vec_id") < 5050)
    def probeWall(): Double = {
      val t = System.nanoTime()
      Similarity.topKIvfIndexed(indexPath, q, k = 10,
        nprobe = Similarity.adaptiveNprobe(k, 0.05)).count()
      (System.nanoTime() - t) / 1e9
    }
    val (filesB, maxB) = fileStats()
    val probeB = (1 to 3).map(_ => probeWall()).min
    println(f"COMPACTPROBE n=$n k=$k batches=$nBatches batchSz=$batchSz " +
      f"seed=${tSeed}%.1fs extTotal=${tExt}%.1fs " +
      f"filesBefore=$filesB maxPerCellBefore=$maxB " +
      f"probeBefore=${probeB}%.2fs")
    val tc = System.nanoTime()
    val ran = Similarity.compactIvfIndex(spark, indexPath, budget)
    val tCompact = (System.nanoTime() - tc) / 1e9
    val (filesA, maxA) = fileStats()
    val probeA = (1 to 3).map(_ => probeWall()).min
    val tn = System.nanoTime()
    val ranAgain = Similarity.compactIvfIndex(spark, indexPath, budget)
    val tNoop = (System.nanoTime() - tn) / 1e9
    println(f"COMPACTPROBE budget=$budget ran=$ran " +
      f"compactSec=${tCompact}%.1f filesAfter=$filesA " +
      f"maxPerCellAfter=$maxA probeAfter=${probeA}%.2fs " +
      f"noopRan=$ranAgain noopSec=${tNoop}%.2f")
    spark.stop()
  }
}
