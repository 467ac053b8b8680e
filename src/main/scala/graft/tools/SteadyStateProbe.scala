package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming steady state AT THE RAISED CAP — round-16 verdict #8
  * (stretch). The r16 SCALE row measured compaction as a forced
  * budget-1 worst case (154.4 s, every touched cell folds); this probe
  * measures what a long-lived stream actually pays: the DEFAULT
  * 32-files/cell trigger over a long batch sequence at kMax = 8192,
  * amortized.
  *
  * The corpus must be the SKEW one (GenCorpus `--skew`: head cell
  * ≈ 28% of rows) for the trigger to be reachable at all — under iid
  * load a 2.5 k-row batch touches each of 8192 cells with p ≈ 0.3, so
  * a cell needs ~100 batches to accrete 32 files; under Zipf skew the
  * head cells take a file EVERY batch and cross the trigger at batch
  * ~32, which is exactly the steady-state shape production crawls
  * have (hot cells compact periodically, cold cells never do).
  *
  *  - SEED the first `seedN` vectors at perCell sized to pin the
  *    adaptive cell count AT kMax;
  *  - stream the rest in `nBatches` equal id-contiguous batches
  *    through `Streams.ivfIndexBatch` (extend + default-budget
  *    compaction — the real maintenance step);
  *  - per batch: wall time, parquet file count under the index root
  *    (so compaction events are visible as file-count DROPS), cells
  *    over the budget before the step ran;
  *  - report the amortized steady-state sec/batch over the second
  *    half, where the trigger cadence has stabilized.
  *
  * Usage: runMain graft.tools.SteadyStateProbe <skewDir> [seedN=100000]
  *   [perCell=12] [kMax=8192] [nBatches=40]
  */
object SteadyStateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val seedN = if (args.length > 1) args(1).toLong else 100000L
    val perCell = if (args.length > 2) args(2).toInt else 12
    val kMax = if (args.length > 3) args(3).toInt else 8192
    val nBatches = if (args.length > 4) args(4).toInt else 40
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
    spark.conf.set(Similarity.KMaxKey, kMax.toString)
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).materialized
    val nAll = all.count()
    val base = all.filter(col("vec_id") < seedN).materialized
    val k = Similarity.adaptiveCellCount(base, perCell = perCell)
    val sliceSize = ((nAll - seedN) / nBatches).toInt
    println(s"STEADY dir=$dir seed=$seedN k=$k kMax=$kMax " +
      s"batches=$nBatches x $sliceSize")
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-steady-c").toString
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-steady-i").toString
    def fileCount(): Int = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(indexPath))
      try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }
    def step(newDir: String, prev: Option[Vector[String]], tag: String)
        : Vector[String] = {
      val f0 = fileCount()
      val t0 = System.nanoTime()
      val dirs = graft.streaming.Streams.ivfIndexBatch(spark, corpusDir,
        newDir, prev, indexPath, nCentroids = k)
      val sec = (System.nanoTime() - t0) / 1e9
      val f1 = fileCount()
      // r18: the refresh retrain runs async by default — mark batches
      // that returned with one still in flight (the serve-frozen
      // window) so the log shows the stall-free cadence explicitly
      val rt = if (graft.streaming.Streams.retrainInFlight(indexPath))
        " retrain-in-flight" else ""
      println(f"STEADY $tag%-8s ${sec}%7.1fs files=$f1%6d " +
        f"(delta=${f1 - f0}%+d)$rt")
      dirs
    }
    base.write.mode("overwrite").parquet(s"$corpusDir/b0")
    var prev: Option[Vector[String]] =
      Some(step(s"$corpusDir/b0", None, "seed"))
    val times = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to nBatches).foreach { i =>
      val lo = seedN + (i - 1).toLong * sliceSize
      val hi = if (i == nBatches) nAll else seedN + i.toLong * sliceSize
      all.filter(col("vec_id") >= lo && col("vec_id") < hi)
        .write.mode("overwrite").parquet(s"$corpusDir/b$i")
      val t0 = System.nanoTime()
      prev = Some(step(s"$corpusDir/b$i", prev, s"batch$i"))
      times += (System.nanoTime() - t0) / 1e9
    }
    val steady = times.drop(nBatches / 2)
    println(f"STEADY amortized sec/batch (second half) = " +
      f"${steady.sum / steady.size}%.1f (min ${steady.min}%.1f, " +
      f"max ${steady.max}%.1f)")
    spark.stop()
  }
}
