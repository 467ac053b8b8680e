package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The full at-rest IVF SEED at a chosen cell density, sampled trainer
  * vs hier trainer — the end-to-end number behind x148/x149's claim:
  * TrainSampleProbe times the training term alone; this times
  * `ensureIvfIndex` (train + two-level assignment + partitioned write)
  * and the retrieval recall@10 vs brute of each seeded index on 50
  * seed-disjoint queries, so the trainer swap's cost AND quality are
  * measured at the same k the kMax cap was sized against.
  *
  * Usage: runMain graft.tools.HierSeedProbe <dir> [perCell=48]
  * (perCell 48 drives the adaptive k to the 4096 cap at a 200 k-vector
  * corpus; the exact profile is deliberately absent — at this k its
  * n·k Lloyd is the measured wall, not a comparison.)
  */
object HierSeedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val perCell = if (args.length > 1) args(1).toInt else 48
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
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).materialized
    val n = emb.count()
    val k = Similarity.adaptiveCellCount(emb, perCell = perCell)
    val q = emb.filter(col("vec_id") >= 5000 && col("vec_id") < 5050)
    val brute = Similarity.topKBrute(emb, q, k = 10)
      .select(col("qid"), col("cid")).materialized
    val nb = brute.count().toDouble
    def seed(tag: String, profile: IndexProfile): String = {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-hseed-$tag").toString
      Similarity.invalidateTrainedCentroids()
      val t0 = System.nanoTime()
      Similarity.ensureIvfIndex(emb, path, nCentroids = k,
        profile = profile)
      val tSeed = (System.nanoTime() - t0) / 1e9
      val hit = brute.join(
        Similarity.topKIvfIndexed(path, q, k = 10, nprobe = 2)
          .select(col("qid"), col("cid"), lit(1).as("h")),
        Seq("qid", "cid"), "left")
        .agg(count(col("h"))).head().getLong(0)
      println(f"HIERSEED dir=$dir n=$n k=$k perCell=$perCell " +
        f"trainer=$tag seed=${tSeed}%.1fs recall=${hit / nb}%.4f")
      path
    }
    val hierPath = seed("hier", IndexProfile.Production(hierTrain = true))
    // the nprobe dial on the hier index: recall and probe wall time per
    // probed fraction (adaptiveNprobe's justification row)
    for (frac <- Seq(0.001, 0.01, 0.05)) {
      val np = Similarity.adaptiveNprobe(k, frac)
      val t0 = System.nanoTime()
      val hit = brute.join(
        Similarity.topKIvfIndexed(hierPath, q, k = 10, nprobe = np)
          .select(col("qid"), col("cid"), lit(1).as("h")),
        Seq("qid", "cid"), "left")
        .agg(count(col("h"))).head().getLong(0)
      val tP = (System.nanoTime() - t0) / 1e9
      println(f"HIERSEED nprobe=$np frac=$frac " +
        f"probeSec=${tP}%.1f recall=${hit / nb}%.4f")
    }
    seed("sampled", IndexProfile.Production())
    spark.stop()
  }
}
