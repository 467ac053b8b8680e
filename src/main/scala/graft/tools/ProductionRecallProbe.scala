package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure what the Production profile COSTS in retrieval — recall@10
  * vs brute ground truth of an adaptive-k IVF index probed at nprobe=2,
  * for the Exact profile and Production at nprobeGroups = 1, 2, 3 —
  * plus each variant's build wall time. The x147 audit's decision data:
  * the two-level coarse assignment trades n·k for ~2·n·√k by searching
  * only the best `nprobeGroups` coarse groups per vector, and THIS
  * probe is where that trade's recall price is measured rather than
  * assumed (quantization cosine — TrainSampleProbe — barely moves while
  * recall can; two different statistics).
  *
  * Usage: runMain graft.tools.ProductionRecallProbe <dir> [nQueries] [qLo]
  * (qLo > 0 decouples the query set from the exact profile's first-k
  * seeds — vec_id < k are the exact Lloyd INITIAL centroids, so
  * querying them flatters the exact index.)
  */
object ProductionRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nq = if (args.length > 1) args(1).toInt else 10
    val qLo = if (args.length > 2) args(2).toInt else 0
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
    val k = Similarity.adaptiveCellCount(emb)
    val q = emb.filter(col("vec_id") >= qLo && col("vec_id") < qLo + nq)
    val brute = Similarity.topKBrute(emb, q, k = 10)
      .select(col("qid"), col("cid")).materialized
    val nb = brute.count().toDouble
    def recallOf(tag: String, profile: IndexProfile): Unit = {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-prp-$tag").toString
      Similarity.invalidateTrainedCentroids()
      val t0 = System.nanoTime()
      Similarity.ensureIvfIndex(emb, path, nCentroids = k,
        profile = profile)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val hit = brute.join(
        Similarity.topKIvfIndexed(path, q, k = 10, nprobe = 2)
          .select(col("qid"), col("cid"), lit(1).as("h")),
        Seq("qid", "cid"), "left")
        .agg(count(col("h"))).head().getLong(0)
      println(f"PRODRECALL dir=$dir n=$n k=$k qLo=$qLo variant=$tag " +
        f"build=${tBuild}%.1fs recall=${hit / nb}%.4f")
    }
    recallOf("exact", IndexProfile.Exact)
    recallOf("prod-g1", IndexProfile.Production())
    recallOf("prod-g2", IndexProfile.Production(nprobeGroups = 2))
    recallOf("prod-g3", IndexProfile.Production(nprobeGroups = 3))
    spark.stop()
  }
}
