package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure the subsampled-training lever
  * ([[graft.ext.Similarity.trainCentroidsSampled]]) against full-corpus
  * Lloyd at production k: wall time for each training run and the
  * quantization quality (mean best assigned cosine over the FULL
  * corpus) of both centroid sets — so SCALE.md's "training is the
  * elephant" row carries its measured remedy.
  *
  * Usage: runMain graft.tools.TrainSampleProbe <dir> <k> <sampleRows> [nofull]
  * (`nofull` skips the full-corpus Lloyd leg — at k past ~10^3 that leg
  * is the measured wall itself, and the k-ceiling curve only needs the
  * sampled term.)
  */
object TrainSampleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val sampleRows = args(2).toInt
    val noFull = args.length > 3 &&
      (args(3) == "nofull" || args(3) == "hieronly")
    val hierOnly = args.length > 3 && args(3) == "hieronly"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Similarity
    import graft.engine.Checkpoints.MaterializeOps
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").materialized
    val n = emb.count()
    def time[T](body: => T): (T, Double) = {
      val s = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - s) / 1e9)
    }
    val (full, tFull) =
      if (noFull) (null, -1.0)
      else {
        Similarity.invalidateTrainedCentroids()
        time { val c = Similarity.trainCentroids(emb, k); c.count(); c }
      }
    val (sampled, tSampled) =
      if (hierOnly) (null, -1.0)
      else {
        Similarity.invalidateTrainedCentroids()
        time {
          val c = Similarity.trainCentroidsSampled(emb, k, sampleRows)
          c.count(); c
        }
      }
    Similarity.invalidateTrainedCentroids()
    val (hier, tHier) = time {
      val c = Similarity.trainCentroidsHier(emb, k, sampleRows)
      c.count(); c
    }
    val qFull = if (noFull) -1.0 else Similarity.meanAssignedCosine(emb, full)
    val qSampled =
      if (hierOnly) -1.0 else Similarity.meanAssignedCosine(emb, sampled)
    val qHier = Similarity.meanAssignedCosine(emb, hier)
    println(f"TRAINSAMPLE dir=$dir n=$n k=$k sample=$sampleRows " +
      f"full=${tFull}%.1fs sampled=${tSampled}%.1fs hier=${tHier}%.1fs " +
      f"qFull=$qFull%.4f qSampled=$qSampled%.4f qHier=$qHier%.4f")
    spark.stop()
  }
}
