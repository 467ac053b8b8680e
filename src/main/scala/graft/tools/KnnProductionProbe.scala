package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end x94 PRODUCTION profile at scale: the kNN edge build with
  * all three measured remedies composed — adaptive cell count
  * (k = n/250), SUBSAMPLED centroid training (50·k rows), and
  * TWO-LEVEL assignment — timed end to end against the declared exact
  * path (full-corpus training + flat argmax), with edge-set recall as
  * the fidelity readout. This is the number SCALE.md's x94
  * second-decade analysis promises: what the pipeline actually costs
  * at 100× once every measured lever is pulled. Fidelity readout is
  * NEIGHBOR QUALITY (mean edge cosine), not edge-identity recall:
  * sampled centroids partition the space differently, and on a
  * synthetic corpus whose candidate neighbors are dense near-ties a
  * boundary shift swaps top-5 members without losing closeness —
  * identity recall punishes the tie-break, mean cosine measures what
  * a pipeline consumes (how close the selected neighbors are). Both
  * numbers are printed.
  *
  * Usage: runMain graft.tools.KnnProductionProbe <dir> [k] [nprobeGroups]
  */
object KnnProductionProbe {
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
    import graft.ext.Similarity
    import graft.engine.Checkpoints.MaterializeOps
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").materialized
    val n = emb.count()
    val k = if (args.length > 1) args(1).toInt
      else Similarity.adaptiveCellCount(emb)
    val p = if (args.length > 2) args(2).toInt else 2
    def time[T](body: => T): (T, Double) = {
      val s = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - s) / 1e9)
    }
    // exact declared path: full-corpus training + flat assignment
    Similarity.invalidateTrainedCentroids()
    val (flatEdges, tFlat) = time {
      val c = Similarity.trainCentroids(emb, k)
      Similarity.knnEdges(Similarity.assignCellsFlatFull(emb, c), 5)
        .materialized
    }
    // production path: sampled training + two-level assignment
    Similarity.invalidateTrainedCentroids()
    val (prodEdges, tProd) = time {
      val c = Similarity.trainCentroidsSampled(emb, k, 50 * k)
      Similarity.knnEdges(
        Similarity.assignCellsCoarse(emb, c, nprobeGroups = p), 5)
        .materialized
    }
    val nFlat = flatEdges.count()
    val shared = flatEdges.select(col("cid"), col("nid"))
      .join(prodEdges.select(col("cid"), col("nid")), Seq("cid", "nid"),
        "left_semi").count()
    def meanCos(e: org.apache.spark.sql.DataFrame): Double =
      e.agg(avg(col("cos"))).head().getDouble(0)
    println(f"KNNPROD dir=$dir n=$n k=$k nprobe=$p " +
      f"flat=${tFlat}%.1fs prod=${tProd}%.1fs " +
      f"meanCosFlat=${meanCos(flatEdges)}%.4f " +
      f"meanCosProd=${meanCos(prodEdges)}%.4f " +
      f"edgeRecall=${shared.toDouble / nFlat}%.4f (flatEdges=$nFlat)")
    spark.stop()
  }
}
