package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the two-level assignment lever
  * ([[graft.ext.Similarity.assignCellsCoarse]]) against the flat
  * argmax on the same corpus and trained centroids: wall time for each
  * assignment and the cell-agreement fraction (how often the coarse
  * route lands on the true best centroid). This is the n·k → 2·n·√k
  * remedy named in SCALE.md's x94/x39 second-decade analysis — run at
  * the 100× corpus (k = 800) where the flat term dominates.
  *
  * Usage: runMain graft.tools.HierAssignProbe <dir> <k> [nprobeGroups]
  */
object HierAssignProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = args(1).toInt
    val p = if (args.length > 2) args(2).toInt else 1
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
    val t0 = System.nanoTime()
    val cents = Similarity.trainCentroids(emb, k)
    val tTrain = (System.nanoTime() - t0) / 1e9
    def time(body: => org.apache.spark.sql.DataFrame): (org.apache.spark.sql.DataFrame, Double) = {
      val s = System.nanoTime()
      val df = body.materialized
      (df, (System.nanoTime() - s) / 1e9)
    }
    val (flat, tFlat) = time(Similarity.assignCellsFlat(emb, cents))
    val (hier, tHier) = time(
      Similarity.assignCellsCoarse(emb, cents, nprobeGroups = p)
        .select(col("cid").as("vec_id"), col("cell")))
    val agree = flat.join(hier.withColumnRenamed("cell", "hcell"),
      Seq("vec_id"))
      .agg(avg(when(col("cell") === col("hcell"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    println(f"HIERASSIGN dir=$dir n=$n k=$k nprobeGroups=$p " +
      f"train=${tTrain}%.1fs flat=${tFlat}%.1fs hier=${tHier}%.1fs " +
      f"agreement=${agree}%.4f")
    spark.stop()
  }
}
