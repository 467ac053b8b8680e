package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the x94-family's documented scale remedy: the cell-local
  * kNN pair mass is Σ|cell|² ≈ n²/k, so scaling the centroid count
  * WITH the corpus (k ∝ n) pins |cell| and makes the stage linear —
  * the demo queries fix k = 8, which is why their 1×/10× exponents
  * read ≈ 1 (SCALE.md). This probe times [[graft.ext.Similarity
  * .knnGraph]] on the same corpus at fixed k = 8 vs scaled k, so the
  * remedy is a measured row, not prose.
  *
  * Usage: runMain graft.tools.KnnCellProbe <corpusDir> <k1> [k2 ...]
  */
object KnnCellProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val ks = args.tail.map(_.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    ks.foreach { k =>
      graft.ext.Similarity.invalidateTrainedCentroids()
      val t0 = System.nanoTime()
      val cents = graft.ext.Similarity.trainCentroids(emb, nCentroids = k)
      val t1 = System.nanoTime()
      val rows = graft.ext.Similarity.knnGraph(emb, cents, k = 5)
        .agg(count(lit(1))).head().getLong(0)
      val t2 = System.nanoTime()
      println(f"KNNCELL dir=$dir n=$n cells=$k%-4d " +
        f"train=${(t1 - t0) / 1e9}%.2fs graph=${(t2 - t1) / 1e9}%.2fs " +
        f"nodes=$rows")
    }
    spark.stop()
  }
}
