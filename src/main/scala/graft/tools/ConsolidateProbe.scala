package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The landed-corpus consolidation measured over a LONG stream — the
  * cost it bounds is per-batch METADATA, not data: every maintenance
  * step's stamp fingerprints the flat read over all landed dirs
  * (listStatus + per-file entries), so without consolidation the
  * per-batch cost grows linearly in batch COUNT (O(batches²)
  * cumulative) even when the data itself is tiny. This probe drives
  * the REAL `ivfIndexBatch` face over `nBatches` small batches twice —
  * consolidation off (budget = MaxValue) vs on (budget = 16) — and
  * prints the early/late per-batch wall averages, final landed dir and
  * file counts, and total wall for each regime.
  *
  * Usage: runMain graft.tools.ConsolidateProbe <dir> [nBatches=150]
  *   [batchSize=200]
  */
object ConsolidateProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 150
    val batchSz = if (args.length > 2) args(2).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Checkpoints.MaterializeOps
    import graft.streaming.Streams
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).materialized
    def run(tag: String, budget: Int): Unit = {
      val corpusDir = java.nio.file.Files
        .createTempDirectory(s"graft-consp-c-$tag").toString
      val indexPath = java.nio.file.Files
        .createTempDirectory(s"graft-consp-i-$tag").toString
      var prev: Option[Vector[String]] = None
      val perBatch = new Array[Double](nBatches)
      val t0 = System.nanoTime()
      for (b <- 0 until nBatches) {
        val d = s"$corpusDir/b$b"
        emb.filter(col("vec_id") >= b.toLong * batchSz &&
            col("vec_id") < (b + 1).toLong * batchSz)
          .write.mode("overwrite").parquet(d)
        val tb = System.nanoTime()
        prev = Some(Streams.ivfIndexBatch(spark, corpusDir, d, prev,
          indexPath, nCentroids = 8, maxLandedDirs = budget))
        perBatch(b) = (System.nanoTime() - tb) / 1e9
      }
      val total = (System.nanoTime() - t0) / 1e9
      def avg(lo: Int, hi: Int): Double =
        perBatch.slice(lo, hi).sum / (hi - lo)
      val dirs = prev.get.size
      val files = prev.get.map(p =>
        Option(new java.io.File(new java.net.URI(p)).listFiles())
          .fold(0)(_.count(_.getName.endsWith(".parquet")))).sum
      println(f"CONSPROBE tag=$tag budget=$budget batches=$nBatches " +
        f"batchSz=$batchSz early=${avg(5, 30)}%.2fs " +
        f"late=${avg(nBatches - 25, nBatches)}%.2fs " +
        f"total=${total}%.0fs dirs=$dirs files=$files")
    }
    run("nocons", Int.MaxValue)
    run("cons", 16)
    spark.stop()
  }
}
