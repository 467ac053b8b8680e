package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure the x81 maxDf hatch on a saturation-adversarial corpus:
  * time + output count of `tfidfCosinePairs` at the declared
  * parametrization vs with the x41-style df cap, so SCALE.md's x81 row
  * carries a measured remedy beside the lossless prefix filter. The
  * cap is an APPROXIMATION (capped terms leave weights and norms), so
  * the probe also reports how many of the uncapped pairs survive.
  *
  * Usage: runMain graft.tools.X81CapProbe <corpusDir> [maxDf]
  */
object X81CapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cap = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def run(maxDf: Option[Int]): (Long, Set[(Long, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = graft.ext.Dedup
        .tfidfCosinePairs(docs, threshold = 0.8, n = 3, maxDf = maxDf)
        .select("da", "db").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (rows.size.toLong, rows, (System.nanoTime() - t0) / 1e9)
    }
    val (nFull, full, tFull) = run(None)
    val (nCap, capped, tCap) = run(Some(cap))
    val kept = full.intersect(capped).size
    println(f"X81CAP dir=$dir uncapped=${tFull}%.2fs/$nFull pairs " +
      f"maxDf=$cap=${tCap}%.2fs/$nCap pairs " +
      f"keptOfUncapped=$kept/${nFull}")
    spark.stop()
  }
}
