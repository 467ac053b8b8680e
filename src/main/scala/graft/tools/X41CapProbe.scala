package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time x41's documented hot-fingerprint hatch
  * (`substringOverlapPairs(maxDf = …)`) where the uncapped run is
  * mass-unaffordable: at the 100× corpus the winnow-fingerprint
  * Σdf² bound is 23.7·10⁹ (ScaleProbe — 98× the 10× mass whose
  * uncapped run already cost 59.3 s), while the df ≤ 100 cap leaves
  * 3.6·10⁸ (1.5%). This prints measured time + surviving pair count
  * for the capped plan, and optionally the uncapped one where it is
  * affordable, so SCALE.md's x41 row carries a measured hatch instead
  * of an extrapolation.
  *
  * Usage: runMain graft.tools.X41CapProbe <dir> <maxDf|0=uncapped> [...]
  */
object X41CapProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val caps = args.tail.map(_.toLong).toSeq
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
    caps.foreach { c =>
      val cap = if (c == 0) None else Some(c)
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup
        .substringOverlapPairs(docs, k = 16, w = 8, minShared = 10,
          maxDf = cap)
        .count()
      println(f"X41CAP dir=$dir maxDf=${cap.getOrElse(0L)} " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1fs pairs=$n")
    }
    spark.stop()
  }
}
