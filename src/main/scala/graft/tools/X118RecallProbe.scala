package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall evidence for the x118 production banding (r = 4, 256 hashes /
  * 64 bands, threshold 0.7) on a probe corpus: exact inverted-index
  * pairs at j ≥ 0.7 vs the banded-and-verified output, with the count
  * of pairs the banding missed. The analytic bound at j = 0.7 is
  * (1 − 0.7⁴)⁶⁴ ≈ 2·10⁻⁸ per pair; this prints the measured number so
  * SCALE.md's row is evidence, not arithmetic.
  *
  * Usage: runMain graft.tools.X118RecallProbe <corpusDir>
  */
object X118RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Checkpoints.MaterializeOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val exact = graft.ext.Dedup
      .jaccardPairsIndexHashed(docs, n = 3, threshold = 0.7)
      .select(col("da"), col("db")).materialized
    val nExact = exact.count()
    val t1 = System.nanoTime()
    val banded = graft.ext.Dedup
      .jaccardPairsLsh(docs, n = 3, threshold = 0.7,
        numHashes = 256, bands = 64)
      .select(col("da"), col("db")).materialized
    val nBanded = banded.count()
    val t2 = System.nanoTime()
    val missed = exact.join(banded, Seq("da", "db"), "left_anti").count()
    println(f"X118RECALL dir=$dir exact=$nExact (${(t1 - t0) / 1e9}%.1fs) " +
      f"banded=$nBanded (${(t2 - t1) / 1e9}%.1fs) missed=$missed " +
      f"recall=${if (nExact == 0) 1.0 else (nExact - missed).toDouble / nExact}%.4f")
    spark.stop()
  }
}
