package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time the two connected-components shapes on a REAL near-dup pair
  * graph — min-label propagation ([[graft.ext.Dedup.dedupClusters]],
  * the x17 path) vs alternating large-star/small-star
  * ([[graft.ext.Dedup.dedupClustersAlternating]], SoCC'14) — and
  * verify their labels are identical, to back SCALE.md's CC row with
  * measured rounds, not an asserted preference. Run on the 1×/10×
  * GenCorpus probe corpora; the pair graph is x06's
  * (`jaccardPairsIndex`), materialized ONCE outside both timed regions
  * so the numbers isolate the CC fixpoint itself.
  *
  * Usage: runMain graft.tools.CcCompare <corpusDir>
  */
object CcCompare {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Checkpoints.MaterializeOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).materialized
    val pairs = graft.ext.Dedup
      .jaccardPairsIndexHashed(spark.read.parquet(s"$dir/documents.parquet"),
        n = 3, threshold = 0.5)
      .select(col("da"), col("db")).materialized
    val nPairs = pairs.count()
    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val mirrored = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db"), col("da")))
    val ((mlLabels, mlRounds), tMl) =
      time(graft.ext.Dedup.ccMinLabelLoop(mirrored.materialized, 50))
    val ((altLabels, altRounds), tAlt) =
      time(graft.ext.Dedup.ccAlternatingLoop(pairs, 30))
    val diff = mlLabels.join(altLabels.withColumnRenamed("cluster", "c2"),
      Seq("doc_id"), "full")
      .filter(not(col("cluster") <=> col("c2"))).count()
    println(f"CCCMP dir=$dir pairs=$nPairs " +
      f"minlabel=${tMl}%.2fs/${mlRounds}r " +
      f"alternating=${tAlt}%.2fs/${altRounds}r labelDiff=$diff")
    spark.stop()
  }
}
