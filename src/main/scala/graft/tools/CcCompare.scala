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
  * Usage: runMain graft.tools.CcCompare <corpusDir> [index|lsh]
  *
  * Pair source `lsh` swaps the exact inverted index for
  * `jaccardPairsLshAuto` — the 100× corpus's saturated shingle space
  * makes the exact index's Σdf² candidate mass unaffordable there
  * (the x06 SCALE row), while the auto-banded path stays tractable
  * and the verified pair OUTPUT is near-identical (background j ≥ 0.5
  * density ≈ 0 on this corpus), so the CC fixpoint still runs over
  * the true graph.
  */
object CcCompare {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val pairSource = if (args.length > 1) args(1) else "index"
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
    val rawDocs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = (pairSource match {
      case "index" => graft.ext.Dedup
        .jaccardPairsIndexHashed(rawDocs, n = 3, threshold = 0.5)
      case "lsh" => graft.ext.Dedup
        .jaccardPairsLshAuto(rawDocs, n = 3, threshold = 0.5)
      case other => throw new IllegalArgumentException(
        s"pair source must be index|lsh, got '$other'")
    }).select(col("da"), col("db")).materialized
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
    println(f"CCCMP dir=$dir src=$pairSource pairs=$nPairs " +
      f"minlabel=${tMl}%.2fs/${mlRounds}r " +
      f"alternating=${tAlt}%.2fs/${altRounds}r labelDiff=$diff")
    spark.stop()
  }
}
