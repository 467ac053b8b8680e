package graft.tools

import org.apache.spark.sql.SparkSession

/** Print every auto-switch family's measured decision signal — the
  * sampled candidates/doc estimate and the branch it fires — per corpus
  * dir, so SCALE.md's decision-boundary rows record the signal, not
  * just the outcome (a corpus-shape drift that flips a decision is then
  * visible round over round):
  *
  *   - x132 simhashNearDupAuto: estimateSimhashCollisionsPerDoc → 60
  *     vs 120 bits
  *   - x133 substringOverlapAuto: estimateWinnowCollisionsPerDoc →
  *     uncapped vs df ≤ 100
  *   - x141 containmentAuto: estimateContainmentCandidatesPerDoc →
  *     exact shingle join vs CDC chunk detector
  *
  * All three share the 32-candidates/doc family cutoff.
  *
  * Usage: runMain graft.tools.AutoSwitchProbe <dir> [<dir> ...]
  */
object AutoSwitchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val (sh, ts) =
        timed(graft.ext.Dedup.estimateSimhashCollisionsPerDoc(docs, 3))
      println(f"AUTOSWITCH x132 dir=$dir candPerDoc=$sh%.2f " +
        f"branch=${if (sh > 32) "120-bit" else "60-bit"} probe=$ts%.2fs")
      val (wn, tw) =
        timed(graft.ext.Dedup.estimateWinnowCollisionsPerDoc(docs, 16, 8))
      println(f"AUTOSWITCH x133 dir=$dir candPerDoc=$wn%.2f " +
        f"branch=${if (wn > 32) "capped-df100" else "uncapped"} probe=$tw%.2fs")
      val (ct, tc) =
        timed(graft.ext.Dedup.estimateContainmentCandidatesPerDoc(docs, 3, 0.9))
      println(f"AUTOSWITCH x141 dir=$dir candPerDoc=$ct%.2f " +
        f"branch=${if (ct > 32) "cdc" else "exact"} probe=$tc%.2fs")
    }
    spark.stop()
  }
}
