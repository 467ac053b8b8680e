package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure the x07 banding lever on a saturation-adversarial corpus:
  * with a FIXED vocabulary the background Jaccard j₀ of two random
  * docs is constant in n (natural corpora: j₀ → 0 as the vocabulary
  * grows), so the false-candidate mass of (b bands × r rows) banding
  * grows ~ C(n,2)·b·j₀^r — r is the knob that kills it
  * (miss probability at the j = 0.5 threshold: (1−0.5^r)^b).
  * This probe times `jaccardPairsLsh` at r = 2 (the recall-maximal
  * default) vs r = 4 on the same corpus and reports verified-output
  * counts, so SCALE.md's x07 100× row carries its measured remedy.
  *
  * Usage: runMain graft.tools.LshRowsProbe <corpusDir> <bands1> [bands2 ...]
  *        (numHashes fixed at 128; rows = 128/bands)
  */
object LshRowsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val bandCounts = args.tail.map(_.toInt).toSeq
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
    bandCounts.foreach { b =>
      val t0 = System.nanoTime()
      val n = graft.ext.Dedup
        .jaccardPairsLsh(docs, n = 3, threshold = 0.5,
          numHashes = 128, bands = b)
        .count()
      println(f"LSHROWS dir=$dir bands=$b rows=${128 / b} " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.2fs verifiedPairs=$n")
    }
    spark.stop()
  }
}
