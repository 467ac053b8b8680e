package graft.tools

import org.apache.spark.sql.SparkSession

/** Print [[graft.ext.Dedup.chooseLshBands]]' decision — (bands, the
  * measured r=2 candidates/doc) — for each corpus dir, so SCALE.md's
  * auto-banding row records the measured signal, not just the outcome.
  *
  * Usage: runMain graft.tools.LshAutoProbe <dir> [<dir> ...]
  */
object LshAutoProbe {
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
      val t0 = System.nanoTime()
      val (nh, bands, perDoc) = graft.ext.Dedup.chooseLshBands(docs, 3, 128)
      println(f"LSHAUTO dir=$dir hashes=$nh bands=$bands rows=${nh / bands} " +
        f"r2CandidatesPerDoc=$perDoc%.1f probe=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
