package graft.tools

import org.apache.spark.sql.SparkSession

/** Print [[graft.ext.Dedup.estimateSimhashCollisionsPerDoc]] and the
  * resulting x132 width choice for each given data dir, plus the timed
  * pair build at the chosen width — the measurement feed for SCALE.md's
  * auto-width row (LshAutoProbe's role for the x82/x117 family).
  *
  * Usage: runMain graft.tools.SimhashWidthProbe <dir> [dir...]
  */
object SimhashWidthProbe {
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
      val n = docs.count()
      val t0 = System.nanoTime()
      val est = graft.ext.Dedup.estimateSimhashCollisionsPerDoc(docs)
      val tProbe = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = graft.ext.Dedup.simhashNearDupAuto(docs).count()
      val tBuild = (System.nanoTime() - t1) / 1e9
      val width = if (est > 32) 120 else 60
      println(f"SIMHASHW dir=$dir n=$n est=$est%.2f width=$width " +
        f"tProbe=$tProbe%.2fs tBuild=$tBuild%.2fs pairs=$pairs")
    }
    spark.stop()
  }
}
