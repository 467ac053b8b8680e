package graft.tools

import org.apache.spark.sql.SparkSession

/** Time the two Lloyd-assignment plan shapes (literal-centroid codegen vs
  * broadcast join, [[graft.ext.Similarity.trainCentroids]]) across
  * centroid counts on a real embeddings table, to back SCALE.md's
  * crossover row with measured numbers. The centroid session cache is
  * invalidated before every run so each timing is a full training pass.
  *
  * Usage: runMain graft.tools.IvfCrossover <dir> [k ...]
  */
object IvfCrossover {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val ks = if (args.length > 1) args.tail.map(_.toInt).toSeq
             else Seq(8, 64, 128, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count() // warm file listing / JIT outside the timed region
    def time(body: => Unit): Double = {
      graft.ext.Similarity.invalidateTrainedCentroids()
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    ks.foreach { k =>
      // join path first: identical work at every k, stable reference
      spark.conf.set(graft.ext.Similarity.LiteralKMaxKey, "0")
      val tJoin = time {
        graft.ext.Similarity.trainCentroids(emb, k, iters = 3).count()
      }
      spark.conf.set(graft.ext.Similarity.LiteralKMaxKey, k.toString)
      val tLit = time {
        graft.ext.Similarity.trainCentroids(emb, k, iters = 3).count()
      }
      println(f"IVFK k=$k%-4d literal=$tLit%8.2fs join=$tJoin%8.2fs")
      spark.conf.unset(graft.ext.Similarity.LiteralKMaxKey)
    }
    spark.stop()
  }
}
