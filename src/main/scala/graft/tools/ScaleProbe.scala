package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the data-dependent work bounds behind SCALE.md's measured
  * exponents for a documents corpus: the inverted-index candidate-pair
  * mass Σ_key df² (the quadratic step's true cost) for both the x06
  * hashed-shingle index and the x41 winnowing-fingerprint index, plus
  * the key count and hottest df. A measured time ratio at 10x is "within
  * bound" when it does not exceed this mass's ratio — superlinear TIME
  * on a saturated-vocabulary corpus is expected exactly when this mass
  * is superlinear in n, and the documented hatches (jaccardPairsPrefix,
  * substringOverlapPairs maxDf) are the levers that cut it.
  *
  * Usage: runMain graft.tools.ScaleProbe <dir> [<dir> ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <dir> [<dir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def report(tag: String, keyed: org.apache.spark.sql.DataFrame): Unit = {
        // sumdf2_cap100 = the same mass under a df<=100 hot-key cap —
        // the exact work the maxDf/prefix hatches leave behind, so the
        // hatch's value is (sumdf2 - sumdf2_cap100)/sumdf2 without a
        // separate timed run
        val r = keyed.groupBy(col("k")).agg(count(lit(1)).as("df"))
          .agg(sum(col("df") * col("df")).as("sumdf2"),
            sum(when(col("df") <= 100, col("df") * col("df"))
              .otherwise(lit(0L))).as("sumdf2_cap100"),
            count(lit(1)).as("nkeys"), max(col("df")).as("maxdf"))
          .collect()(0)
        println(s"$tag dir=$dir sumdf2=${r.getLong(0)} " +
          s"cap100=${r.getLong(1)} nkeys=${r.getLong(2)} " +
          s"maxdf=${r.getLong(3)}")
      }
      report("SHINGLE3", graft.ext.Dedup.shingled(docs, 3)
        .select(explode(graft.ext.Dedup.shingleHashes(col("sg"))).as("k")))
      report("WINNOW16x8", docs
        .filter(length(col("text")) >= 16 + 8 - 1)
        .select(explode(array_distinct(
          graft.functions.RollingWinnow.rolling_winnow(col("text"), 16, 8)))
          .as("k")))
      // x123's min-side-prefix containment candidate mass at t=0.9:
      // Σ_key prefdf·df — the exact row count of the prefix(min) ⋈
      // full(index) join before dedup/verify, computed from the two df
      // relations alone (vocabulary-bounded join, no pair expansion),
      // so the melt scale is measurable where the join itself is not
      locally {
        import org.apache.spark.sql.expressions.Window
        val t = 0.9
        val inv = graft.ext.Dedup.shingled(docs, 3)
          .select(col("doc_id"), size(col("sg")).as("sz"),
            explode(col("sg")).as("s"))
          .withColumn("sh", xxhash64(col("s")))
        val freq = inv.groupBy(col("sh")).agg(count(lit(1)).as("f"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("f"), col("sh"), col("s"))
        val prefDf = inv.join(freq, "sh")
          .withColumn("pos", row_number().over(w))
          .filter(col("pos") <= col("sz") - ceil(col("sz") * t) + 1)
          .groupBy(col("sh")).agg(count(lit(1)).as("pdf"))
        val r = prefDf.join(freq, "sh")
          .agg(sum(col("pdf") * col("f")).as("mass"),
            count(lit(1)).as("nkeys"), max(col("pdf")).as("maxpdf"))
          .collect()(0)
        println(s"CONTAIN3@0.9 dir=$dir prefmass=${r.getLong(0)} " +
          s"nprefkeys=${r.getLong(1)} maxprefdf=${r.getLong(2)}")
      }
    }
    spark.stop()
  }
}
