package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for targeted perf work: times labeled actions
  * one at a time in a warm session so a regression can be attributed to
  * a stage instead of a whole declared query. Not part of the declared
  * surface; used under the one-JVM-at-a-time protocol (BASELINE.md).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    val sg = graft.ext.Dedup.shingled(docs, 5)
    t("scan only: sum(length(text))")(
      { docs.agg(sum(length(col("text")))).collect(); 1L })
    t("scan only eval: sum(length(text))")(
      { docs.filter(col("doc_id") < 10)
        .agg(sum(length(col("text")))).collect(); 1L })
    println(sg.filter(col("doc_id") < 10)
      .select(col("doc_id"), explode(col("sg")).as("sh"))
      .queryExecution.executedPlan.toString.take(3000))
    t("shingled.count (warm1)")(sg.count())
    t("shingled.count (warm2)")(sg.count())
    t("train explode count") {
      sg.filter(col("doc_id") >= 10)
        .select(col("doc_id"), explode(col("sg")).as("sh")).count()
    }
    t("eval explode count") {
      sg.filter(col("doc_id") < 10)
        .select(col("doc_id"), explode(col("sg")).as("sh")).count()
    }
    t("x23 exact full") {
      graft.ext.Contamination.exact(docs, col("doc_id") < 10).count()
    }
    t("x23 exact full (again)") {
      graft.ext.Contamination.exact(docs, col("doc_id") < 10).count()
    }
    t("x29 bloom full") {
      graft.ext.Contamination.bloomPrefiltered(docs, col("doc_id") < 10).count()
    }
    spark.stop()
  }
}
