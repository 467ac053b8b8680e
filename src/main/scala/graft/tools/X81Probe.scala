package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.engine.Checkpoints.MaterializeOps
import graft.ext.TextAnalysis.tokens

/** Dev-only A/B probe for x81's execution shape on the saturated
  * corpus (dev tool, not part of the declared surface): times the
  * declared [[graft.ext.Dedup.tfidfCosinePairs]] against alternative
  * verify shapes and checks row-count agreement. Usage:
  * runMain graft.tools.X81Probe <sfDir> <variant...>
  */
object X81Probe {

  /** Shared front half: per-doc tf-idf weights + norms. */
  private def weights(docs: DataFrame): (DataFrame, DataFrame) = {
    val tf = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("df"),
        round(col("tf") *
          round(log(col("n_docs").cast(DoubleType) / col("df")), 6), 6)
          .as("w"))
      .filter(col("w") > 0)
      .materialized
    val nrm = w.groupBy(col("doc_id"))
      .agg(round(sqrt(
        sum(round(col("w") * col("w"), 6).cast(DecimalType(38, 12)))
          .cast(DoubleType)), 6).as("nrm"))
      .materialized
    (w, nrm)
  }

  private def finish(pairs: DataFrame, nrm: DataFrame,
      threshold: Double): DataFrame =
    pairs
      .join(nrm.select(col("doc_id").as("da"), col("nrm").as("na")), Seq("da"))
      .join(nrm.select(col("doc_id").as("db"), col("nrm").as("nb")), Seq("db"))
      .select(col("da"), col("db"),
        least(lit(1.0),
          round(col("dot") / round(col("na") * col("nb"), 6), 6)).as("cos"))
      .filter(col("cos") >= threshold)

  /** r9 shape: full x full term join, direct (da,db) aggregation. */
  def fullJoin(docs: DataFrame, threshold: Double): DataFrame = {
    val (w, nrm) = weights(docs)
    val a = w.select(col("doc_id").as("da"), col("term"), col("w").as("wa"))
    val b = w.select(col("doc_id").as("db"), col("term"), col("w").as("wb"))
    val dot = a.join(b, Seq("term")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(sum(round(col("wa") * col("wb"), 6).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("dot"))
    finish(dot, nrm, threshold)
  }

  /** Prefix candidates + map-lookup HOF verify over collected doc
    * vectors (no join-back explosion). */
  def docvec(docs: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (w, nrm) = weights(docs)
    val teff = math.max(0.0, threshold - 1e-3)
    val ord = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("term"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = w.join(nrm, "doc_id")
      .withColumn("wn2", (col("w") / col("nrm")) * (col("w") / col("nrm")))
      .withColumn("cumBefore", coalesce(sum(col("wn2")).over(ord), lit(0.0)))
      .filter(col("cumBefore") < lit(1.0 - teff * teff))
      .select(col("term"), col("doc_id"))
    val candidates = w.select(col("term"), col("doc_id").as("pa"))
      .join(prefix.select(col("term"), col("doc_id").as("pb")), Seq("term"))
      .filter(col("pa") =!= col("pb"))
      .select(least(col("pa"), col("pb")).as("da"),
        greatest(col("pa"), col("pb")).as("db"))
      .distinct()
    val vec = w.groupBy(col("doc_id"))
      .agg(map_from_entries(sort_array(
        collect_list(struct(col("term"), col("w"))))).as("tw"))
      .materialized
    val zero = lit(BigDecimal(0).bigDecimal).cast(DecimalType(38, 12))
    val dot = candidates
      .join(vec.select(col("doc_id").as("da"), col("tw").as("ta")), Seq("da"))
      .join(vec.select(col("doc_id").as("db"), col("tw").as("tb")), Seq("db"))
      .select(col("da"), col("db"),
        aggregate(map_entries(col("ta")), zero,
          (acc: Column, e: Column) =>
            (acc + coalesce(
              round(e.getField("value") * element_at(col("tb"),
                e.getField("key")), 6).cast(DecimalType(38, 12)), zero))
              .cast(DecimalType(38, 12)))
          .cast(DoubleType).as("dot"))
      .filter(col("dot") > 0)
    finish(dot, nrm, threshold)
  }

  /** Stage-timing of the declared shape: candidates, then verify. */
  def stages(docs: DataFrame, threshold: Double): Unit = {
    import org.apache.spark.sql.expressions.Window
    val (w, nrm) = weights(docs)
    val teff = math.max(0.0, threshold - 1e-3)
    val ord = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("term"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = w.join(nrm, "doc_id")
      .withColumn("wn2", (col("w") / col("nrm")) * (col("w") / col("nrm")))
      .withColumn("cumBefore", coalesce(sum(col("wn2")).over(ord), lit(0.0)))
      .filter(col("cumBefore") < lit(1.0 - teff * teff))
      .select(col("term"), col("doc_id"))
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-12s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val pw = t("w build")(w.count())
    println(s"    w rows: $pw")
    val candidates = w.select(col("term"), col("doc_id").as("pa"))
      .join(prefix.select(col("term"), col("doc_id").as("pb")), Seq("term"))
      .filter(col("pa") =!= col("pb"))
      .select(least(col("pa"), col("pb")).as("da"),
        greatest(col("pa"), col("pb")).as("db"))
      .distinct()
    val cand = t("candidates")(candidates.materialized)
    println(s"    cand rows: ${t("cand count")(cand.count())}")
    val dot = cand
      .join(w.select(col("doc_id").as("da"), col("term"),
        col("w").as("wa")), Seq("da"))
      .join(w.select(col("doc_id").as("db"), col("term"),
        col("w").as("wb")), Seq("db", "term"))
      .groupBy(col("da"), col("db"))
      .agg(sum(round(col("wa") * col("wb"), 6).cast(DecimalType(38, 12)))
        .cast(DoubleType).as("dot"))
    val out = finish(dot, nrm, threshold)
    println(s"    out rows: ${t("verify+fin")(out.count())}")
    out.explain("formatted")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variants =
      if (args.length > 1) args.drop(1).toSet else Set("cur", "full", "vec")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-6s rows=$n%-9d ${s}%.1f s")
    }
    if (variants("cur"))
      time("cur")(graft.ext.Dedup.tfidfCosinePairs(docs, 0.8))
    if (variants("full")) time("full")(fullJoin(docs, 0.8))
    if (variants("vec")) time("vec")(docvec(docs, 0.8))
    if (variants("stage")) stages(docs, 0.8)
    spark.stop()
  }
}
