package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The IVF model-refresh policy measured AT SCALE on a drifting stream
  * — round-16 verdict #3. x153's drift signal (`ivfCellLoadStats`) and
  * the `spark.graft.ivf.refreshImbalance` policy arm are spec-pinned on
  * toy pile batches only; this probe runs the real maintenance loop
  * (`Streams.ivfIndexBatch`, the streaming face's per-trigger step)
  * over the 100× corpus with a genuinely drifting distribution:
  *
  *  - SEED on the vectors of labels 0–4 only (~100 k rows, half the
  *    label space) — the model knows five clusters;
  *  - STREAM the label 5–9 vectors (~100 k rows) in `nBatches` equal
  *    batches — every new vector lands in some nearest OLD cell, so
  *    cell loads skew monotonically (the frozen-model failure mode);
  *  - per batch, record the maintenance-step wall time, the
  *    post-step imbalance (max/mean cell load), and whether the step
  *    retrained (the stamp's model term moves);
  *  - at the end, recall@10 vs brute over the full landed union for
  *    50 DRIFTED-label queries and 50 BASE-label queries at the
  *    default adaptive nprobe.
  *
  * Arms: `frozen` (no conf — ride the seed model forever) vs
  * `policy:<thr>` (retrain over the landed union when imbalance
  * breaches `<thr>`). Run each arm as its own process so JIT warmth
  * can't favor the second:
  *
  *   tools/run.sh graft.tools.RefreshPolicyProbe target/scale/x100 frozen
  *   tools/run.sh graft.tools.RefreshPolicyProbe target/scale/x100 policy:3.0
  */
object RefreshPolicyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val arm = if (args.length > 1) args(1) else "frozen"
    val nBatches = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Checkpoints.MaterializeOps
    import graft.ext.Similarity
    // SYNC retrain: this probe measures the per-step cost/recall curve
    // that set the threshold default, so the retrain must land inside
    // the step it triggers in (the r18 async default would defer it to
    // the next step and blur which batch paid); SteadyStateProbe is
    // the async route's measurement
    spark.conf.set(graft.streaming.Streams.RefreshAsyncKey, "false")
    arm match {
      // the policy is default-on since round 17, so the frozen control
      // arm pins it off explicitly
      case "frozen" =>
        spark.conf.set(Similarity.RefreshImbalanceKey, "off")
      case p if p.startsWith("policy:") =>
        spark.conf.set(Similarity.RefreshImbalanceKey, p.drop(7))
      case other => sys.error(s"arm must be frozen|policy:<thr>: $other")
    }
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))
      .materialized
    val base = all.filter(col("label") < 5)
      .select(col("vec_id"), col("embedding")).materialized
    val drifted = all.filter(col("label") >= 5)
      .select(col("vec_id"), col("embedding"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))))
      .materialized
    val nDrift = drifted.count()
    val sliceSize = (nDrift / nBatches).toInt
    val k = Similarity.adaptiveCellCount(base)
    println(s"RFRSH dir=$dir arm=$arm base=${base.count()} " +
      s"drift=$nDrift batches=$nBatches k=$k")
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-refresh-c").toString
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-refresh-i").toString
    def modelTerm(): String = graft.engine.AtRest
      .readStamp(spark, indexPath, "_graft_ivf_meta")
      .map(_.split("\\|model=").last).getOrElse("<none>")
    def step(newDir: String, prev: Option[Vector[String]], tag: String)
        : Vector[String] = {
      val before = modelTerm()
      val t0 = System.nanoTime()
      val dirs = graft.streaming.Streams.ivfIndexBatch(spark, corpusDir,
        newDir, prev, indexPath, nCentroids = k)
      val sec = (System.nanoTime() - t0) / 1e9
      val imb = Similarity.ivfCellLoadStats(spark, indexPath)
        .select(col("imbalance"), col("n_cells")).head()
      val retrained = modelTerm() != before && before != "<none>"
      println(f"RFRSH $tag%-8s ${sec}%7.1fs imbalance=${imb.getDouble(0)}%.3f " +
        f"cells=${imb.getInt(1)} retrained=$retrained")
      dirs
    }
    // b0 = the base half: the seed
    base.write.mode("overwrite").parquet(s"$corpusDir/b0")
    var prev: Option[Vector[String]] =
      Some(step(s"$corpusDir/b0", None, "seed"))
    // the drifting tail, one slice per maintenance trigger; the LAST
    // slice extends to nDrift so integer-division remainder vectors
    // still land — the recall truth set (brute over `all`) includes
    // them, and silently dropping up to nBatches-1 vectors deflated
    // both arms' reported recall
    (1 to nBatches).foreach { i =>
      val hi = if (i == nBatches) nDrift else i.toLong * sliceSize
      val s = drifted
        .filter(col("rn") > (i - 1).toLong * sliceSize &&
          col("rn") <= hi)
        .select(col("vec_id"), col("embedding"))
      s.write.mode("overwrite").parquet(s"$corpusDir/b$i")
      prev = Some(step(s"$corpusDir/b$i", prev, s"batch$i"))
    }
    // recall at the default adaptive nprobe, drifted vs base queries
    val union = all.select(col("vec_id"), col("embedding")).materialized
    def recall(tag: String, qs: org.apache.spark.sql.DataFrame): Unit = {
      val q = qs.materialized
      val brute = Similarity.topKBrute(union, q, k = 10)
        .select(col("qid"), col("cid")).materialized
      val nTruth = brute.count().toDouble
      val hit = brute.join(
        Similarity.topKIvfIndexed(indexPath, q, k = 10)
          .select(col("qid"), col("cid"), lit(1).as("h")),
        Seq("qid", "cid"), "left")
        .agg(count(col("h"))).head().getLong(0)
      println(f"RFRSH recall@10 $tag = ${hit / nTruth}%.4f")
    }
    recall("drifted", all.filter(col("label") >= 5)
      .orderBy(col("vec_id").desc).limit(50)
      .select(col("vec_id"), col("embedding")))
    recall("base", all.filter(col("label") < 5)
      .orderBy(col("vec_id")).limit(50)
      .select(col("vec_id"), col("embedding")))
    spark.stop()
  }
}
