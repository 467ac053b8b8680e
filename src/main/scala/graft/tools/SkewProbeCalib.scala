package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-discipline calibration on a SKEWED corpus at the kMax cap —
  * round-18 verdict #3 (+ stretch #7's fraction sweep). Round 17
  * measured the count-fraction probe ([[graft.ext.Similarity
  * .adaptiveNprobe]], 5% of CELLS) at recall@10 0.912 on the Zipf
  * corpus vs 0.986 iid: under head-mass skew a fixed cell count
  * covers a query-dependent row fraction, so the same dial buys less
  * where the data is worst. This probe sweeps BOTH disciplines —
  * count-fraction and the round-18 MASS-fraction prefix
  * ([[graft.ext.Similarity.topKIvfIndexedMass]]: probe cells in
  * descending query proximity until `frac` of the landed ROW MASS is
  * covered) — over frac ∈ {2%, 5%, 10%, 15%} on the same at-rest
  * index, recording recall@10 vs brute and the actual scanned-row
  * budget per query ([[graft.ext.Similarity.probedCellStats]], which
  * shares the probe-set builders with the topK routes). The paired
  * columns are the data the production `probeFrac` target should come
  * from: the principled claim is mass-5% ≥ 0.95 recall at a scanned
  * budget ≤ count-5%'s.
  *
  * Same corpus/index methodology as [[CapLifecycleProbe]] (seed on
  * vec_id < 190 000, perCell 23 → k pins at the 8192 cap, Production
  * profile → hier trainer via the auto-switch).
  *
  * Usage: tools/run.sh graft.tools.SkewProbeCalib target/scale/x100skew
  *   [perCell=23] [kMax=8192]
  */
object SkewProbeCalib {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val perCell = if (args.length > 1) args(1).toInt else 23
    val kMax = if (args.length > 2) args(2).toInt else 8192
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.engine.Checkpoints.MaterializeOps
    import graft.ext.{IndexProfile, Similarity}
    spark.conf.set(Similarity.KMaxKey, kMax.toString)
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 190000L).materialized
    val n = base.count()
    val k = Similarity.adaptiveCellCount(base, perCell = perCell)
    println(s"SKEWPC dir=$dir n=$n k=$k kMax=$kMax")
    def timed[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SKEWPC $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val path = java.nio.file.Files
      .createTempDirectory("graft-skewpc").toString
    timed("seed") {
      Similarity.ensureIvfIndex(base, path, nCentroids = k,
        profile = IndexProfile.Production())
    }
    // CapLifecycleProbe's query set: 50 ids well inside the seed
    val q = base.filter(col("vec_id") >= 50000L && col("vec_id") < 50050L)
      .materialized
    val brute = timed("brute") {
      Similarity.topKBrute(base, q, k = 10)
        .select(col("qid"), col("cid")).materialized
    }
    val nb = brute.count().toDouble
    def arm(tag: String, probe: => org.apache.spark.sql.DataFrame,
        stats: => org.apache.spark.sql.DataFrame): Unit = {
      val hit = timed(s"probe:$tag") {
        brute.join(probe.select(col("qid"), col("cid"), lit(1).as("h")),
          Seq("qid", "cid"), "left")
          .agg(count(col("h"))).head().getLong(0)
      }
      val st = stats.agg(
        avg(col("n_probed_cells")), avg(col("scanned_rows")),
        max(col("scanned_rows"))).head()
      println(f"SKEWPC recall@10 $tag = ${hit / nb}%.4f " +
        f"cells=${st.getDouble(0)}%.1f scanned=${st.getDouble(1)}%.0f " +
        f"maxScanned=${st.getLong(2)}")
    }
    Seq(0.02, 0.05, 0.10, 0.15).foreach { frac =>
      val np = Similarity.adaptiveNprobe(k, frac)
      arm(f"count:$frac%.2f(np=$np)",
        Similarity.topKIvfIndexed(path, q, k = 10, nprobe = np),
        Similarity.probedCellStats(path, q, nprobe = np))
      arm(f"mass:$frac%.2f",
        Similarity.topKIvfIndexedMass(path, q, k = 10, massFrac = frac),
        Similarity.probedCellStats(path, q, massFrac = frac))
    }
    spark.stop()
  }
}
