package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The lease heartbeat measured under a REAL multi-minute index build —
  * the scale the TTL exists for, complementing AtRestSpec's
  * millisecond-scale race pin. A worker thread seeds a
  * production-profile IVF index over `<dir>/embeddings.parquet` with
  * `spark.graft.lease.renewMs` shrunk to seconds; at a mid-build
  * checkpoint the main thread asserts
  *   (1) the lease mtime is younger than two beat intervals — the
  *       holder is beating, so the 30-min staleness clock can never
  *       reach a live builder no matter how long the seed runs, and
  *   (2) a competing writer over the same artifact is REFUSED with the
  *       typed ConcurrentWriterException instead of breaking in — the
  *       double-mutation the pre-heartbeat TTL allowed past 30 min.
  * Prints one LEASEPROBE line per observation.
  *
  * Usage: runMain graft.tools.LeaseProbe <dir> [perCell=48]
  *   [renewMs=5000] [checkAtSec=45]
  * (perCell 48 drives the adaptive k to the kMax cap at a 200 k-vector
  * corpus — the ~200 s hier seed, a build comfortably longer than the
  * probe's scaled-down TTL analogue renewMs·360.)
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val perCell = if (args.length > 1) args(1).toInt else 48
    val renewMs = if (args.length > 2) args(2).toLong else 5000L
    val checkAt = if (args.length > 3) args(3).toLong else 45L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.lease.renewMs", renewMs.toString)
    import graft.engine.Checkpoints.MaterializeOps
    import graft.ext.{IndexProfile, Similarity}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).materialized
    val n = emb.count()
    val k = Similarity.adaptiveCellCount(emb, perCell = perCell)
    val path = java.nio.file.Files
      .createTempDirectory("graft-leaseprobe").toString
    val lease = new java.io.File(path, "_graft_ivf_meta.lease")
    @volatile var seedErr: Option[Throwable] = None
    val t0 = System.nanoTime()
    val builder = new Thread(() =>
      try Similarity.ensureIvfIndex(emb, path, nCentroids = k,
        profile = IndexProfile.Production(hierTrain = true))
      catch { case e: Throwable => seedErr = Some(e) })
    builder.start()
    Thread.sleep(checkAt * 1000)
    require(builder.isAlive,
      s"build finished before the ${checkAt}s checkpoint — raise perCell")
    // (1) the holder is beating: mtime younger than two intervals
    val age = System.currentTimeMillis() - lease.lastModified()
    println(f"LEASEPROBE n=$n k=$k renewMs=$renewMs checkAtSec=$checkAt " +
      f"leaseAgeMs=$age beating=${lease.exists() && age < 2 * renewMs}")
    // (2) a competing writer mid-build is refused, never breaks in
    val refused =
      try {
        Similarity.ensureIvfIndex(emb.limit(1000), path,
          nCentroids = 8, profile = IndexProfile.Production())
        "NOT-REFUSED (breach)"
      } catch {
        case _: graft.engine.AtRest.ConcurrentWriterException => "refused"
        case e: Throwable => s"unexpected: ${e.getClass.getSimpleName}"
      }
    println(s"LEASEPROBE competitorMidBuild=$refused")
    builder.join()
    val tSeed = (System.nanoTime() - t0) / 1e9
    println(f"LEASEPROBE seedSec=$tSeed%.1f seedErr=$seedErr " +
      f"leaseReleased=${!lease.exists()}")
    spark.stop()
  }
}
