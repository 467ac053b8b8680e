package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Measure the streaming at-rest index maintenance loop's sustained
  * cadence ([[graft.streaming.Streams.dedupIndexStream]]): feed a real
  * corpus through the stream in fixed-size micro-batches and report the
  * per-batch maintenance times (batch 0 = seed; the rest = banded
  * incremental extensions) plus steady-state docs/s. This is the
  * daily-crawl number: how fast can landed batches be folded into the
  * at-rest near-dup index, end to end (land + probe + extend + CC +
  * rewrite), and does the per-batch cost stay flat as the landed corpus
  * grows — the same contract ExtendProbe measures one level down, here
  * through the streaming face itself.
  *
  * `kind` selects the doc-driven face: `dedup` (default — the LSH key
  * index + its df sidecar) or `cdc` (the containment chunk index,
  * round-14's fourth face).
  *
  * Usage: runMain graft.tools.IndexStreamProbe <dir> <nBatches>
  * <batchSize> [dedup|cdc]
  */
object IndexStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args(1).toInt
    val batchSize = args(2).toInt
    val kind = if (args.length > 3) args(3) else "dedup"
    require(kind == "dedup" || kind == "cdc",
      s"kind must be dedup or cdc: $kind")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the probe's whole point is steady-state (post-seed) cost, so a
    // 1-batch run has nothing to report — fail fast instead of
    // printing NaN steady fields over an empty drop(1)
    require(nBatches >= 2,
      s"nBatches must be >= 2 (seed + at least one extension): $nBatches")
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
      .limit(nBatches * batchSize)
      .as[(Long, String, String)].collect()
    require(rows.length == nBatches * batchSize,
      s"corpus too small: ${rows.length} < ${nBatches * batchSize}")
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-isp-corpus").toString
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft-isp-index").toString
    val src = MemoryStream[(Long, String, String)]
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-isp-ckpt").toString
    val streamDf = src.toDF().toDF("doc_id", "source", "text")
    val q =
      if (kind == "cdc")
        graft.streaming.Streams.cdcIndexStream(streamDf, corpusDir,
          indexPath, ckpt)
      else
        graft.streaming.Streams.dedupIndexStream(streamDf, corpusDir,
          indexPath, ckpt)
    val times = (0 until nBatches).map { i =>
      src.addData(rows.slice(i * batchSize, (i + 1) * batchSize): _*)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    q.stop()
    val steady = times.drop(1)
    val perBatch = times.map(t => f"$t%.2f").mkString(",")
    println(f"INDEXSTREAM kind=$kind dir=$dir batches=$nBatches batch=$batchSize " +
      f"perBatchSec=[$perBatch] seed=${times.head}%.2fs " +
      f"steadyMean=${steady.sum / steady.size}%.2fs " +
      f"steadyDocsPerSec=${batchSize * steady.size / steady.sum}%.0f")
    spark.stop()
  }
}
