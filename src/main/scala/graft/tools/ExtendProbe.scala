package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the incremental-extension cost of the at-rest dedup index at
  * scale, after the round-12 prefix-filtered probe
  * ([[graft.ext.Dedup.newDocPairs]]: the batch's PPJoin prefix rows
  * against the base's AT-REST prefix index — never a base×base re-join,
  * never an O(base) re-shingle; base-side work is candidate-bounded).
  *
  * Two modes:
  *
  * `full <dir> [batchFrac=0.1]` — ensure the index on the first
  * (1−batchFrac) of the corpus, extend with the rest, full-rebuild
  * reference over the union: the three-phase cycle a pipeline runs.
  * Affordable wherever the BASE pair build is (the x06 Σdf² class —
  * 1×/10× on the saturated GenCorpus; its own SCALE.md row documents
  * why the 100× base build is not, and LSH/prefix paths as the levers).
  *
  * `probe <dir> <batchSize>` — the 100×-capable experiment: FIXED batch
  * (last `batchSize` docs), growing base (the rest). Times (a) the
  * base prefix-index build (linear; lives at rest in production — paid
  * once, amortized across batches) and (b) the incremental delta
  * itself: batch-internal pairs + the prefix-filtered batch×base probe
  * + candidate-bounded verify. If (b) holds ~flat as the base grows
  * 10×, the "work ∝ batch, not corpus" contract is measured, not
  * asserted.
  */
object ExtendProbe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Dedup
    import graft.engine.Checkpoints.MaterializeOps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    def time(body: => Unit): Double = {
      val s = System.nanoTime(); body; (System.nanoTime() - s) / 1e9
    }
    mode match {
      case "full" =>
        val batchFrac = if (args.length > 2) args(2).toDouble else 0.1
        val cut = (n * (1 - batchFrac)).toLong
        val base = docs.filter(col("doc_id") < cut)
        val batch = docs.filter(col("doc_id") >= cut)
        val extDir = java.nio.file.Files
          .createTempDirectory("graft-extend-probe").toString
        val tBase = time(Dedup.ensureDedupIndex(base, extDir))
        val tExtend = time(Dedup.extendDedupIndex(base, batch, extDir))
        val nPairs = Dedup.readDedupPairs(spark, extDir).count()
        val fullDir = java.nio.file.Files
          .createTempDirectory("graft-extend-full").toString
        val tFull = time(Dedup.ensureDedupIndex(docs, fullDir))
        println(f"EXTEND full dir=$dir base=$cut batch=${n - cut} " +
          f"tBase=$tBase%.2fs tExtend=$tExtend%.2fs " +
          f"tFullRebuild=$tFull%.2fs pairs=$nPairs")
      case "probe" =>
        val batchSize = args(2).toLong
        val cut = n - batchSize
        val base = docs.filter(col("doc_id") < cut)
        val batch = docs.filter(col("doc_id") >= cut)
        var basePrefix: org.apache.spark.sql.DataFrame = null
        val tPrefix = time {
          basePrefix = Dedup
            .prefixIndexRows(Dedup.shingled(base, 3), 0.5).materialized
        }
        var nDelta = 0L
        val tDelta = time {
          val sgBatch = Dedup.shingled(batch, 3).materialized
          val batchPrefix = Dedup.prefixIndexRows(sgBatch, 0.5)
          nDelta = Dedup
            .newDocPairs(base, basePrefix, sgBatch, batchPrefix, 3, 0.5)
            .count()
        }
        println(f"EXTEND probe dir=$dir base=$cut batch=$batchSize " +
          f"tBasePrefix=$tPrefix%.2fs tDelta=$tDelta%.2fs " +
          f"deltaPairs=$nDelta")
      case "lsh" =>
        // the LSH-keyed extension measured at the same fixed-batch /
        // growing-base shape as `probe`, end to end through the at-rest
        // API: build the base index once (timed separately — at rest in
        // production), then time ONLY the incremental extension
        val batchSize = args(2).toLong
        val cut = n - batchSize
        val base = docs.filter(col("doc_id") < cut).materialized
        val batch = docs.filter(col("doc_id") >= cut).materialized
        val extDir = java.nio.file.Files
          .createTempDirectory("graft-extend-lsh").toString
        val tBase = time(Dedup.ensureDedupIndexLsh(base, extDir))
        var extended = false
        val tDelta = time {
          extended = Dedup.extendDedupIndexLsh(base, batch, extDir)
        }
        val nPairs = Dedup.readDedupPairs(spark, extDir).count()
        println(f"EXTEND lsh dir=$dir base=$cut batch=$batchSize " +
          f"tBaseBuild=$tBase%.2fs tDelta=$tDelta%.2fs " +
          f"extended=$extended pairs=$nPairs")
      case "knn" =>
        // the kNN-index extension at the fixed-batch / growing-base
        // shape, on the embeddings table: base index built with
        // adaptive cells (the x131 contract), a FIXED batch extended
        // in, against the full-rebuild price. The incremental win is
        // ∝ touched-cell mass: a batch of b vectors touches ≤ b of the
        // k cells, so the recomputed edge mass is (touched/k) of the
        // corpus's — plus the frozen model skips the full-Lloyd
        // training term entirely.
        val batchSize = args(2).toLong
        // optional 4th arg 'prod' runs all three legs under the
        // Production profile — the comparable row for `knnlocal`
        // (same profile, i.i.d. vs localized batch)
        val prof: graft.ext.IndexProfile =
          if (args.length > 3 && args(3) == "prod")
            graft.ext.IndexProfile.Production()
          else graft.ext.IndexProfile.Exact
        val embAll = spark.read.parquet(s"$dir/embeddings.parquet")
        val nv = embAll.select(max(col("vec_id"))).collect()(0).getLong(0) + 1
        val cut = nv - batchSize
        val base = embAll.filter(col("vec_id") < cut)
        val batch = embAll.filter(col("vec_id") >= cut)
        val knnDir = java.nio.file.Files
          .createTempDirectory("graft-extend-knn").toString
        val tBase = time(graft.ext.Similarity
          .ensureKnnIndex(base, knnDir, k = 5, profile = prof))
        val tDelta = time(graft.ext.Similarity
          .extendKnnIndex(base, batch, knnDir, k = 5, profile = prof))
        val edges = graft.ext.Similarity.readKnnEdges(spark, knnDir)
        val nEdges = edges.count()
        val touched = graft.ext.Similarity
          .cellAssignments(batch,
            graft.ext.Similarity.readKnnCentroids(spark, knnDir))
          .select(col("cell")).distinct().count()
        val total = graft.ext.Similarity
          .readKnnCentroids(spark, knnDir).count()
        val fullDir = java.nio.file.Files
          .createTempDirectory("graft-extend-knn-full").toString
        val tFull = time(graft.ext.Similarity
          .ensureKnnIndex(base.union(batch), fullDir, k = 5,
            profile = prof))
        println(f"EXTEND knn dir=$dir prof=$prof base=$cut batch=$batchSize " +
          f"tBaseBuild=$tBase%.2fs tDelta=$tDelta%.2fs " +
          f"tFullRebuild=$tFull%.2fs touchedCells=$touched/$total " +
          f"edges=$nEdges")
      case "knnlocal" =>
        // the LOCALIZED-batch complement of `knn` (round-13 verdict
        // ask #4): GenCorpus batches are i.i.d., so the 90/10 row
        // touches every cell by construction — the adversarial case.
        // The production reality (a crawl burst, one domain's
        // re-embed) lands in a few cells' neighborhoods; this mode
        // samples the batch from members of <= cellFrac of the cells
        // (copies under fresh ids — duplicates assign to their source
        // cell under the frozen model), so the touched-cell lever is
        // MEASURED: tDelta must track the touched mass, not the
        // corpus, while the untouched cell= partitions are never read
        // (partition-pruned scans; file-grain invariance is
        // spec-pinned in ExtSpec). Base build + rebuild reference run
        // the PRODUCTION profile (sampled training + coarse
        // assignment — the x144 seed), which is also what makes the
        // 100x rebuild leg affordable enough to compare against.
        val batchSize = args(2).toLong
        val cellFrac = if (args.length > 3) args(3).toDouble else 0.05
        val embAll = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")).materialized
        val nv = embAll.select(max(col("vec_id"))).collect()(0)
          .getLong(0) + 1
        val prod = graft.ext.IndexProfile.Production()
        val knnDir = java.nio.file.Files
          .createTempDirectory("graft-extend-knnloc").toString
        val tBase = time(graft.ext.Similarity
          .ensureKnnIndex(embAll, knnDir, k = 5, profile = prod))
        val totalCells = graft.ext.Similarity
          .readKnnCentroids(spark, knnDir).count()
        val nPick = math.max(1, (totalCells * cellFrac).toInt)
        val atRestCells = spark.read.parquet(s"$knnDir/cells")
        val pickedCells = atRestCells.select(col("cell")).distinct()
          .orderBy(col("cell")).limit(nPick)
        import org.apache.spark.sql.expressions.Window
        val batch = atRestCells
          .join(broadcast(pickedCells), Seq("cell"))
          .orderBy(col("cid")).limit(batchSize.toInt)
          .withColumn("rk", row_number().over(Window.orderBy(col("cid"))))
          .select((lit(nv) + col("rk") - lit(1)).cast("long")
            .as("vec_id"), col("embedding"))
          .materialized
        val bN = batch.count()
        val tDelta = time(graft.ext.Similarity
          .extendKnnIndex(embAll, batch, knnDir, k = 5, profile = prod))
        // touched = the cells the appended batch rows actually landed
        // in (read back from the artifact — no re-assignment guess)
        val touched = spark.read.parquet(s"$knnDir/cells")
          .filter(col("cid") >= nv).select(col("cell")).distinct()
          .count()
        val fullDir = java.nio.file.Files
          .createTempDirectory("graft-extend-knnloc-full").toString
        val tFull = time(graft.ext.Similarity.ensureKnnIndex(
          embAll.unionByName(batch), fullDir, k = 5, profile = prod))
        println(f"EXTEND knnlocal dir=$dir base=$nv batch=$bN " +
          f"cellFrac=$cellFrac tBaseBuild=$tBase%.2fs " +
          f"tDelta=$tDelta%.2fs tFullRebuild=$tFull%.2fs " +
          f"touchedCells=$touched/$totalCells")
      case "cdc" =>
        // the CDC containment index extension at the fixed-batch /
        // growing-base shape: the base chunk relation is at rest (built
        // once — timed separately), the extension chunks ONLY the batch
        // and re-runs the dup-bounded pair stage over the skinny
        // persisted chunks. If tDelta stays near-flat as the base grows
        // 10×, the "never re-tokenize the corpus" contract is measured
        val batchSize = args(2).toLong
        val cut = n - batchSize
        val base = docs.filter(col("doc_id") < cut)
        val batch = docs.filter(col("doc_id") >= cut)
        val extDir = java.nio.file.Files
          .createTempDirectory("graft-extend-cdc").toString
        val tBase = time(Dedup.ensureCdcIndex(base, extDir))
        val tDelta = time(Dedup.extendCdcIndex(base, batch, extDir))
        val nPairs = Dedup.readCdcPairs(spark, extDir).count()
        println(f"EXTEND cdc dir=$dir base=$cut batch=$batchSize " +
          f"tBaseBuild=$tBase%.2fs tDelta=$tDelta%.2fs pairs=$nPairs")
      case other =>
        sys.error(s"unknown mode $other " +
          "(full | probe | lsh | knn | knnlocal | cdc)")
    }
    spark.stop()
  }
}
