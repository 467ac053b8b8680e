package graft.engine

import org.apache.spark.sql.SparkSession

/** Fingerprint-stamped build-or-reuse for artifacts AT REST — the seam
  * behind `Similarity.ensureIvfIndex` and `Dedup.ensureDedupIndex`.
  *
  * A 100 TB pipeline amortizes its expensive derived artifacts (IVF
  * index, near-dup pair graph, CC labels) across JOBS, not one JVM: the
  * artifact lives on the cluster filesystem with a sidecar stamp of
  * (input data fingerprint, input plan hash, hyperparameters), and every
  * run compares the stamp instead of rebuilding. The stamp is written
  * AFTER the build completes, so a crash mid-build leaves no stamp and
  * the next ensure rebuilds instead of trusting a torn artifact. All IO
  * goes through the Hadoop FS API so `path` can live on any cluster
  * filesystem, not just local disk.
  */
object AtRest {

  /** Run `build` only when the sidecar `path/metaName` is absent or its
    * content differs from `stamp` (or `force`). `force` is the
    * out-of-band-mutation hatch: data fingerprints typically see only
    * file (path, length, mtime), so a rewrite preserving sizes within
    * mtime granularity — or an object-store restore preserving mtimes —
    * needs an explicit rebuild lever. Returns true when a (re)build
    * happened.
    */
  /** The sidecar's current stamp, if a well-formed one exists — the
    * read half of [[ensureStamped]], exposed so incremental extenders
    * (e.g. `Dedup.extendDedupIndex`) can distinguish "artifact matches
    * my base, extend it" from "drifted, rebuild from scratch".
    */
  def readStamp(spark: SparkSession, path: String,
      metaName: String): Option[String] = {
    val metaPath = new org.apache.hadoop.fs.Path(path, metaName)
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val isRegularFile =
      try fs.getFileStatus(metaPath).isFile
      catch { case _: java.io.FileNotFoundException => false }
    if (!isRegularFile) None
    else {
      val in = fs.open(metaPath)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Remove the sidecar stamp, if present. An IN-PLACE mutator (e.g.
    * `Dedup.extendDedupIndex`, which reads the existing artifacts and
    * overwrites them) MUST call this before its first overwrite: the
    * stamp-after-build crash-safety argument only holds for builds that
    * never read the existing artifact — a crash between the first
    * overwrite and the re-stamp would otherwise leave the OLD stamp
    * pointing at half-mutated files, and a retry would extend on top of
    * already-extended pairs (silently duplicating every batch pair).
    * With the stamp gone, a crashed mutation falls back to a full
    * rebuild on retry.
    */
  def deleteStamp(spark: SparkSession, path: String,
      metaName: String): Unit = {
    val metaPath = new org.apache.hadoop.fs.Path(path, metaName)
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(metaPath, false)
    ()
  }

  def ensureStamped(spark: SparkSession, path: String, metaName: String,
      stamp: String, force: Boolean)(build: => Unit): Boolean = {
    val metaPath = new org.apache.hadoop.fs.Path(path, metaName)
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val current = readStamp(spark, path, metaName)
    if (!force && current.contains(stamp)) false
    else {
      build
      val out = fs.create(metaPath, true)
      try out.write(stamp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      true
    }
  }
}
