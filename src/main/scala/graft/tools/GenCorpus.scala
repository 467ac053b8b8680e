package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Synthetic `documents` / `embeddings` corpora for scale-exponent runs
  * (dev tool — the oracle testdata stays driver-owned; this only feeds
  * SCALE.md's measured time@10x/time@1x rows).
  *
  * Reproduces the driver corpus's statistical shape at arbitrary n so a
  * 10x run differs from the 1x run ONLY in row count: the same ~40-word
  * vocabulary (so shingle-space saturation behaves like the oracle
  * tables), 8–96 words/doc, 20 fixed sources, the 40/15/15/15/15 lang
  * mix, a 0.16% exact-duplicate rate and a 0.4% one-word near-duplicate
  * rate (pairing doc i with doc i-1), and 64-dim label-clustered float
  * embeddings over 10 labels. Fully deterministic: every row is a pure
  * function of its id, generated distributively (`spark.range(n).map`) —
  * no driver-side corpus materialization, so the generator itself holds
  * at any n.
  *
  * Usage: runMain graft.tools.GenCorpus <outDir> <nDocs> <nVecs>
  */
object GenCorpus {

  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Vec(vec_id: Long, embedding: Seq[Float], label: Int)

  private val vocab: Array[String] = Array(
    "spark", "line", "column", "order", "sort", "fast", "value", "scan",
    "hash", "slow", "group", "batch", "part", "vector", "query", "agg",
    "table", "stream", "filter", "big", "merge", "small", "a", "the",
    "join", "key", "window", "data", "customer", "supplier", "region",
    "nation", "shuffle", "broadcast", "codegen", "plan", "stage", "task",
    "row", "page")

  /** Base text for seed i — pure, so a near-dup row can re-derive its
    * neighbour's text without reading it. */
  private[tools] def docText(i: Long): String = {
    val rnd = new java.util.Random(i * 2654435761L + 42)
    val n = 8 + rnd.nextInt(89)
    val sb = new StringBuilder
    var w = 0
    while (w < n) {
      if (w > 0) sb.append(' ')
      sb.append(vocab(rnd.nextInt(vocab.length)))
      w += 1
    }
    sb.toString
  }

  private[tools] def doc(i: Long): Doc = {
    val rnd = new java.util.Random(i * 7919L + 7)
    // dup/near-dup schedules are disjoint mod classes (624 vs 100 mod
    // 250 never coincide, and neither base row i-1 is itself special),
    // so the injected rates are exact and scale-invariant
    val text =
      if (i % 625 == 624) docText(i - 1)
      else if (i > 0 && i % 250 == 100) {
        val w = docText(i - 1).split(' ')
        w((i % w.length).toInt) = vocab((i % vocab.length).toInt)
        w.mkString(" ")
      } else docText(i)
    val p = rnd.nextInt(100)
    val lang =
      if (p < 40) "en" else if (p < 55) "fr" else if (p < 70) "de"
      else if (p < 85) "es" else "zh"
    Doc(i, text, lang, "src" + rnd.nextInt(20), text.length.toLong)
  }

  /** Label-clustered embedding: a per-label center (pure function of the
    * label) plus per-row noise — gives the IVF/SemDeDup paths real cell
    * structure at every n. */
  private[tools] def vec(i: Long): Vec = {
    val rnd = new java.util.Random(i * 6364136223846793005L + 1442695040888963407L)
    val label = rnd.nextInt(10)
    val c = new java.util.Random(9176L + label)
    val e = new Array[Float](64)
    var d = 0
    while (d < 64) {
      e(d) = (c.nextFloat() * 2 - 1) * 0.8f + (rnd.nextFloat() * 2 - 1) * 0.4f
      d += 1
    }
    Vec(i, e.toSeq, label)
  }

  def main(args: Array[String]): Unit = {
    val Array(outDir, nDocsS, nVecsS) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.range(nDocsS.toLong).map(i => doc(i)).write
      .mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
    spark.range(nVecsS.toLong).map(i => vec(i)).write
      .mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
    println(s"wrote $nDocsS docs + $nVecsS vecs under $outDir")
    spark.stop()
  }
}
