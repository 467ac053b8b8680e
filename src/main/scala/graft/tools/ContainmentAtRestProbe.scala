package graft.tools

import org.apache.spark.sql.SparkSession

/** Measure what the at-rest shingle-df relation buys x141's production
  * entry point (round-13 verdict ask #3): per corpus dir, time
  * `containmentAuto` end to end
  *
  *   - cold: first call with a `dfIndexPath` — builds the df index
  *     (one linear corpus pass) and runs probe + chosen chain;
  *   - warm: second call on the same path — the corpus-static df
  *     relation is read at rest (vocabulary-bounded scan), so the call
  *     should be dominated by the CHOSEN CHAIN, not the probe;
  *   - self: the pathless form that re-derives the df relation every
  *     invocation (the round-13 shape, kept as the baseline).
  *
  * Usage: runMain graft.tools.ContainmentAtRestProbe <dir> [<dir> ...]
  */
object ContainmentAtRestProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.engine.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Dedup
    args.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val dfDir = java.nio.file.Files
        .createTempDirectory("graft-cont-df").toString
      def timed(body: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = body
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val (n1, tCold) = timed(Dedup.containmentAuto(docs,
        dfIndexPath = Some(dfDir)).count())
      val (n2, tWarm) = timed(Dedup.containmentAuto(docs,
        dfIndexPath = Some(dfDir)).count())
      val (n3, tSelf) = timed(Dedup.containmentAuto(docs).count())
      // chain-only floor via the conf hatch: what the call would cost
      // with the decision free — the bound the at-rest probe approaches
      spark.conf.set("spark.graft.containment.mode", "cdc")
      val (nc, tChain) =
        try timed(Dedup.containmentAuto(docs).count())
        finally spark.conf.unset("spark.graft.containment.mode")
      require(n1 == n2 && n2 == n3,
        s"pair counts must agree across forms: $n1/$n2/$n3")
      // decision-statistic cost alone, both routes (no chain)
      val t0p = System.nanoTime()
      val eAtRest = Dedup.estimateContainmentCandidatesPerDoc(docs,
        df = Some(Dedup.readShingleDf(spark, dfDir)))
      val tProbeAtRest = (System.nanoTime() - t0p) / 1e9
      val t1p = System.nanoTime()
      val eSelf = Dedup.estimateContainmentCandidatesPerDoc(docs)
      val tProbeSelf = (System.nanoTime() - t1p) / 1e9
      // today the statistic's aggregate is integer (sum of Long df−1,
      // one final division), so the routes are bit-identical — but the
      // gate compares with a tight relative tolerance so a future
      // floating-point term can't make route-invariance partition-
      // order-dependent (exact-equality-across-physical-plans is flaky
      // by construction)
      require(math.abs(eAtRest - eSelf) <=
        1e-12 * math.max(1.0, math.max(math.abs(eAtRest),
          math.abs(eSelf))),
        s"probe statistic must be route-invariant: $eAtRest vs $eSelf")
      println(f"CONTAINMENT dir=$dir pairs=$n1 coldSec=$tCold%.2f " +
        f"warmSec=$tWarm%.2f selfSec=$tSelf%.2f " +
        f"cdcChainSec=$tChain%.2f cdcPairs=$nc " +
        f"probeAtRestSec=$tProbeAtRest%.2f probeSelfSec=$tProbeSelf%.2f")
    }
    spark.stop()
  }
}
