package graft.tools

import graft.SparkEntry
import graft.engine.GraftSession

/** Dump formatted physical plans for plan-quality review (dev tool).
  * Usage: runMain graft.tools.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.build("local[4]", "graft-explain", 4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
