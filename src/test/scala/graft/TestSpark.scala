package graft

import org.apache.spark.sql.SparkSession

import graft.engine.GraftSession

/** One shared session across all suites (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("local[4]", "graft-test", 4)
}
