package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.GraftSession
import graft.queries.{CoreQueries, ExtQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the population-facts shape (SURVEY §3.2) over customer.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    CoreQueries.queries("q01_filter_onehot_agg")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ExtQueries.oracleSql

  /** Short id for the stdout bench line: the query name up to the first
    * '_' with the zero-padding stripped (q01 → q1, x05 → x5, x114 →
    * x114 — unique by construction, unlike the fixed take(3) that
    * collided for x100+ in round 9; stripping the pad bought the
    * 150-query surface ~105 chars of the 2000-char driver window).
    * BenchIdSpec gates uniqueness and the stdout line-length budget at
    * build time.
    */
  def shortId(name: String): String = {
    val prefix = name.indexOf('_') match {
      case -1 => name
      case i  => name.substring(0, i)
    }
    prefix.replaceFirst("^([a-z]+)0+(?=[0-9])", "$1")
  }
}
