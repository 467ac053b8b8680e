package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The correctness-dump contract the driver's t2 gate rides on
  * (VERDICT r8 ask #3): a failing declared query must surface as a RED
  * row — a marker parquet that can never hash-match — not vanish from
  * the artifact.
  */
class VerifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dump writes results for passing queries, error markers + " +
      "errors.json for failing ones — never an absent entry") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify")
      .toString
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "good_query" -> ((s: SparkSession, _: String) => {
        import s.implicits._
        Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      }),
      "analysis_fail" -> ((s: SparkSession, _: String) => {
        import s.implicits._
        // resolves lazily at write time: missing column → AnalysisException
        Seq(1L).toDF("id").select(col("no_such_column"))
      }),
      "runtime_fail" -> ((_: SparkSession, _: String) =>
        throw new IllegalStateException("boom at plan build")))
    val errs = Verify.dump(spark, "/unused", out, queries,
      Seq("good_query" -> "SELECT 1 AS x,\n\ttab"))
    assert(errs.keySet == Set("analysis_fail", "runtime_fail"))
    // every declared query has an on-disk entry
    for (name <- queries.map(_._1))
      assert(new java.io.File(s"$out/$name").exists(), s"$name absent")
    val good = spark.read.parquet(s"$out/good_query")
    assert(good.count() == 2 && good.columns.toSeq == Seq("id", "v"))
    // failing queries yield the un-hash-matchable marker schema
    for (name <- Seq("analysis_fail", "runtime_fail")) {
      val marker = spark.read.parquet(s"$out/$name")
      assert(marker.columns.toSeq == Seq("__graft_error"))
      assert(marker.count() == 1)
    }
    assert(spark.read.parquet(s"$out/runtime_fail")
      .as[String].head().contains("boom"))
    // errors.json carries both failures; oracle_sql.json survives the
    // control-char escape (the driver json.loads both)
    val errJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/errors.json")))
    assert(errJson.contains("analysis_fail") &&
      errJson.contains("runtime_fail"))
    val oracleJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")))
    assert(oracleJson.contains("\\n") && oracleJson.contains("\\t"))
  }
}
