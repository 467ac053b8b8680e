package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fhir.{BundleIngest, ParquetSink, ReferenceRewrite, Schemas}

class SinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rewritten = BundleIngest.rewriteBundle(
    BundleIngest.readBundles(spark,
      getClass.getResource("/bundles").getPath))

  test("ParquetSink appends resources; reset clears them (S5/S10)") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val sink = new ParquetSink(dir)
    val routed = BundleIngest.routeResources(rewritten)
    sink.writeResources(routed)
    sink.writeResources(routed) // no -reset → duplicates, like the reference
    assert(spark.read.parquet(s"$dir/resources").count() == 46)
    sink.reset()
    assert(!Files.exists(java.nio.file.Paths.get(dir, "resources")))
    sink.writeResources(routed)
    assert(spark.read.parquet(s"$dir/resources").count() == 23)
  }

  test("ParquetSink fact write is idempotent per run (S8/S9 overwrite)") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val sink = new ParquetSink(dir)
    val facts = Seq(("A", 1, 2L, 1L, 1L))
      .toDF("cs_fips", "age_id", "pop", "pop_male", "pop_female")
    sink.writeFacts("synth_pop_facts", facts)
    sink.writeFacts("synth_pop_facts", facts)
    assert(spark.read.parquet(s"$dir/synth_pop_facts").count() == 1)
  }

  test("T5: legacy cid: references resolve behind the flag") {
    val df = Seq(("cid:p9", "urn:uuid:p9"), ("cid:nope", "urn:uuid:p9"))
      .toDF("ref", "key")
      .select(
        struct($"ref".as("reference"), lit("d").as("display")).as("r"),
        map($"key", lit("Patient/NEW")).as("refmap"))
    val out = df.select(
      ReferenceRewrite.rewriteValue(
        $"r", Schemas.reference, $"refmap", legacyCid = true)
        .getField("reference").as("ref"))
      .as[String].collect().toSeq
    // "cid:p9" → trimmed key "p9"... the refmap is keyed by fullUrl
    // ("urn:uuid:p9"), so the cid path only hits when the trimmed id IS
    // the map key — mirror of the reference's updateReference
    // (bundle.go:137-147) where refMap keys are bare ids in the legacy path
    assert(out == Seq("cid:p9", "cid:nope"))
    val bareMap = df.select($"r",
      map(lit("p9"), lit("Patient/NEW")).as("refmap"))
    val out2 = bareMap.select(
      ReferenceRewrite.rewriteValue(
        $"r", Schemas.reference, $"refmap", legacyCid = true)
        .getField("reference").as("ref"))
      .as[String].collect().toSeq
    assert(out2 == Seq("Patient/NEW", "cid:nope"))
  }
}
