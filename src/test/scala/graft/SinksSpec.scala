package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.fhir.{BundleIngest, FhirMain, JdbcFactSink, MongoResourceSink,
  ParquetSink, ReferenceRewrite, Schemas}

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

  test("CLI flags parse Go-style: -key value pairs + bare booleans") {
    val opts = FhirMain.parseFlags(Array(
      "-path", "/in", "-out", "/w", "-reset", "-workers", "8",
      "-pgurl", "jdbc:postgresql://h/db", "-mongo", "mongodb://h",
      "-dbname", "fhir", "-debug"))
    assert(opts("-path") == "/in")
    assert(opts("-workers") == "8")
    assert(opts.contains("-reset") && opts.contains("-debug"))
    assert(opts("-pgurl") == "jdbc:postgresql://h/db")
    assert(opts("-mongo") == "mongodb://h")
    assert(opts("-dbname") == "fhir")
    // bare boolean flags must not swallow the following flag
    val opts2 = FhirMain.parseFlags(Array("-reset", "-path", "/p"))
    assert(opts2("-path") == "/p")
    // Go-style hard errors: unknown flag, value-flag with no value
    assertThrows[RuntimeException] {
      FhirMain.parseFlags(Array("-rest", "-path", "/p"))
    }
    assertThrows[RuntimeException] {
      FhirMain.parseFlags(Array("-path"))
    }
  }

  test("-schema qualifies Postgres fact tables, defaults to synth_ma") {
    // Derby's default schema is APP: the qualified write/truncate path
    // must behave exactly like the bare-table one
    val url = "jdbc:derby:memory:graftFactsQ;create=true"
    val sink = new JdbcFactSink(url, Some("APP"))
    sink.clearFactTables(Seq("synth_pop_facts"))
    val facts = Seq(("25017", 1, 10L, 4L, 6L))
      .toDF("cs_fips", "age_id", "pop", "pop_male", "pop_female")
    sink.writeFacts("synth_pop_facts", facts)
    assert(spark.read.jdbc(
      url, "APP.synth_pop_facts", new java.util.Properties).count() == 1)
    sink.clearFactTables(Seq("synth_pop_facts"))
    assert(spark.read.jdbc(
      url, "APP.synth_pop_facts", new java.util.Properties).count() == 0)
    // a missing schema truncates to a no-op, like a missing table
    new JdbcFactSink(url, Some("NO_SUCH_SCHEMA"))
      .clearFactTables(Seq("synth_pop_facts"))
  }

  test("-mongo -reset no longer crashes after the fact truncate") {
    // reset defers to overwrite-at-next-write (reference drops and
    // logs-and-continues, db.go:63-75) — must not throw
    new MongoResourceSink("mongodb://unused", "fhir").reset()
  }

  test("sink selection mirrors the reference wiring (main.go:29-69)") {
    val (r0, f0) = FhirMain.sinksFor(Map.empty, "/w")
    assert(r0.isInstanceOf[ParquetSink] && f0.isInstanceOf[ParquetSink])
    val (r1, f1) = FhirMain.sinksFor(
      Map("-mongo" -> "mongodb://h", "-pgurl" -> "jdbc:derby:memory:x"),
      "/w")
    assert(r1.isInstanceOf[MongoResourceSink])
    assert(f1.isInstanceOf[JdbcFactSink])
  }

  test("JdbcFactSink writes + truncates against embedded Derby (S8/S9)") {
    val url = "jdbc:derby:memory:graftFacts;create=true"
    val sink = new JdbcFactSink(url)
    // first run: nothing to truncate — must be a no-op, not an error
    sink.clearFactTables(Seq("synth_pop_facts"))
    val facts = Seq(("25017", 1, 10L, 4L, 6L), ("25021", 1, 3L, 2L, 1L))
      .toDF("cs_fips", "age_id", "pop", "pop_male", "pop_female")
    sink.writeFacts("synth_pop_facts", facts)
    val back = spark.read.jdbc(
      url, "synth_pop_facts", new java.util.Properties)
    assert(back.count() == 2)
    // counts are narrowed to int at the relational boundary (db.go:35-37)
    assert(back.schema("pop").dataType ==
      org.apache.spark.sql.types.IntegerType)
    sink.clearFactTables(Seq("synth_pop_facts"))
    assert(spark.read.jdbc(
      url, "synth_pop_facts", new java.util.Properties).count() == 0)
    // append semantics across runs (reference COPYs into kept tables)
    sink.writeFacts("synth_pop_facts", facts)
    sink.writeFacts("synth_pop_facts", facts)
    assert(spark.read.jdbc(
      url, "synth_pop_facts", new java.util.Properties).count() == 4)
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
