package graft.fhir

import org.apache.spark.sql.types._

/** Code-declared schemas for the FHIR-bundle ingest path, mirroring what
  * the reference declares and consumes (reference models.go:5-46 via Go
  * structs; FHIR STU3 fields actually read in bundle.go:84-108;
  * cross-resource references rewritten in bundle.go:173-221).
  *
  * Schema-on-read with projection: unknown JSON fields are dropped by the
  * explicit StructType (the reference gets the same behavior from
  * `json.Unmarshal`, main.go:255); malformed files are skipped via
  * PERMISSIVE mode + a corrupt-record column, matching the discarded
  * Unmarshal error.
  */
object Schemas {

  /** FHIR Reference shape — the "edge" of the per-bundle graph
    * (bundle.go:137-147). Any struct with these fields is rewritten by
    * [[ReferenceRewrite]], mirroring the reflection type test at
    * bundle.go:206-207.
    */
  val reference: StructType = StructType(Seq(
    StructField("reference", StringType),
    StructField("display", StringType)))

  val coding: StructType = StructType(Seq(
    StructField("system", StringType),
    StructField("code", StringType),
    StructField("display", StringType)))

  val codeableConcept: StructType = StructType(Seq(
    StructField("coding", ArrayType(coding)),
    StructField("text", StringType)))

  val address: StructType = StructType(Seq(
    StructField("line", ArrayType(StringType)),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("postalCode", StringType)))

  val period: StructType = StructType(Seq(
    StructField("start", TimestampType),
    StructField("end", TimestampType)))

  /** Union-of-fields resource struct, discriminated by `resourceType` —
    * the Spark equivalent of the reference's reflection-based dynamic
    * typing (main.go:268-269). Covers the fields the reference reads for
    * stats (Patient, Condition) plus the reference-bearing fields of the
    * other routed types (db.go:12-24); everything else passes through the
    * resource sink untouched.
    */
  val resource: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    // Patient (bundle.go:84-97)
    StructField("gender", StringType),
    StructField("birthDate", DateType),
    StructField("deceasedBoolean", BooleanType), // tri-state: null = living
    StructField("deceasedDateTime", TimestampType),
    StructField("address", ArrayType(address)),
    // Condition (bundle.go:99-108)
    StructField("code", codeableConcept),
    StructField("clinicalStatus", StringType),
    StructField("verificationStatus", StringType),
    StructField("onsetDateTime", TimestampType),
    StructField("abatementDateTime", TimestampType),
    // reference-bearing fields across the routed types (bundle.go:192-221
    // walks every nested field; we declare where References live)
    StructField("subject", reference),
    StructField("patient", reference),
    StructField("context", reference),
    StructField("encounter", reference),
    StructField("requester", StructType(Seq(
      StructField("agent", reference),
      StructField("onBehalfOf", reference)))),
    StructField("medicationReference", reference),
    StructField("reasonReference", ArrayType(reference)),
    StructField("basedOn", ArrayType(reference)),
    StructField("performer", ArrayType(StructType(Seq(
      StructField("actor", reference),
      StructField("role", codeableConcept))))),
    StructField("result", ArrayType(reference)),
    // Encounter / Observation / Procedure extras
    StructField("status", StringType),
    StructField("class", coding),
    StructField("period", period),
    StructField("effectiveDateTime", TimestampType),
    StructField("valueQuantity", StructType(Seq(
      StructField("value", DoubleType),
      StructField("unit", StringType)))),
    StructField("vaccineCode", codeableConcept),
    StructField("medicationCodeableConcept", codeableConcept)))

  val entry: StructType = StructType(Seq(
    StructField("fullUrl", StringType),
    StructField("resource", resource),
    StructField("request", StructType(Seq(
      StructField("method", StringType),
      StructField("url", StringType))))))

  val bundle: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("type", StringType),
    StructField("entry", ArrayType(entry)),
    StructField("_corrupt_record", StringType)))

  /** The 11 routed collections (db.go:12-24) — reflected type name →
    * pluralized lowercase collection (bundle.go:80).
    */
  val collections: Map[String, String] = Map(
    "AllergyIntolerance" -> "allergyintolerances",
    "CarePlan" -> "careplans",
    "Condition" -> "conditions",
    "DiagnosticReport" -> "diagnosticreports",
    "Encounter" -> "encounters",
    "Immunization" -> "immunizations",
    "MedicationRequest" -> "medicationrequests",
    "Observation" -> "observations",
    "Patient" -> "patients",
    "Procedure" -> "procedures",
    "Bundle" -> "bundles")

  // Case classes mirroring models.go:5-46 for the typed stat path.
  case class Cousub(cs_name: String, ct_fips: String, cs_fips: String)
  case class DiseaseDim(
      code_system: String, code: String, condition_id: Int,
      disease_id: Int, condition_name: String)
  case class ConditionCode(
      system: String, code: String, conditionid: Int, diseaseid: Int)
  case class Location(
      countyid_fips: String, subcountyid_fips: String,
      city: String, zipcode: String)
  case class RawStat(
      patientid: String, location: Location, gender: String,
      agerange: Int, age: Int, deceasedboolean: Option[Boolean],
      conditions: Seq[ConditionCode], uniqueconditions: Seq[Int],
      uniquediseases: Seq[Int])
}
