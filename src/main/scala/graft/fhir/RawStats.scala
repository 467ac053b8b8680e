package graft.fhir

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.CoreOps

/** T7–T13: the per-patient "rawstat" materialized pre-aggregate
  * (reference bundle.go:66-125, models.go:5-32) — demographics +
  * location dim join + condition/disease dim join + dedup, one row per
  * patient. Persisted once at ingest so the three fact rollups never
  * rescan raw resources (the reference's central design decision,
  * README.md:89-91).
  *
  * Scale shape: patient/condition extraction is per-row (no shuffle); the
  * dim joins are broadcast; the only shuffle is the regroup of exploded
  * conditions by patient id — uniformly distributed surrogate keys, no
  * skew.
  */
object RawStats {

  /** The typed view of the rawstat table (SURVEY §1.3: `Dataset[T]` where
    * a case class models the row — compile-time field checks for the stat
    * path while bundles/resources stay schema-dynamic DataFrames).
    */
  def typed(rawstat: DataFrame): org.apache.spark.sql.Dataset[Schemas.RawStat] = {
    val spark = rawstat.sparkSession
    import spark.implicits._
    rawstat.as[Schemas.RawStat]
  }

  /** S3 dim load: cousub city→FIPS with the `' Town'` suffix strip
    * (main.go:139-145). Expects (cs_name, ct_fips, cs_fips).
    */
  def loadCousubDim(raw: DataFrame): DataFrame =
    raw.select(
      CoreOps.stripSuffix(col("cs_name"), " Town").as("cs_name"),
      col("ct_fips"), col("cs_fips"))

  /** S4 dim load: condition/disease codes with the NULL→-999 sentinel
    * (main.go:173-175). Expects (code_system, code, condition_id,
    * disease_id).
    */
  def loadDiseaseDim(raw: DataFrame): DataFrame =
    raw.select(
      col("code_system"), col("code"), col("condition_id"),
      CoreOps.sentinel(col("disease_id"), -999).as("disease_id"))

  private def firstOfType(tpe: String): Column =
    element_at(
      filter(col("entry"),
        e => e.getField("resource").getField("resourceType") === tpe), 1)
      .getField("resource")

  /** T7+T8+T10: per-bundle projection of the patient row and its condition
    * codes — single pass over the entry array, no explode yet.
    */
  def patientProjection(bundles: DataFrame, asOf: Column): DataFrame = {
    val p = firstOfType("Patient")
    bundles.select(
      p.getField("id").as("patientid"),
      p.getField("gender").as("gender"),
      CoreOps.ageYears(p.getField("birthDate"), asOf).as("age"),
      lit(1).as("agerange"), // hard-coded in the reference (bundle.go:90)
      // deceased: datetime present → true; else the bool as-is (tri-state,
      // null = no information = living for A1, bundle.go:91 + db.go:94-98)
      when(p.getField("deceasedDateTime").isNotNull, lit(true))
        .otherwise(p.getField("deceasedBoolean")).as("deceasedboolean"),
      element_at(p.getField("address"), 1).getField("city").as("city"),
      element_at(p.getField("address"), 1).getField("postalCode").as("zipcode"),
      transform(
        filter(col("entry"),
          e => e.getField("resource").getField("resourceType") === "Condition"),
        e => struct(
          element_at(e.getField("resource").getField("code").getField("coding"), 1)
            .getField("system").as("system"),
          element_at(e.getField("resource").getField("code").getField("coding"), 1)
            .getField("code").as("code"))).as("condcodes"))
  }

  /** T9+T11+T12+T13: dim joins, per-patient collect, dedup arrays —
    * producing the rawstat table (FIXTURES.md §3).
    */
  def build(
      bundles: DataFrame,
      cousubDim: DataFrame,
      diseaseDim: DataFrame,
      asOf: Column): DataFrame = {
    val patients = patientProjection(bundles, asOf)

    // T11: explode condition codes, broadcast-join the disease dim,
    // zero-value {0,0} on miss (bundle.go:104-105), regroup per patient.
    val conds = patients
      .select(col("patientid"), explode(col("condcodes")).as("cc"))
      .select(col("patientid"), col("cc.system").as("system"),
        col("cc.code").as("code"))
    val dDim = diseaseDim.select(
      col("code_system").as("dim_system"), col("code").as("dim_code"),
      col("condition_id"), col("disease_id"))
    val condJoined = CoreOps.dimJoin(
        conds, dDim,
        col("system") === col("dim_system") && col("code") === col("dim_code"),
        Map("condition_id" -> lit(0), "disease_id" -> lit(0)))
      .drop("dim_system", "dim_code")
    val perPatient = condJoined
      .groupBy(col("patientid"))
      .agg(
        collect_list(struct(
          col("system"), col("code"),
          col("condition_id").as("conditionid"),
          col("disease_id").as("diseaseid"))).as("conditions"))

    // T9: cousub broadcast join on city, zero-value "" on miss
    // (bundle.go:94-95); T13: distinct id arrays (order canonicalized —
    // the reference's order is Go-map-random, SURVEY §7.4-3).
    val located = CoreOps.dimJoin(
        patients.drop("condcodes"),
        cousubDim.withColumnRenamed("cs_name", "dim_city"),
        col("city") === col("dim_city"),
        Map("ct_fips" -> lit(""), "cs_fips" -> lit("")))
      .drop("dim_city")

    located
      .join(perPatient, Seq("patientid"), "left_outer")
      .withColumn("conditions",
        coalesce(col("conditions"),
          array().cast("array<struct<system:string,code:string,conditionid:int,diseaseid:int>>")))
      .select(
        col("patientid"),
        struct(
          col("ct_fips").as("countyid_fips"),
          col("cs_fips").as("subcountyid_fips"),
          col("city"), col("zipcode")).as("location"),
        col("gender"), col("agerange"), col("age"), col("deceasedboolean"),
        col("conditions"),
        CoreOps.distinctSorted(
          transform(col("conditions"), c => c.getField("conditionid")))
          .as("uniqueconditions"),
        CoreOps.distinctSorted(
          transform(col("conditions"), c => c.getField("diseaseid")))
          .as("uniquediseases"))
  }
}
