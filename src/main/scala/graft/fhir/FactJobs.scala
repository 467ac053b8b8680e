package graft.fhir

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.CoreOps

/** The three stat rollups (reference db.go:79-358) as one parameterized
  * function each — CalculatePopulationFacts, CalculateDiseaseFacts,
  * CalculateConditionFacts were literal near-copies in the reference
  * (SURVEY §3.3); here they are three calls into
  * [[CoreOps.factRollup]] plus A7 column shaping in the COPY column
  * order (db.go:139/235/330).
  *
  * Counts come out of Spark as Long (the 100 TB posture, SURVEY §7.4-6);
  * a JDBC sink casting to int32 reproduces the reference's fact-table
  * types exactly.
  */
object FactJobs {

  private val csFips = "cs_fips"

  private def withCsFips(rawstat: DataFrame): DataFrame =
    rawstat.withColumn(csFips, col("location.subcountyid_fips"))

  /** db.go:79-167: group (cs_fips, agerange). */
  def populationFacts(rawstat: DataFrame): DataFrame =
    CoreOps.factRollup(
      withCsFips(rawstat), "deceasedboolean", "gender",
      Seq(csFips, "agerange"))
      .select(col(csFips), col("agerange").as("age_id"),
        col("pop"), col("pop_male"), col("pop_female"))

  /** db.go:171-262: unwind uniquediseases, keep >0, group
    * (cs_fips, disease_id, agerange).
    */
  def diseaseFacts(rawstat: DataFrame): DataFrame =
    CoreOps.factRollup(
      withCsFips(rawstat), "deceasedboolean", "gender",
      Seq(csFips, "agerange"),
      explodeCol = Some("uniquediseases"), explodedAs = "disease_id")
      .select(col(csFips), col("disease_id"), col("agerange").as("age_id"),
        col("pop"), col("pop_male"), col("pop_female"))

  /** db.go:266-358: unwind uniqueconditions, keep >0, group
    * (cs_fips, condition_id, agerange).
    */
  def conditionFacts(rawstat: DataFrame): DataFrame =
    CoreOps.factRollup(
      withCsFips(rawstat), "deceasedboolean", "gender",
      Seq(csFips, "agerange"),
      explodeCol = Some("uniqueconditions"), explodedAs = "condition_id")
      .select(col(csFips), col("condition_id"), col("agerange").as("age_id"),
        col("pop"), col("pop_male"), col("pop_female"))
}
