package graft.tools

import java.nio.file.{Files, Paths}

/** Generate a synthetic FHIR-bundle corpus for ingest-scale benchmarking
  * (dev tool — the oracle testdata stays driver-owned; this only feeds
  * `graft.fhir.FhirMain` throughput runs).
  *
  * Usage: runMain graft.tools.GenBundles <outDir> <nBundles>
  */
object GenBundles {

  private val cities =
    Seq("Springfield", "Shelbyville", "Ogden", "Agawam", "Quincy")
  private val codes = Seq(
    ("44054006", "Diabetes"), ("38341003", "Hypertension"),
    ("195662009", "Acute viral pharyngitis"), ("10509002", "Bronchitis"),
    ("271737000", "Anemia"))

  def bundleJson(i: Int): String = {
    val rnd = new scala.util.Random(i)
    val gender = if (rnd.nextBoolean()) "male" else "female"
    val birth = f"${1930 + rnd.nextInt(85)}%04d-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
    val city = cities(rnd.nextInt(cities.length))
    val deceased =
      if (rnd.nextInt(10) == 0) "\"deceasedBoolean\": true," else ""
    val nConds = rnd.nextInt(4)
    val conds = (0 until nConds).map { c =>
      val (code, disp) = codes(rnd.nextInt(codes.length))
      s"""    {
         |      "fullUrl": "urn:uuid:c$i-$c",
         |      "resource": {
         |        "resourceType": "Condition",
         |        "code": {"coding": [{"system": "http://snomed.info/sct", "code": "$code", "display": "$disp"}]},
         |        "subject": {"reference": "urn:uuid:p$i"}
         |      }
         |    }""".stripMargin
    }
    val encounters = (0 until 1 + rnd.nextInt(3)).map { e =>
      s"""    {
         |      "fullUrl": "urn:uuid:e$i-$e",
         |      "resource": {
         |        "resourceType": "Encounter",
         |        "status": "finished",
         |        "subject": {"reference": "urn:uuid:p$i"}
         |      }
         |    }""".stripMargin
    }
    val patient =
      s"""    {
         |      "fullUrl": "urn:uuid:p$i",
         |      "resource": {
         |        "resourceType": "Patient",
         |        "gender": "$gender",
         |        "birthDate": "$birth",
         |        $deceased
         |        "address": [{"city": "$city", "postalCode": "0${1000 + rnd.nextInt(999)}"}]
         |      }
         |    }""".stripMargin
    s"""{
       |  "resourceType": "Bundle",
       |  "type": "transaction",
       |  "entry": [
       |${(patient +: (conds ++ encounters)).mkString(",\n")}
       |  ]
       |}""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val n = args(1).toInt
    // shard into subdirs so the recursive scan (S1) is exercised
    (0 until n).foreach { i =>
      val dir = Paths.get(out, s"shard${i % 64}")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve(s"b$i.json"), bundleJson(i))
    }
    println(s"wrote $n bundles under $out")
  }
}
