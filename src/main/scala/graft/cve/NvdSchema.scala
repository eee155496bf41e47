package graft.cve

import org.apache.spark.sql.types._

/** Explicit StructType for the NVD 1.1 JSON feed — exactly the paths the
  * reference consumes (cve_manager.py:240-317; FIXTURES.md §1), plus the
  * warehouse schemas it produces (DDL cve_manager.py:22-91).
  *
  * All fields nullable: absent branches (e.g. a missing `baseMetricV3`)
  * surface as nulls, which IS the reference's try/except null-cascade
  * (cve_manager.py:257-278) — no imperative fallback shapes needed.
  */
object NvdSchema {

  private def s(name: String) = StructField(name, StringType)
  private def d(name: String) = StructField(name, DoubleType)
  private def b(name: String) = StructField(name, BooleanType)

  val cvssV3: StructType = StructType(Seq(
    s("attackComplexity"), s("attackVector"), s("availabilityImpact"),
    s("confidentialityImpact"), s("integrityImpact"), s("privilegesRequired"),
    s("scope"), s("userInteraction"), s("vectorString"),
    d("baseScore"), s("baseSeverity")))

  val cvssV2: StructType = StructType(Seq(
    s("accessComplexity"), s("accessVector"), s("authentication"),
    s("availabilityImpact"), s("confidentialityImpact"), s("integrityImpact"),
    s("vectorString"), d("baseScore")))

  val baseMetricV3: StructType = StructType(Seq(
    StructField("cvssV3", cvssV3),
    d("exploitabilityScore"), d("impactScore")))

  val baseMetricV2: StructType = StructType(Seq(
    StructField("cvssV2", cvssV2),
    s("severity"), d("exploitabilityScore"), d("impactScore"),
    b("obtainAllPrivilege"), b("obtainOtherPrivilege"),
    b("obtainUserPrivilege"), b("userInteractionRequired")))

  val cpeMatch: StructType = StructType(Seq(s("cpe23Uri"), b("vulnerable")))

  val configNode: StructType = StructType(Seq(
    StructField("cpe_match", ArrayType(cpeMatch)),
    StructField("children",
      ArrayType(StructType(Seq(StructField("cpe_match", ArrayType(cpeMatch))))))))

  private val valueArr =
    ArrayType(StructType(Seq(s("value"))))

  val cveBlock: StructType = StructType(Seq(
    StructField("CVE_data_meta", StructType(Seq(s("ID")))),
    StructField("problemtype", StructType(Seq(
      StructField("problemtype_data",
        ArrayType(StructType(Seq(StructField("description", valueArr)))))))),
    StructField("description", StructType(Seq(
      StructField("description_data", valueArr))))))

  val item: StructType = StructType(Seq(
    StructField("cve", cveBlock),
    StructField("configurations", StructType(Seq(
      StructField("nodes", ArrayType(configNode))))),
    StructField("impact", StructType(Seq(
      StructField("baseMetricV3", baseMetricV3),
      StructField("baseMetricV2", baseMetricV2)))),
    s("publishedDate"), s("lastModifiedDate")))

  /** Feed envelope: self-describing metadata + the item array
    * (cve_manager.py:240-245). */
  val feed: StructType = StructType(Seq(
    s("CVE_data_type"), s("CVE_data_format"), s("CVE_data_version"),
    s("CVE_data_numberOfCVEs"), s("CVE_data_timestamp"),
    StructField("CVE_Items", ArrayType(item))))

  /** Warehouse table schemas (DDL cve_manager.py:22-77), trimmed-string
    * policy per SURVEY.md §7.4(1): character(N) → StringType. */
  val cvssTable: StructType = StructType(
    Seq(s("cve")) ++
      Seq("attack_complexity_3", "attack_vector_3", "availability_impact_3",
        "confidentiality_impact_3", "integrity_impact_3",
        "privileges_required_3", "scope_3", "user_interaction_3",
        "vector_string_3").map(s) ++
      Seq("exploitability_score_3", "impact_score_3", "base_score_3").map(d) ++
      Seq(s("base_severity_3")) ++
      Seq("access_complexity", "access_vector", "authentication",
        "availability_impact", "confidentiality_impact",
        "integrity_impact").map(s) ++
      Seq("obtain_all_privileges", "obtain_other_privileges",
        "obtain_user_privileges", "user_interaction_required").map(b) ++
      Seq(s("vector_string")) ++
      Seq("exploitability_score", "impact_score", "base_score").map(d) ++
      Seq(s("severity"), s("description"),
        StructField("published_date", DateType),
        StructField("last_modified_date", DateType)))

  val cpeTable: StructType =
    StructType(Seq(s("cve"), s("cpe23uri"), s("vulnerable")))

  val cveProblemTable: StructType =
    StructType(Seq(s("cve"), s("problem")))

  val cweTable: StructType = StructType(Seq(
    StructField("cwe_id", IntegerType), s("name"), s("description"),
    s("extended_description"), s("modes_of_introduction"),
    s("common_consequences"), s("potential_mitigations")))

  /** Warehouse `cvss` column names in DDL order (cve_manager.py:23-56). */
  val cvssCols: Seq[String] = Seq(
    "cve",
    "attack_complexity_3", "attack_vector_3", "availability_impact_3",
    "confidentiality_impact_3", "integrity_impact_3", "privileges_required_3",
    "scope_3", "user_interaction_3", "vector_string_3",
    "exploitability_score_3", "impact_score_3", "base_score_3", "base_severity_3",
    "access_complexity", "access_vector", "authentication",
    "availability_impact", "confidentiality_impact", "integrity_impact",
    "obtain_all_privileges", "obtain_other_privileges", "obtain_user_privileges",
    "user_interaction_required", "vector_string",
    "exploitability_score", "impact_score", "base_score", "severity",
    "description", "published_date", "last_modified_date")
}
