package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.cve.{Flatten, NvdSchema, Queries, Warehouse}

/** The reference's actual surface — NVD ingest flatten + the five CVE query
  * families — instantiated on the checked-in NVD 1.1 fixture feed
  * (src/test/resources/nvd/), oracle-checked by DuckDB reading the SAME
  * fixture via read_json/read_csv.
  *
  * Booleans are rendered as 'True'/'False' strings at the comparison
  * boundary (the reference's Python-str rendering, cve_manager.py:258) —
  * also sidesteps pandas' None-vs-NaN null-boolean mismatch between the
  * parquet dump and DuckDB's result frame.
  */
object CveOps {

  val FixtureFeed = "/root/repo/src/test/resources/nvd/nvdcve-1.1-fixture.json"
  val FixtureCwe = "/root/repo/src/test/resources/nvd/cwe_catalog.csv"

  // ── shared DuckDB CTE fragments (the oracle's twin of Flatten) ──

  private val itCte =
    s"it AS (SELECT unnest(CVE_Items) AS it FROM read_json('$FixtureFeed'))"

  private val cvssCte =
    """cvss AS (
      |  SELECT it.cve.CVE_data_meta.ID AS cve,
      |         it.impact.baseMetricV3.cvssV3.attackComplexity AS attack_complexity_3,
      |         it.impact.baseMetricV3.cvssV3.attackVector AS attack_vector_3,
      |         it.impact.baseMetricV3.cvssV3.availabilityImpact AS availability_impact_3,
      |         it.impact.baseMetricV3.cvssV3.confidentialityImpact AS confidentiality_impact_3,
      |         it.impact.baseMetricV3.cvssV3.integrityImpact AS integrity_impact_3,
      |         it.impact.baseMetricV3.cvssV3.privilegesRequired AS privileges_required_3,
      |         it.impact.baseMetricV3.cvssV3.scope AS scope_3,
      |         it.impact.baseMetricV3.cvssV3.userInteraction AS user_interaction_3,
      |         it.impact.baseMetricV3.cvssV3.vectorString AS vector_string_3,
      |         it.impact.baseMetricV3.exploitabilityScore AS exploitability_score_3,
      |         it.impact.baseMetricV3.impactScore AS impact_score_3,
      |         it.impact.baseMetricV3.cvssV3.baseScore AS base_score_3,
      |         it.impact.baseMetricV3.cvssV3.baseSeverity AS base_severity_3,
      |         it.impact.baseMetricV2.cvssV2.accessComplexity AS access_complexity,
      |         it.impact.baseMetricV2.cvssV2.accessVector AS access_vector,
      |         it.impact.baseMetricV2.cvssV2.authentication AS authentication,
      |         it.impact.baseMetricV2.cvssV2.availabilityImpact AS availability_impact,
      |         it.impact.baseMetricV2.cvssV2.confidentialityImpact AS confidentiality_impact,
      |         it.impact.baseMetricV2.cvssV2.integrityImpact AS integrity_impact,
      |         it.impact.baseMetricV2.obtainAllPrivilege AS obtain_all_privileges,
      |         it.impact.baseMetricV2.obtainOtherPrivilege AS obtain_other_privileges,
      |         it.impact.baseMetricV2.obtainUserPrivilege AS obtain_user_privileges,
      |         it.impact.baseMetricV2.userInteractionRequired AS user_interaction_required,
      |         it.impact.baseMetricV2.cvssV2.vectorString AS vector_string,
      |         it.impact.baseMetricV2.exploitabilityScore AS exploitability_score,
      |         it.impact.baseMetricV2.impactScore AS impact_score,
      |         it.impact.baseMetricV2.cvssV2.baseScore AS base_score,
      |         it.impact.baseMetricV2.severity AS severity,
      |         regexp_replace(array_to_string([d.value for d in it.cve.description.description_data], ''), '[\r\n\t]', ' ', 'g') AS description,
      |         CAST(substr(it.publishedDate, 1, 10) AS DATE) AS published_date,
      |         CAST(substr(it.lastModifiedDate, 1, 10) AS DATE) AS last_modified_date
      |  FROM it)""".stripMargin

  private val problemsCte =
    """pr AS (
      |  SELECT cve, d.value AS problem FROM (
      |    SELECT cve, unnest(pd.description) AS d FROM (
      |      SELECT it.cve.CVE_data_meta.ID AS cve,
      |             unnest(it.cve.problemtype.problemtype_data) AS pd
      |      FROM it)))""".stripMargin

  private val cpeCte =
    """cpe AS (
      |  SELECT cve, m.cpe23Uri AS cpe23uri,
      |         CASE WHEN m.vulnerable THEN 'True' ELSE 'False' END AS vulnerable
      |  FROM (
      |    SELECT cve, unnest(n.cpe_match) AS m
      |    FROM (SELECT it.cve.CVE_data_meta.ID AS cve, unnest(it.configurations.nodes) AS n FROM it) nodes
      |    WHERE n.children IS NULL
      |    UNION ALL
      |    SELECT cve, unnest(c.cpe_match) AS m
      |    FROM (SELECT cve, unnest(n.children) AS c
      |          FROM (SELECT it.cve.CVE_data_meta.ID AS cve, unnest(it.configurations.nodes) AS n FROM it) nodes
      |          WHERE n.children IS NOT NULL))
      |  WHERE m.cpe23Uri IS NOT NULL)""".stripMargin

  private val cweCte =
    s"""cwec AS (
       |  SELECT CAST("CWE-ID" AS INT) AS cwe_id, Name AS name,
       |         Description AS description,
       |         "Extended Description" AS extended_description,
       |         "Modes Of Introduction" AS modes_of_introduction,
       |         "Common Consequences" AS common_consequences,
       |         "Potential Mitigations" AS potential_mitigations
       |  FROM read_csv('$FixtureCwe', header=true))""".stripMargin

  private val viewCte =
    """v AS (
      |  SELECT cvss.cve, cvss.base_score_3, cvss.base_severity_3,
      |         cvss.base_score, cvss.severity, cpe.cpe23uri,
      |         cvss.description, cvss.published_date
      |  FROM cpe, cvss WHERE cpe.cve = cvss.cve AND cpe.vulnerable = 'True')""".stripMargin

  // ── Spark-side shared frames ──

  private def feed(s: org.apache.spark.sql.SparkSession): DataFrame =
    Flatten.readFeed(s, FixtureFeed)

  /** Render boolean columns as 'True'/'False' text (comparison boundary). */
  private def renderBools(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map { f =>
      if (f.dataType.typeName == "boolean")
        Warehouse.pythonBool(col(f.name)).as(f.name)
      else col(f.name)
    }.toSeq: _*)

  private val boolCols = Seq("obtain_all_privileges", "obtain_other_privileges",
    "obtain_user_privileges", "user_interaction_required")

  val defs: Seq[QueryDef] = Seq(

    // ── S4+P1-P4+X1/X5: the 32-column cvss flatten with null-cascade ──
    QueryDef(
      "q36_nvd_flatten_cvss",
      (s, _) => renderBools(Flatten.cvss(feed(s))).orderBy("cve"),
      Some {
        val renderedCols = NvdSchema.cvssCols.map {
          case c if boolCols.contains(c) =>
            s"CASE WHEN $c THEN 'True' WHEN NOT $c THEN 'False' END AS $c"
          case c => c
        }.mkString(", ")
        s"WITH $itCte,\n$cvssCte\nSELECT $renderedCols FROM cvss ORDER BY cve"
      }),

    // ── G1: problem explode ──
    QueryDef(
      "q37_nvd_problems",
      (s, _) => Flatten.problems(feed(s)).orderBy("cve", "problem"),
      Some(s"WITH $itCte,\n$problemsCte\nSELECT cve, problem FROM pr ORDER BY cve, problem")),

    // ── G2+F7: CPE config flatten (direct ∪ children, null-skip) ──
    QueryDef(
      "q38_nvd_cpes",
      (s, _) => Flatten.cpes(feed(s)).orderBy("cve", "cpe23uri", "vulnerable"),
      Some(s"WITH $itCte,\n$cpeCte\nSELECT cve, cpe23uri, vulnerable FROM cpe ORDER BY cve, cpe23uri, vulnerable")),

    // ── EP2: CVE point report (F1 + O1) ──
    QueryDef(
      "q39_cve_point",
      (s, _) => Queries.byCve(Flatten.cvss(feed(s)), "2024-0001")
        .orderBy("cve").limit(1),
      Some(s"""WITH $itCte,
              |$cvssCte
              |SELECT cve, vector_string_3, base_score_3, base_severity_3,
              |       vector_string, base_score, severity, description,
              |       published_date, last_modified_date
              |FROM cvss WHERE cve LIKE '%2024-0001%' ORDER BY cve LIMIT 1""".stripMargin)),

    // ── EP4: score+date listing (F2 + F3) ──
    QueryDef(
      "q40_cve_score_date",
      (s, _) => Queries.byScoreDate(Flatten.cvss(feed(s)), 7.0, Some("2020-01-01"))
        .orderBy("cve"),
      Some(s"""WITH $itCte,
              |$cvssCte
              |SELECT cve, base_score_3, vector_string_3, base_score,
              |       vector_string, published_date
              |FROM cvss
              |WHERE (base_score_3 >= 7.0 OR base_score >= 7.0)
              |  AND published_date >= CAST('2020-01-01' AS DATE)
              |ORDER BY cve""".stripMargin)),

    // ── EP3: filtered listing over the cvss_vs_cpes view (J1 + J3 + F5) ──
    QueryDef(
      "q41_cpe_view",
      (s, _) => {
        val f = feed(s)
        val view = Warehouse.cvssVsCpes(Flatten.cvss(f), Flatten.cpes(f))
        Queries.byCpe(view, "acme", 7.0, None).orderBy("cpe23uri", "cve")
      },
      Some(s"""WITH $itCte,
              |$cvssCte,
              |$cpeCte,
              |$viewCte
              |SELECT cpe23uri, cve, base_score_3, base_score, published_date
              |FROM v
              |WHERE cpe23uri LIKE '%acme%'
              |  AND (base_score_3 >= 7.0 OR base_score >= 7.0)
              |ORDER BY cpe23uri, cve""".stripMargin)),

    // ── J2: CWE-name lookup join with char-set strip (S8 source) ──
    QueryDef(
      "q42_cwe_lookup",
      (s, _) => Queries.cweLookup(
          Flatten.problems(feed(s)), Warehouse.cweCatalog(s, FixtureCwe))
        .orderBy("cve", "problem"),
      Some(s"""WITH $itCte,
              |$problemsCte,
              |$cweCte
              |SELECT pr.cve, pr.problem, coalesce(c.name, pr.problem) AS resolved
              |FROM pr LEFT JOIN cwec c
              |  ON (CASE WHEN regexp_matches(regexp_replace(pr.problem, '^[CWE-]+', ''), '^[0-9]+$$')
              |           THEN CAST(regexp_replace(pr.problem, '^[CWE-]+', '') AS INT) END) = c.cwe_id
              |ORDER BY cve, problem""".stripMargin)),

    // ── EP5: CWE info point lookup (F6 + O1, all 7 catalog cols) ──
    QueryDef(
      "q43_cwe_info",
      (s, _) => Queries.byCwe(Warehouse.cweCatalog(s, FixtureCwe), 119)
        .orderBy("cwe_id").limit(1),
      Some(s"""WITH $cweCte
              |SELECT * FROM cwec WHERE cwe_id = 119 ORDER BY cwe_id LIMIT 1""".stripMargin)),

    // ── S5: feed-envelope metadata probe (total-ordered: a multi-file feed
    //    dir yields one row per feed, and the hash-compare needs an order) ──
    QueryDef(
      "q44_feed_meta",
      (s, _) => Flatten.feedMetadata(feed(s)).orderBy("feed_timestamp"),
      Some(s"""SELECT CVE_data_timestamp AS feed_timestamp,
              |       CVE_data_version AS feed_version,
              |       CVE_data_format AS feed_format,
              |       CVE_data_numberOfCVEs AS feed_count,
              |       CVE_data_type AS feed_type
              |FROM read_json('$FixtureFeed')
              |ORDER BY feed_timestamp""".stripMargin))
  )
}
