package graft.cve

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.CveOps

/** Unit specs for the ingest flattener against the checked-in NVD fixture:
  * the 4 null-cascade shapes (cve_manager.py:257-278), problem explode
  * (280-284), and the direct/children CPE config flatten (285-317). */
class FlattenSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val feed = Flatten.readFeed(spark, CveOps.FixtureFeed)
  private lazy val cvss = Flatten.cvss(feed).cache()
  private lazy val problems = Flatten.problems(feed).cache()
  private lazy val cpes = Flatten.cpes(feed).cache()

  private def row(cve: String): Row =
    cvss.filter(s"cve = '$cve'").collect().head

  test("cvss flatten: one row per CVE item, 32 DDL-ordered columns") {
    assert(cvss.count() === 8)
    assert(cvss.columns.toSeq === NvdSchema.cvssCols)
  }

  test("null-cascade (a): both metric blocks present") {
    val r = row("CVE-2024-0001")
    assert(r.getAs[String]("attack_complexity_3") === "LOW")
    assert(r.getAs[Double]("base_score_3") === 9.8)
    assert(r.getAs[String]("base_severity_3") === "CRITICAL")
    assert(r.getAs[Double]("base_score") === 7.5)
    assert(r.getAs[String]("severity") === "HIGH")
    assert(r.getAs[Boolean]("obtain_all_privileges") === false)
    assert(r.getAs[Boolean]("user_interaction_required") === false)
  }

  test("null-cascade (b): baseMetricV3 absent nulls exactly the 13 v3 columns") {
    val r = row("CVE-2023-0002")
    val v3Cols = NvdSchema.cvssCols.slice(1, 14)
    v3Cols.foreach(c => assert(r.getAs[Any](c) === null, s"expected null $c"))
    assert(r.getAs[Double]("base_score") === 5.0)
    assert(r.getAs[Boolean]("obtain_user_privileges") === true)
    assert(r.getAs[String]("description") === "Authentication bypass in the admin console.")
  }

  test("null-cascade (c): baseMetricV2 absent nulls exactly the 15 v2 columns") {
    val r = row("CVE-2021-0003")
    val v2Cols = NvdSchema.cvssCols.slice(14, 29)
    v2Cols.foreach(c => assert(r.getAs[Any](c) === null, s"expected null $c"))
    assert(r.getAs[Double]("base_score_3") === 4.3)
  }

  test("null-cascade (d): neither block -> all 28 metric columns null, id/desc/dates kept") {
    val r = row("CVE-2019-0004")
    NvdSchema.cvssCols.slice(1, 29).foreach(c =>
      assert(r.getAs[Any](c) === null, s"expected null $c"))
    assert(r.getAs[String]("description").nonEmpty)
    assert(r.getAs[java.sql.Date]("published_date").toString === "2019-11-20")
  }

  test("null-cascade (e): missing userInteractionRequired nulls only that column") {
    val r = row("CVE-2022-0005")
    assert(r.getAs[Any]("user_interaction_required") === null)
    assert(r.getAs[Boolean]("obtain_other_privileges") === true)
    assert(r.getAs[Double]("base_score_3") === 7.1) // v3 block untouched
    assert(r.getAs[Double]("base_score") === 6.5)
  }

  test("description: in-order concat of all description_data values, CR/LF/TAB scrubbed") {
    val d = row("CVE-2024-0001").getAs[String]("description")
    assert(d === "Buffer overflow in the packet parser allows remote code execution.")
    assert(!d.exists(c => c == '\n' || c == '\r' || c == '\t'))
  }

  test("dates: date part of the feed timestamp string, UTC") {
    val r = row("CVE-2024-0001")
    assert(r.getAs[java.sql.Date]("published_date").toString === "2024-01-15")
    assert(r.getAs[java.sql.Date]("last_modified_date").toString === "2024-02-01")
  }

  test("problems explode: one row per (cve, label); empty description lists vanish") {
    assert(problems.count() === 9)
    assert(problems.filter("cve = 'CVE-2019-0004'").count() === 0)
    assert(problems.filter("cve = 'CVE-2024-0008'").count() === 2) // two problemtype_data entries
    assert(problems.filter("problem = 'NVD-CWE-noinfo'").count() === 1)
  }

  test("cpes: direct nodes emit their cpe_match rows with Python-str booleans") {
    val rows = cpes.filter("cve = 'CVE-2024-0001'").collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(rows === Set(
      ("cpe:2.3:a:acme:widget:1.0:*:*:*:*:*:*:*", "True"),
      ("cpe:2.3:a:acme:widget:0.9:*:*:*:*:*:*:*", "False")))
  }

  test("cpes: a node with children contributes ONLY its children's matches") {
    assert(cpes.filter("cve = 'CVE-2023-0002'").count() === 3)
  }

  test("cpes: entries without cpe23Uri are skipped (guarded existence)") {
    assert(cpes.filter("cve = 'CVE-2022-0005'").count() === 1)
  }

  test("cpes: nodes with neither children nor cpe_match, and empty children, emit nothing") {
    assert(cpes.filter("cve = 'CVE-2020-0006'").count() === 1) // bare node ignored
    assert(cpes.filter("cve = 'CVE-2024-0008'").count() === 0) // children: []
  }
}
