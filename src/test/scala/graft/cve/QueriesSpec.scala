package graft.cve

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.CveOps

/** Specs for the five query families (cve_manager.py:387-577) over the
  * fixture-derived warehouse frames. */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val feed = Flatten.readFeed(spark, CveOps.FixtureFeed)
  private lazy val cvss = Flatten.cvss(feed).cache()
  private lazy val problems = Flatten.problems(feed).cache()
  private lazy val cpes = Flatten.cpes(feed).cache()
  private lazy val cwe = Warehouse.cweCatalog(spark, CveOps.FixtureCwe).cache()
  private lazy val view = Warehouse.cvssVsCpes(cvss, cpes)

  test("byCve: substring match on the id, 10 report columns") {
    val r = Queries.byCve(cvss, "2024-0001").collect()
    assert(r.length === 1)
    assert(r.head.getString(0) === "CVE-2024-0001")
    assert(r.head.length === 10)
  }

  test("cweLookup: CWE-<n> resolves via the dimension; non-numeric labels pass through") {
    val res = Queries.cweLookup(problems, cwe).collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(res("CWE-119") ===
      "Improper Restriction of Operations within the Bounds of a Memory Buffer")
    assert(res("NVD-CWE-noinfo") === "NVD-CWE-noinfo") // char-set strip leaves it intact
    assert(res("CWE-1104") === "CWE-1104") // numeric but absent from catalog
  }

  test("byScoreDate: disjunctive threshold lets a v2-only score qualify") {
    val ids = Queries.byScoreDate(cvss, 8.5, None).collect().map(_.getString(0)).toSet
    assert(ids === Set("CVE-2024-0001", "CVE-2020-0006", "CVE-2020-0007")) // 0007 is v2 9.0, no v3
  }

  test("byScoreDate: threshold and date floor are inclusive") {
    val atScore = Queries.byScoreDate(cvss, 7.1, None).collect().map(_.getString(0)).toSet
    assert(atScore.contains("CVE-2022-0005")) // base_score_3 == 7.1 exactly
    val atDate = Queries.byScoreDate(cvss, 7.0, Some("2020-02-29"))
      .collect().map(_.getString(0)).toSet
    assert(atDate.contains("CVE-2020-0006")) // published exactly 2020-02-29
  }

  test("cvssVsCpes view: 8 columns, vulnerable='False' rows excluded") {
    assert(view.columns.toSeq === Seq("cve", "base_score_3", "base_severity_3",
      "base_score", "severity", "cpe23uri", "description", "published_date"))
    val uris = view.select("cpe23uri").collect().map(_.getString(0)).toSet
    assert(!uris.contains("cpe:2.3:a:acme:widget:0.9:*:*:*:*:*:*:*"))
    assert(uris.contains("cpe:2.3:a:acme:widget:1.0:*:*:*:*:*:*:*"))
  }

  test("byCpe: substring + score filter over the view") {
    val rows = Queries.byCpe(view, "globex", 4.0, None).collect()
    assert(rows.map(_.getString(1)).toSet === Set("CVE-2023-0002"))
    assert(rows.length === 2) // two vulnerable globex URIs
  }

  test("byCwe: point lookup returns all 7 catalog columns; miss returns empty") {
    val hit = Queries.byCwe(cwe, 787).collect()
    assert(hit.length === 1 && hit.head.getString(1) === "Out-of-bounds Write")
    assert(Queries.byCwe(cwe, 99999).count() === 0)
  }

  test("cpesFor: only vulnerable URIs for the CVE") {
    val uris = Queries.cpesFor(cpes, "2024-0001").collect().map(_.getString(0))
    assert(uris.toSeq === Seq("cpe:2.3:a:acme:widget:1.0:*:*:*:*:*:*:*"))
  }
}
