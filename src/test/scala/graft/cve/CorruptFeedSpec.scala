package graft.cve

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** G3 — malformed-input fallthrough (cve_manager.py:316-317): a CVE whose
  * `configurations` doesn't parse loses only its CPE rows; its cvss row and
  * problems survive, and neighboring CVEs are untouched. */
class CorruptFeedSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val path = "/root/repo/src/test/resources/nvd/nvdcve-1.1-corrupt.json"
  private lazy val feed = Flatten.readFeed(spark, path)

  test("corrupt configurations: cvss and problems survive for ALL items") {
    assert(Flatten.cvss(feed).count() === 3)
    assert(Flatten.problems(feed).count() === 3)
  }

  test("corrupt configurations: only the malformed CVE loses its CPE rows") {
    val byCve = Flatten.cpes(feed).collect().groupBy(_.getString(0))
    assert(!byCve.contains("CVE-2024-9002")) // the malformed one
    assert(byCve("CVE-2024-9001").length === 1)
    assert(byCve("CVE-2024-9003").length === 1)
  }
}
