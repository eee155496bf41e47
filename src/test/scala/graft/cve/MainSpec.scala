package graft.cve

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.CveOps

/** CLI dispatcher specs (D5): flag parsing, the reference's mode precedence
  * (`-cpe` elif `-cwe` elif `-cve`/`-sc`, cve_manager.py:668-679), and an
  * end-to-end ingest→query→export run. */
class MainSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def runCli(args: String*): Seq[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    Main.run(spark, Main.parse(args), buf += _)
    buf.toSeq
  }

  test("parse: reference flag names, defaults, and value flags") {
    val o = Main.parse(Seq("-p", "-csv", "-i", "in/", "-o", "out/", "-sc", "9.5",
      "-dt", "2020-01-01", "-db", "mydb", "-y", "2019"))
    assert(o.process && o.csv && !o.idb)
    assert(o.input === "in/" && o.results === "out/" && o.database === "mydb")
    assert(o.score === 9.5 && o.date === Some("2020-01-01") && o.year === Some("2019"))
    assert(Main.parse(Nil) === Main.Opts())
  }

  test("parse: unknown/vestigial flags are swallowed with their value") {
    val o = Main.parse(Seq("-u", "postgres", "-server", "localhost", "-cve", "2024"))
    assert(o.cve === Some("2024"))
  }

  test("parse: value flags fail fast on a missing value or bad score") {
    assertThrows[IllegalArgumentException](Main.parse(Seq("-sc", "-p")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("-cve")))
    assertThrows[IllegalArgumentException](Main.parse(Seq("-sc", "abc")))
  }

  test("non-numeric -cwe reports the reference's hint instead of crashing") {
    val outLines = runCli("-db", "nonexistent_db", "-cwe", "CWE-119")
    assert(outLines.exists(_.contains("Hint: Use just the number")))
  }

  test("query against a missing warehouse reports, not crashes (print-and-continue)") {
    val outLines = runCli("-db", "graft_no_such_db", "-cve", "2024-0001")
    assert(outLines.exists(_ === "Error while Querying Database"))
  }

  test("no actionable flags -> usage hint") {
    assert(runCli().exists(_.contains("Choose an option")))
  }

  test("end-to-end: ingest fixture -> warehouse -> every query mode -> export") {
    val db = "graft_cli_db"
    val results = Files.createTempDirectory("cliout").toString + "/"
    val in = Files.createTempDirectory("cliin").toString
    Files.copy(new java.io.File(CveOps.FixtureFeed).toPath,
      new java.io.File(s"$in/nvdcve-1.1-2024.json").toPath)
    try {
      val ingest = runCli("-p", "-csv", "-idb", "-i", in, "-o", results,
        "-db", db, "-icwe", CveOps.FixtureCwe)
      // per-file envelope report precedes the metadata (cve_manager.py:235)
      assert(ingest.exists(_ === "\nProcessing nvdcve-1.1-2024.json"))
      assert(ingest.exists(_.startsWith("CVE_data_number of CVEs: 8")))
      assert(new java.io.File(s"$results/cve_cvss_scores.csv").isDirectory)

      val point = runCli("-db", db, "-cve", "2024-0001")
      assert(point.exists(_.contains("CVE-2024-0001")))
      assert(point.exists(_.contains("Out-of-bounds Write"))) // resolved CWE name

      val listing = runCli("-db", db, "-sc", "8.5")
      assert(listing.count(_.startsWith("CVE-")) === 3)

      val cpeOut = runCli("-db", db, "-cpe", "globex", "-sc", "4", "-csv", "-o", results)
      assert(cpeOut.exists(_.contains("CVE-2023-0002")))
      // a flat FILE at the exact derived path (cve_manager.py:525-529)
      assert(new java.io.File(s"$results/globex_4_False.csv").isFile)

      val cweOut = runCli("-db", db, "-cwe", "119")
      assert(cweOut.exists(_.contains("Improper Restriction of Operations")))
    } finally Warehouse.dropDatabase(spark, db)
  }

  test("end-to-end over JDBC (--jdbc-url): load Derby -> every query mode -> refresh semantics") {
    val url = graft.DerbyTestHome.freshDbUrl("clijdbc")
    val results = Files.createTempDirectory("clijdbcout").toString + "/"
    val in = Files.createTempDirectory("clijdbcin").toString
    Files.copy(new java.io.File(CveOps.FixtureFeed).toPath,
      new java.io.File(s"$in/nvdcve-1.1-2024.json").toPath)

    // D3 first: empty schema, then the bulk load refreshes it in place —
    // the reference's -ct then -p -idb workflow (cve_manager.py:147,335).
    val ct = runCli("-ct", "-jdbc", url)
    assert(ct.exists(_.contains("Creating the necessary schema")))
    val ingest = runCli("-p", "-idb", "-i", in, "-jdbc", url,
      "-icwe", CveOps.FixtureCwe)
    assert(ingest.exists(_.startsWith("CVE_data_number of CVEs: 8")))

    // every query family reads back from the DATABASE store
    val point = runCli("-jdbc", url, "-cve", "2024-0001")
    assert(point.exists(_.contains("CVE-2024-0001")))
    assert(point.exists(_.contains("Out-of-bounds Write"))) // resolved CWE name

    val listing = runCli("-jdbc", url, "-sc", "8.5")
    assert(listing.count(_.startsWith("CVE-")) === 3)

    val cpeOut = runCli("-jdbc", url, "-cpe", "globex", "-sc", "4", "-csv", "-o", results)
    assert(cpeOut.exists(_.contains("CVE-2023-0002"))) // via the DB view
    assert(new java.io.File(s"$results/globex_4_False.csv").isFile)

    val cweOut = runCli("-jdbc", url, "-cwe", "119")
    assert(cweOut.exists(_.contains("Improper Restriction of Operations")))

    // D4 twin: -tr truncates the facts in place; cwe dimension survives
    runCli("-tr", "-jdbc", url)
    val empty = runCli("-jdbc", url, "-sc", "0.1")
    assert(!empty.exists(_.startsWith("CVE-")))
    val cweStill = runCli("-jdbc", url, "-cwe", "119")
    assert(cweStill.exists(_.contains("Improper Restriction of Operations")))

    // missing store reports, not crashes (SQLException path)
    val gone = runCli("-jdbc", graft.DerbyTestHome.freshDbUrl("clijdbc2"),
      "-cve", "2024-0001")
    assert(gone.exists(_ === "Error while Querying Database"))

    // D2 twin: drop removes view + tables
    runCli("-dd", "-jdbc", url)
    val dropped = runCli("-jdbc", url, "-sc", "0.1")
    assert(dropped.exists(_ === "Error while Querying Database"))
  }

  test("precedence: -cpe wins over -cwe and -cve; -cwe wins over -cve") {
    val db = "graft_cli_db2"
    val in = Files.createTempDirectory("cliin2").toString
    Files.copy(new java.io.File(CveOps.FixtureFeed).toPath,
      new java.io.File(s"$in/nvdcve-1.1-2024.json").toPath)
    try {
      runCli("-p", "-idb", "-i", in, "-db", db, "-icwe", CveOps.FixtureCwe)
      val o1 = runCli("-db", db, "-cpe", "acme", "-cwe", "119", "-cve", "2024", "-sc", "7")
      assert(o1.exists(_ === "CPE queries") && !o1.contains("CWE queries"))
      val o2 = runCli("-db", db, "-cwe", "119", "-cve", "2024")
      assert(o2.exists(_ === "CWE queries") && !o2.contains("CVE queries"))
      // -sc > 0 alone triggers the CVE listing path (cve_manager.py:676)
      val o3 = runCli("-db", db, "-sc", "8.5")
      assert(o3.exists(_ === "CVE queries"))
    } finally Warehouse.dropDatabase(spark, db)
  }
}
