package graft.cve

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.CveOps

/** CSV source/sink and catalog specs: byte-exact reference headers
  * (cve_manager.py:227-229), positional CWE projection (591-599), derived
  * export filenames (467,525), and the D1-D4 catalog lifecycle. */
class WarehouseSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val feed = Flatten.readFeed(spark, CveOps.FixtureFeed)

  private def firstLine(dir: String): String = {
    val part = new File(dir).listFiles()
      .find(f => f.getName.startsWith("part") && f.getName.endsWith(".csv")).get
    val src = scala.io.Source.fromFile(part, "UTF-8")
    try src.getLines().next() finally src.close()
  }

  private def dataLines(dir: String): Seq[String] = {
    val parts = new File(dir).listFiles()
      .filter(f => f.getName.startsWith("part") && f.getName.endsWith(".csv"))
    parts.flatMap { p =>
      val src = scala.io.Source.fromFile(p, "UTF-8")
      try src.getLines().drop(1).toList finally src.close()
    }.toSeq
  }

  test("cweCatalog: positional projection 0,1,4,5,11,14,16 with typed key") {
    val cwe = Warehouse.cweCatalog(spark, CveOps.FixtureCwe)
    assert(cwe.columns.toSeq === Seq("cwe_id", "name", "description",
      "extended_description", "modes_of_introduction", "common_consequences",
      "potential_mitigations"))
    val r20 = cwe.filter("cwe_id = 20").collect().head
    // quoted field with embedded comma survives the csv parse
    assert(r20.getAs[String]("description") ===
      "The product receives input, but it does not validate it correctly.")
    // quoted field with embedded double-quotes
    assert(r20.getAs[String]("potential_mitigations").contains("\"allowlist\""))
    // quoted field with an embedded newline
    val r119 = cwe.filter("cwe_id = 119").collect().head
    assert(r119.getAs[String]("extended_description").contains("\n"))
  }

  test("tab-CSV sinks: byte-exact reference header rows") {
    val out = Files.createTempDirectory("whcsv").toString
    Warehouse.writeWarehouseCsvs(Flatten.cvss(feed), Flatten.problems(feed),
      Flatten.cpes(feed), out, singleFile = true)
    assert(firstLine(s"$out/cve_cvss_scores.csv") ===
      Warehouse.CvssHeader.mkString("\t"))
    assert(firstLine(s"$out/cve_related_problems.csv") === "CVE\tProblem")
    assert(firstLine(s"$out/cve_cpes.csv") === "CVE\tcpe23Uri\tVulnerable")
  }

  test("tab-CSV cvss sink: Python-str booleans, empty-string nulls, str(float) scores") {
    val out = Files.createTempDirectory("whcsv2").toString
    Warehouse.writeWarehouseCsvs(Flatten.cvss(feed), Flatten.problems(feed),
      Flatten.cpes(feed), out, singleFile = true)
    val lines = dataLines(s"$out/cve_cvss_scores.csv")
    assert(lines.size === 8)
    val full = lines.find(_.startsWith("CVE-2024-0001\t")).get.split("\t", -1)
    assert(full(20) === "False" && full(23) === "False") // obtain_all, uir
    assert(full(12) === "9.8" && full(25) === "10.0")    // str(float) rendering
    val bare = lines.find(_.startsWith("CVE-2019-0004\t")).get.split("\t", -1)
    assert(bare.slice(1, 29).forall(_ === ""))           // nulls -> empty string
  }

  test("tab-CSV round trip: write + COPY-style read reproduces the typed frames") {
    val out = Files.createTempDirectory("whrt").toString
    val (cvss0, pr0, cp0) =
      (Flatten.cvss(feed), Flatten.problems(feed), Flatten.cpes(feed))
    Warehouse.writeWarehouseCsvs(cvss0, pr0, cp0, out)
    val (cvss1, pr1, cp1) = Warehouse.readWarehouseCsvs(spark, out)
    assert(cvss1.schema === NvdSchema.cvssTable)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(v => Option(v).map(_.toString).orNull)).toSet
    assert(rows(cvss1) === rows(cvss0))
    assert(rows(pr1) === rows(pr0))
    assert(rows(cp1) === rows(cp0))
  }

  test("export CSVs: single flat FILE at the derived path, like the reference") {
    val out = Files.createTempDirectory("whexp").toString
    val rows = Queries.byScoreDate(Flatten.cvss(feed), 7.0, Some("2020-01-01"))
      .orderBy("cve")
    val p = Warehouse.exportScoreDateCsv(rows, out, "7", Some("2020-01-01"))
    assert(p.endsWith("/CVEs_score7_2020-01-01.csv"))
    // the reference writes a FILE, not a directory of part files
    // (cve_manager.py:467-471); downstream scripts open it directly
    val f = new File(p)
    assert(f.isFile && !f.isDirectory)
    assert(!new File(p + ".spark-staging").exists()) // scratch dir cleaned up
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    assert(lines.head ===
      "CVE,CVSSv3 Score,CVSSv3 Vector String,CVSSv2 Score,CVSSv2 Vector String,Published Date")
    assert(lines.size > 1)
    val view = Warehouse.cvssVsCpes(Flatten.cvss(feed), Flatten.cpes(feed))
    val p2 = Warehouse.exportCpeCsv(
      Queries.byCpe(view, "acme", 7.0, None).orderBy("cve"), out, "acme", "7", None)
    assert(p2.endsWith("/acme_7_False.csv")) // str(False) date segment, like the reference
    assert(new File(p2).isFile)
    // ':' in the derived name (e.g. -cpe "cpe:2.3:a:acme") must not crash:
    // ChecksumFileSystem's relative ".<name>.crc" shadow path would parse
    // the colon as a URI scheme — the raw-FS promote path avoids it.
    val p3 = Warehouse.exportCpeCsv(
      Queries.byCpe(view, "acme", 7.0, None).orderBy("cve"), out, "acme:2.3", "7", None)
    assert(p3.endsWith("/acme:2.3_7_False.csv"))
    assert(new File(p3).isFile)
    assert(!new File(p3 + ".spark-staging").exists())
  }

  test("catalog lifecycle: create db, save facts + view, truncate facts, cwe survives") {
    val db = "graft_test_db"
    Warehouse.dropDatabase(spark, db)
    Warehouse.saveFacts(spark, db, Flatten.cvss(feed), Flatten.problems(feed),
      Flatten.cpes(feed))
    Warehouse.saveCwe(spark, db, Warehouse.cweCatalog(spark, CveOps.FixtureCwe))
    assert(spark.table(s"$db.cvss").count() === 8)
    assert(spark.table(s"$db.cvss_vs_cpes").count() === 6) // vulnerable rows only
    Warehouse.truncateFacts(spark, db)
    assert(Warehouse.FactTables.map(t => spark.table(s"$db.$t").count()).sum === 0)
    assert(spark.table(s"$db.cwe").count() === 4) // dimension survives refresh
    Warehouse.dropDatabase(spark, db)
  }

  test("JDBC warehouse (S9 bulk load/query): facts + view + cwe round-trip through embedded Derby") {
    val url = graft.DerbyTestHome.freshDbUrl("derbywh")
    val (cvss0, pr0, cp0) =
      (Flatten.cvss(feed), Flatten.problems(feed), Flatten.cpes(feed))
    val cwe0 = Warehouse.cweCatalog(spark, CveOps.FixtureCwe)
    Warehouse.saveFactsJdbc(url, cvss0, pr0, cp0, numPartitions = 2)
    Warehouse.saveCweJdbc(url, cwe0)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(v => Option(v).map(_.toString).orNull)).toSet
    val cvss1 = Warehouse.readJdbc(spark, url, "cvss")
    val pr1 = Warehouse.readJdbc(spark, url, "cve_problem")
    val cp1 = Warehouse.readJdbc(spark, url, "cpe")
    val cwe1 = Warehouse.readJdbc(spark, url, "cwe")
    // typed round-trip: names, types (dates, doubles, booleans), and values
    assert(cvss1.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      NvdSchema.cvssTable.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(rows(cvss1) === rows(cvss0))
    assert(rows(pr1) === rows(pr0))
    assert(rows(cp1) === rows(cp0))
    assert(rows(cwe1) === rows(cwe0))

    // the query families read back identically through the JDBC source
    assert(rows(Queries.byScoreDate(cvss1, 9.0, Some("2020-01-01"))) ===
      rows(Queries.byScoreDate(cvss0, 9.0, Some("2020-01-01"))))
    assert(rows(Queries.byCve(cvss1, "CVE-2024")) ===
      rows(Queries.byCve(cvss0, "CVE-2024")))
    assert(rows(Queries.cweLookup(pr1, cwe1)) === rows(Queries.cweLookup(pr0, cwe0)))
    // J1 as a DATABASE view this time (cve_manager.py:79-90)
    val view1 = Warehouse.readJdbc(spark, url, "cvss_vs_cpes")
    assert(rows(Queries.byCpe(view1, "acme", 7.0, None)) ===
      rows(Queries.byCpe(Warehouse.cvssVsCpes(cvss0, cp0), "acme", 7.0, None)))

    // refresh path: a second bulk load succeeds with the view in place
    // (drop-view-first ordering) and reproduces the same warehouse
    Warehouse.saveFactsJdbc(url, cvss0, pr0, cp0, numPartitions = 2)
    assert(rows(Warehouse.readJdbc(spark, url, "cvss")) === rows(cvss0))

    // sharded bulk read: per-task range predicates on the partition column
    val sharded = Warehouse.readJdbc(spark, url, "cvss",
      partitionColumn = Some("published_date"),
      lowerBound = Some("2019-01-01"), upperBound = Some("2025-01-01"),
      numPartitions = 3)
    assert(sharded.rdd.getNumPartitions === 3)
    assert(rows(sharded) === rows(cvss0))
  }
}
