package graft.cve

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.CveOps

/** The year-partitioned warehouse must turn the date floor into a static
  * partition filter — year directories pruned at planning time, not scanned
  * and discarded (SURVEY.md §4). */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("byScoreDate on the partitioned cvss table prunes year partitions") {
    val db = "graft_part_db"
    val feed = Flatten.readFeed(spark, CveOps.FixtureFeed)
    Warehouse.dropDatabase(spark, db)
    Warehouse.saveFacts(spark, db, Flatten.cvss(feed), Flatten.problems(feed),
      Flatten.cpes(feed))
    try {
      val q = Queries.byScoreDate(spark.table(s"$db.cvss"), 7.0, Some("2021-01-01"))
      val scans = q.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      assert(scans.exists(_.partitionFilters.nonEmpty),
        "expected a partition filter on pub_year")
      // only 2021+ partitions survive pruning
      val readYears = scans.flatMap(_.relation.location.listFiles(
        scans.head.partitionFilters, Nil)).flatMap(_.files).map(_.getPath.toString)
        .flatMap("pub_year=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt))
      assert(readYears.nonEmpty && readYears.forall(_ >= 2021), s"read: $readYears")
      // and the result equals the unpartitioned formulation
      val got = q.collect().map(_.getString(0)).toSet
      val want = Queries.byScoreDate(Flatten.cvss(feed), 7.0, Some("2021-01-01"))
        .collect().map(_.getString(0)).toSet
      assert(got === want)
    } finally Warehouse.dropDatabase(spark, db)
  }
}
