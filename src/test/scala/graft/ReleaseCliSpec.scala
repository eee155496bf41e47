package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Release CLI assembles the publishable bundle from the catalog's
  * own oracle-graded frames — every artifact must be bit-equal to the
  * query it came from, and the summary line must reflect the artifacts. */
class ReleaseCliSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bundle: six artifacts bit-equal to their catalog queries; summary consistent") {
    val out = java.nio.file.Files.createTempDirectory("graft-release").toString
    val json = Release.run(spark, List("bundle", sf, out))
    assert(json.contains(""""mode":"bundle""""))

    // every artifact IS its catalog query's frame
    Release.Parts.foreach { case (sub, q) =>
      val want = SparkEntry.queries(q)(spark, sf)
      val sorted = want.columns.toSeq
      val got = spark.read.parquet(s"$out/$sub")
        .select(sorted.map(org.apache.spark.sql.functions.col): _*)
        .orderBy(sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq.toList).toList
      val exp = want
        .orderBy(sorted.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq.toList).toList
      assert(got === exp && got.nonEmpty, s"artifact $sub drifted from $q")
    }

    // summary fields tie out to the artifacts
    val docs = Tables.load(spark, sf, "documents")
    assert(json.contains(s""""docs":${docs.count()}"""))
    assert(json.contains(
      s""""sources":${docs.select("source").distinct().count()}"""))
    val kanon = SparkEntry.queries("q185_kanon_audit")(spark, sf).collect()
    assert(json.contains(
      s""""exposed_cells":${kanon.count(_.getAs[Long]("exposed") == 1L)}"""))
    val ladder = SparkEntry.queries("q187_kanon_generalize")(spark, sf)
      .collect()
    val anonW = ladder.sortBy(_.getAs[Long]("bin_w"))
      .find(_.getAs[Long]("anonymous") == 1L)
      .map(_.getAs[Long]("bin_w")).getOrElse(-1L)
    assert(json.contains(s""""anonymous_bin_w":$anonW"""))
  }
}
