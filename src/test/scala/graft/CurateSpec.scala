package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** The Curate CLI pipeline must chain the verified operator shapes
  * end-to-end and land a self-consistent artifact. */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("Curate.run: dedup → redact → quality-cut → pack, stats consistent with the artifact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-curate").toFile
    tmp.deleteOnExit()
    val budget = 2048L
    val json = Curate.run(spark, "/root/testdata/sf0.001", tmp.getPath, budget)

    val m = """"(\w+)":(\d+)""".r.findAllMatchIn(json)
      .map(x => x.group(1) -> x.group(2).toLong).toMap
    // Every stage can only shrink the corpus, and none may empty it here.
    assert(m("docs_in") >= m("after_exact_dedup"))
    assert(m("after_exact_dedup") >= m("after_neardup"))
    assert(m("after_neardup") >= m("after_quality_cut"))
    assert(m("after_quality_cut") > 0 && m("packs") > 0)

    val out = spark.read.parquet(s"${tmp.getPath}/curated.parquet")
    assert(out.count() === m("after_quality_cut"))
    assert(out.select("doc_id").distinct().count() === out.count())
    assert(out.agg(countDistinct("pack_id")).head().getLong(0) === m("packs"))
    // Redaction really ran: no email survives in any kept text.
    assert(out.filter(col("text").rlike(TextOps.EmailRe)).count() === 0)
    // cum-based binning: a pack never exceeds budget by more than the one
    // doc that straddles its boundary.
    val overfull = out.groupBy("pack_id")
      .agg(sum("tokens").as("t"), max("tokens").as("mx"))
      .filter(col("t") > lit(budget) + col("mx")).count()
    assert(overfull === 0)
    // stats.json carries the same line the run returned.
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"${tmp.getPath}/stats.json"))).trim
    assert(onDisk === json)
  }
}
