package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** The Snapshot CLI drives the whole refresh cycle end-to-end: write both
  * generations as bucketed manifests, audit the diff, MERGE the changeset
  * into a new manifest, and prove the applied snapshot diffs clean
  * against the target generation. */
class SnapshotCliSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("write → diff → apply → diff-clean: the refresh cycle through the CLI") {
    val base = java.nio.file.Files.createTempDirectory("graft-snapcli")
    val docsA = base.resolve("docsA"); val docsB = base.resolve("docsB")
    val snapA = s"$base/snapA"; val snapB = s"$base/snapB"
    val changes = s"$base/changes"; val snapOut = s"$base/snapOut"

    val docs = Tables.load(spark, sf, "documents")
    docs.write.parquet(s"$docsA/documents.parquet")
    Dedup.simulateRefresh(docs).write.parquet(s"$docsB/documents.parquet")
    Dedup.simulateChangeset(docs).write.parquet(changes)

    val w1 = Snapshot.run(spark, List("write", docsA.toString, snapA))
    val w2 = Snapshot.run(spark, List("write", docsB.toString, snapB))
    assert(w1.contains(""""mode":"write"""") && w2.contains(""""mode":"write""""))

    // The CLI diff reproduces q101's changed-docs total.
    val want = SparkEntry.queries("q101_corpus_diff")(spark, sf)
      .filter(col("status") =!= "unchanged")
      .agg(coalesce(sum("n_docs"), lit(0L))).head().getLong(0)
    val d = Snapshot.run(spark, List("diff", snapA, snapB))
    assert(d.contains(s""""changed_docs":$want"""), d)

    // apply(A, changeset) → a NEW bucketed manifest that diffs CLEAN
    // against the target generation's own manifest.
    val a = Snapshot.run(spark, List("apply", snapA, changes, snapOut))
    assert(a.contains(""""mode":"apply""""), a)
    val clean = Snapshot.run(spark, List("diff", snapOut, snapB))
    assert(clean.contains(""""changed_docs":0"""), clean)
  }
}
