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

  test("gc retains the newest generations, survives a crash mid-removal, never touches current") {
    val base = java.nio.file.Files.createTempDirectory("graft-snapgc")
    val lineage = s"$base/lineage"
    val docsA = base.resolve("docsA"); val docsB = base.resolve("docsB")
    val changes = s"$base/changes"
    val docs = Tables.load(spark, sf, "documents")
    docs.write.parquet(s"$docsA/documents.parquet")
    Dedup.simulateRefresh(docs).write.parquet(s"$docsB/documents.parquet")
    Dedup.simulateChangeset(docs).write.parquet(changes)

    // Three generations in one lineage dir: base write, two applies
    // (gen-names sort in creation order; retention also orders by mtime).
    Snapshot.run(spark, List("write", docsA.toString, s"$lineage/gen-001"))
    Snapshot.run(spark,
      List("apply", s"$lineage/gen-001", changes, s"$lineage/gen-002"))
    Snapshot.run(spark,
      List("apply", s"$lineage/gen-001", changes, s"$lineage/gen-003"))

    // keep > generations: nothing removed
    val g0 = Snapshot.run(spark, List("gc", lineage, "--keep", "9"))
    assert(g0.contains(""""kept":3""") && g0.contains(""""removed":0"""), g0)

    // keep 1: gen-003 survives, older generations removed
    val g1 = Snapshot.run(spark, List("gc", lineage, "--keep", "1"))
    assert(g1.contains(""""kept":1""") && g1.contains(""""removed":2"""), g1)
    assert(g1.contains(""""generations":["gen-003"]"""), g1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$lineage/gen-001")))

    // the kept generation is diff-clean: gc never renamed or touched it
    val refSnap = s"$base/ref"
    Snapshot.run(spark, List("write", docsB.toString, refSnap))
    val clean = Snapshot.run(spark, List("diff", s"$lineage/gen-003", refSnap))
    assert(clean.contains(""""changed_docs":0"""), clean)

    // crash mid-removal: a stranded .trash is swept by the re-run, and
    // the survivor is still never touched
    val stranded = new java.io.File(s"$lineage/gen-000.trash")
    assert(stranded.mkdirs())
    val g2 = Snapshot.run(spark, List("gc", lineage, "--keep", "1"))
    assert(g2.contains(""""swept_trash":1""") && g2.contains(""""removed":0"""), g2)
    assert(!stranded.exists())
    val clean2 = Snapshot.run(spark, List("diff", s"$lineage/gen-003", refSnap))
    assert(clean2.contains(""""changed_docs":0"""), clean2)

    // keep must be >= 1 — a gc can never delete every generation
    assertThrows[IllegalArgumentException] {
      Snapshot.run(spark, List("gc", lineage, "--keep", "0"))
    }
  }

  test("gc lineage order is natural name order: gen-10 outlives gen-9 even after a backup restore") {
    // A restore (cp -r / rsync) resets every generation dir's mtime to
    // the copy instant — mtime carries no lineage information, and plain
    // lexical order would read gen-10 < gen-9. Natural order (digit runs
    // compared numerically) must keep the CURRENT generation.
    val base = java.nio.file.Files.createTempDirectory("graft-snapgc-nat")
    val lineage = s"$base/lineage"
    val docsA = base.resolve("docsA")
    Tables.load(spark, sf, "documents")
      .write.parquet(s"$docsA/documents.parquet")
    Snapshot.run(spark, List("write", docsA.toString, s"$lineage/gen-9"))
    Snapshot.run(spark, List("write", docsA.toString, s"$lineage/gen-10"))
    // simulate the restore: identical mtimes on both generations
    Seq("gen-9", "gen-10").foreach { g =>
      assert(new java.io.File(s"$lineage/$g").setLastModified(1000000000000L))
    }
    val g = Snapshot.run(spark, List("gc", lineage, "--keep", "1"))
    assert(g.contains(""""generations":["gen-10"]"""), g)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$lineage/gen-9")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$lineage/gen-10")))
  }
}
