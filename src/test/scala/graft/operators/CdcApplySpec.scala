package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, StaticPlans, Tables}

/** q104's contract: `applyChangeset` is the MERGE INTO shape — a CDC delta
  * applied to a standing snapshot digest. Pins (1) the merge SEMANTICS
  * (apply(A, delta) rematerializes the refreshed corpus row-for-row, and
  * the q101 diff of applied-vs-target reads all-unchanged), (2) the keyed
  * edge behaviors (delete-of-absent no-op, upsert-of-absent insert,
  * upsert-of-present replace), and (3) the 100 TB claim: over a
  * `writeSnapshot` bucketed manifest the apply join plans WITHOUT the
  * snapshot-side exchange — only the delta moves. */
class CdcApplySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def staticShuffles(df: org.apache.spark.sql.DataFrame) = StaticPlans {
    val p = SharedSpark.spark.sessionState
      .executePlan(df.queryExecution.logical).executedPlan
    assert(!p.toString.contains("AdaptiveSparkPlan"),
      "static plan still adaptive — the census would be vacuous")
    p.collect { case e: ShuffleExchangeExec => e }
  }

  test("apply(A, delta) rematerializes the refreshed snapshot row-for-row") {
    val docs = Tables.load(spark, dir, "documents")
    val applied = Dedup.applyChangeset(
        Dedup.snapshotDigest(docs), Dedup.simulateChangeset(docs))
      .orderBy("doc_id").collect().map(_.toSeq)
    val target = Dedup.snapshotDigest(Dedup.simulateRefresh(docs))
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(applied.nonEmpty)
    assert(applied.toSeq === target.toSeq)
  }

  test("q101 diff of applied-vs-target reads all-unchanged") {
    val docs = Tables.load(spark, dir, "documents")
    val applied = Dedup.applyChangeset(
      Dedup.snapshotDigest(docs), Dedup.simulateChangeset(docs))
    val statuses = Dedup.diffRollup(Dedup.diffStatus(
        applied, Dedup.snapshotDigest(Dedup.simulateRefresh(docs))))
      .collect().map(_.getString(1)).toSet
    assert(statuses === Set("unchanged"))
  }

  test("delete-of-absent no-op; upsert-of-absent inserts; upsert replaces") {
    import spark.implicits._
    val snap = Seq((1L, "s0", "h1"), (2L, "s0", "h2"))
      .toDF("doc_id", "source", "h")
    val changes = Seq(
      (9L, "s0", null.asInstanceOf[String], "delete"), // absent → no-op
      (3L, "s1", "h3", "upsert"), //                      absent → insert
      (2L, "s0", "h2b", "upsert"), //                     present → replace
      (1L, "s0", null.asInstanceOf[String], "delete")) // present → drop
      .toDF("doc_id", "source", "h", "op")
    val out = Dedup.applyChangeset(snap, changes).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((2L, "s0", "h2b"), (3L, "s1", "h3")))
  }

  test("over a bucketed at-rest snapshot, apply moves only the delta") {
    val base = java.nio.file.Files.createTempDirectory("graft-cdc")
    val docs = Tables.load(spark, dir, "documents")
    try {
      Dedup.writeSnapshot(docs, "cdc_spec_a", s"$base/a", nBuckets = 4)
      val delta = Dedup.simulateChangeset(docs)
      val bucketed = Dedup.applyChangeset(spark.table("cdc_spec_a"), delta)
      val plain = Dedup.applyChangeset(Dedup.snapshotDigest(docs), delta)

      // The bucketed snapshot contributes no exchange: the plan loses the
      // snapshot-side doc_id shuffle relative to the plain form (the delta
      // side may still shuffle — that's the point: apply cost scales with
      // the delta, never the standing corpus).
      val exB = staticShuffles(bucketed).size
      val exP = staticShuffles(plain).size
      assert(exB < exP,
        s"bucketed apply should drop the snapshot-side exchange ($exB vs $exP)")

      // And the at-rest path returns exactly what the in-query form does.
      assert(bucketed.orderBy("doc_id").collect().map(_.toSeq).toSeq ===
        plain.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS cdc_spec_a")
  }
}
