package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry, StaticPlans, Tables}

/** q101's production form (VERDICT r8 #1): two corpus snapshot manifests
  * written bucketed-by-doc_id diff with ZERO shuffle exchanges on the
  * full-outer join — at 100 TB the nightly refresh audit streams co-located
  * bucket files instead of re-shuffling the corpus by id. This spec proves
  * the plan shape AND that the at-rest path returns bit-identical results
  * to the oracle-checked in-query q101. */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Static-plan shuffle census. Forces the plan inside StaticPlans (AQE
    * off): with AQE on the executed plan is an AdaptiveSparkPlanExec LEAF,
    * `.collect` sees nothing, and a zero-exchange assertion would pass for
    * ANY plan — the pin below would be vacuous. A fresh logical copy of the
    * frame is planned (queryExecution caches per-DataFrame), so callers may
    * hold the frame before entering the wrapper. */
  private def shuffles(df: org.apache.spark.sql.DataFrame) = StaticPlans {
    val p = SharedSpark.spark.sessionState
      .executePlan(df.queryExecution.logical).executedPlan
    assert(!p.toString.contains("AdaptiveSparkPlan"),
      "static plan still adaptive — the census below would be vacuous")
    p.collect { case e: ShuffleExchangeExec => e }
  }

  test("bucketed snapshot manifests diff with a shuffle-free join") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap")
    val docs = Tables.load(spark, dir, "documents")
    try {
      Dedup.writeSnapshot(docs, "snap_spec_a", s"$base/a", nBuckets = 4)
      Dedup.writeSnapshot(Dedup.simulateRefresh(docs), "snap_spec_b",
        s"$base/b", nBuckets = 4)

      // The per-doc diff (scan → full-outer join → classify) must plan with
      // ZERO exchanges: both sides scan as HashPartitioning(doc_id, 4).
      val st = Dedup.diffStatus(
        spark.table("snap_spec_a"), spark.table("snap_spec_b"))
      assert(shuffles(st).isEmpty,
        s"bucketed diff join should be exchange-free: ${shuffles(st)}")

      // The full rollup adds only the catalog-sized (source, status) agg:
      // exactly the partial→final exchange pair's one shuffle, nothing
      // keyed by doc_id.
      val rolled = Dedup.diffRollup(st)
      val ex = shuffles(rolled)
      assert(ex.size <= 2, s"unexpected exchanges in rollup: $ex") // agg + orderBy range
      ex.foreach { e =>
        val keys = e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.flatMap(_.references.map(_.name)).toSet
          case _ => Set.empty[String]
        }
        assert(!keys.contains("doc_id"), s"diff join leaked a doc_id shuffle: $keys")
      }

      // At-rest result ≡ the oracle-checked in-query q101 (same corpus,
      // same simulated refresh, same rollup) — bit-identical rows.
      val atRest = rolled.collect().map(_.toSeq)
      val inQuery = SparkEntry.queries("q101_corpus_diff")(spark, dir)
        .collect().map(_.toSeq)
      assert(atRest.toSeq === inQuery.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS snap_spec_a")
      spark.sql("DROP TABLE IF EXISTS snap_spec_b")
    }
  }

  test("snapshotDiff re-attaches bare directories and stays exchange-free on the join") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap2")
    val docs = Tables.load(spark, dir, "documents")
    try {
      Dedup.writeSnapshot(docs, "snap_spec_w1", s"$base/a", nBuckets = 4)
      Dedup.writeSnapshot(Dedup.simulateRefresh(docs), "snap_spec_w2",
        s"$base/b", nBuckets = 4)
      // Simulate a LATER session: the writer's catalog entries are gone;
      // only the directories remain. snapshotDiff must re-register them
      // with the same bucket spec and still plan the join shuffle-free.
      spark.sql("DROP TABLE IF EXISTS snap_spec_w1")
      spark.sql("DROP TABLE IF EXISTS snap_spec_w2")

      val diff = Dedup.snapshotDiff(spark, s"$base/a", s"$base/b", nBuckets = 4)
      shuffles(diff).foreach { e =>
        val keys = e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.flatMap(_.references.map(_.name)).toSet
          case _ => Set.empty[String]
        }
        assert(!keys.contains("doc_id"), s"re-attached diff join shuffled by doc_id: $keys")
      }
      val got = diff.collect().map(_.toSeq)
      val expect = SparkEntry.queries("q101_corpus_diff")(spark, dir)
        .collect().map(_.toSeq)
      assert(got.toSeq === expect.toSeq)
    } finally {
      Seq("snap_spec_w1", "snap_spec_w2").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.sql("SHOW TABLES").collect()
        .map(_.getString(1)).filter(_.startsWith("graft_snap_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
