package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** The EXECUTED-plan twins of the StaticPlans pins for the bench's top-5
  * heavies (VERDICT r9 #2): StaticPlans rightly forces AQE off so shape
  * assertions aren't vacuous, but the bench runs with AQE ON — so these
  * specs execute each heavy under AQE and assert on the FINAL adaptive
  * plan (recursively expanded through the QueryStageExec leaves that an
  * `executedPlan.collect` would stop at). Fails if AQE ever degrades a
  * heavy to a sort-merge-everything shape, stops converting the small
  * keyed frames to broadcast, or grows the exchange count.
  *
  * q47/q91 intentionally show thin tails: their pair mining runs behind a
  * `persist`/`localCheckpoint` lineage barrier at construction time, so the
  * observable QueryExecution is the post-barrier tail — the mining subtree
  * itself is q22's plan, pinned there. */
class AdaptivePlansSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Expand the finalized adaptive tree: AdaptiveSparkPlanExec and each
    * QueryStageExec are leaves to TreeNode.collect; recurse through their
    * materialized plans. ReusedExchangeExec stays a leaf (its target is
    * counted where it was planned). */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  /** Execute THIS QueryExecution (count() would build a second, different
    * plan and leave this one un-finalized under AQE) and return the
    * expanded final plan nodes. */
  private def executedNodes(q: String): Seq[SparkPlan] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = SparkEntry.queries(q)(spark, dir)
      df.queryExecution.toRdd.count()
      val root = df.queryExecution.executedPlan
      assert(flatten(root).exists(_.isInstanceOf[AdaptiveSparkPlanExec]),
        s"$q did not execute adaptively - this spec would pin nothing")
      flatten(root)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def counts(nodes: Seq[SparkPlan]): (Int, Int, Int, Int) = (
    nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
    nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
    nodes.count(_.isInstanceOf[SortMergeJoinExec]),
    nodes.count(_.isInstanceOf[CartesianProductExec]))

  test("q22 executed under AQE: broadcast joins, bounded exchanges, no SMJ") {
    val (ex, bhj, smj, cp) = counts(executedNodes("q22_ngram_jaccard"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(bhj >= 1, "AQE stopped broadcasting the sizes join")
    assert(ex <= 4, s"exchange count grew: $ex")
  }

  test("q102 executed under AQE: component map broadcasts into the corpus join") {
    val (ex, bhj, smj, cp) = counts(executedNodes("q102_dup_consolidate"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(bhj >= 1, "AQE stopped broadcasting the component map")
    assert(ex <= 3, s"exchange count grew: $ex")
  }

  test("q58 executed under AQE: keep-decision join broadcasts, no corpus re-shuffle") {
    val (ex, bhj, smj, cp) = counts(executedNodes("q58_dedup_keep"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(bhj >= 1, "AQE stopped broadcasting the component map")
    assert(ex <= 3, s"exchange count grew: $ex")
  }

  test("q47 executed tail under AQE: one exchange past the edge barrier, no SMJ") {
    val (ex, _, smj, cp) = counts(executedNodes("q47_dedup_components"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(ex <= 1, s"exchange count grew: $ex")
  }

  test("q91 executed tail under AQE: one exchange past the gate barrier, no SMJ") {
    val (ex, _, smj, cp) = counts(executedNodes("q91_edit_distance"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(ex <= 1, s"exchange count grew: $ex")
  }

  test("q148 executed under AQE: df>1 gram index broadcasts into the decision join, no SMJ") {
    val (ex, bhj, smj, cp) = counts(executedNodes("q148_crossdoc_strip"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(bhj >= 1, "AQE stopped broadcasting the filtered gram index")
    // gram-index agg + cover distinct + kept agg + final join sides.
    assert(ex <= 6, s"exchange count grew: $ex")
  }

  test("q149 executed tail under AQE: component-map join broadcasts past the CC barrier, no SMJ") {
    val (ex, bhj, smj, cp) = counts(executedNodes("q149_cluster_split"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(bhj >= 1, "AQE stopped broadcasting the component map")
    assert(ex <= 3, s"exchange count grew: $ex")
  }

  test("q166 executed under AQE: one scan per half, tiny est join broadcasts, no SMJ") {
    // r14: the sketch twin adds the register-fold half (second scan,
    // (grp, idx)-keyed) and a |widths|-row est ⋈ exact join that AQE
    // must broadcast — never sort-merge, never a product.
    val nodes = executedNodes("q166_novelty_curve")
    val (ex, bhj, smj, cp) = counts(nodes)
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(bhj === 1, s"the |widths|-row join must broadcast, got bhj=$bhj")
    // exact: count-distinct expand + (n, gh) agg + per-n agg; sketch:
    // (grp, idx) agg + per-grp agg; + the ordered output.
    assert(ex <= 7, s"exchange count grew: $ex")
    assert(nodes.count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]) === 2,
      "all four widths must ride ONE parquet scan per half")
  }

  test("q170 executed tail under AQE: catalog-sized joins past the iteration barriers, no SMJ") {
    // The ten PageRank rounds run at construction behind per-round
    // barriers; the observable QueryExecution is the final rank frame
    // joined with the in/out-weight aggregates of the checkpointed edge
    // list — everything |sources|-sized, so AQE must broadcast.
    val (ex, _, smj, cp) = counts(executedNodes("q170_source_authority"))
    assert(smj === 0 && cp === 0, s"degraded: smj=$smj cp=$cp")
    assert(ex <= 4, s"exchange count grew: $ex")
  }
}
