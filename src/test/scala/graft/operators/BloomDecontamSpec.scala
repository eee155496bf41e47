package graft.operators

import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, StaticPlans, Tables}

/** q105's contract: the bloom prefilter is a pure shuffle-volume
  * optimization — the exact verify join after it makes the output
  * bit-identical to the unfiltered plan (false positives cost probes, never
  * rows), and the might_contain predicate sits BELOW the registry join on
  * the corpus side, where it cuts rows before they reach the join's
  * exchange. */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def corpusAndRegistry = {
    val docs = Tables.load(spark, dir, "documents")
    (docs.filter(col("doc_id") % 4 =!= 0), docs.filter(col("doc_id") % 4 === 0))
  }

  test("bloom-prefiltered result is bit-identical to the exact unfiltered join") {
    val (corpus, registry) = corpusAndRegistry
    val got = Dedup.bloomDecontam(corpus, registry)
      .orderBy("doc_id").collect().map(_.toSeq)
    // The same pipeline minus the prefilter — the plain exact form.
    val reg = Dedup.shinglesRaw(registry).select("s").distinct()
    val expect = Dedup.shinglesRaw(corpus)
      .join(reg, Seq("s"))
      .select("doc_id", "s").distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= Dedup.ContamK)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.nonEmpty, "fixture should produce contaminated docs")
    assert(got.toSeq === expect.toSeq)
  }

  test("might_contain prefilter sits below the registry join on the corpus side") {
    val (corpus, registry) = corpusAndRegistry
    val frame = Dedup.bloomDecontam(corpus, registry)
    val plan = StaticPlans {
      val p = SharedSpark.spark.sessionState
        .executePlan(frame.queryExecution.logical).executedPlan
      assert(!p.toString.contains("AdaptiveSparkPlan"))
      p
    }
    def hasBloomFilter(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.find {
        case f: FilterExec =>
          f.condition.find(_.isInstanceOf[BloomFilterMightContain]).nonEmpty
        case _ => false
      }.nonEmpty
    val joins = plan.collect {
      case j: SortMergeJoinExec => j: org.apache.spark.sql.execution.SparkPlan
      case j: BroadcastHashJoinExec => j: org.apache.spark.sql.execution.SparkPlan
    }
    assert(joins.nonEmpty, "registry join missing")
    assert(joins.exists(j => j.children.exists(hasBloomFilter)),
      "bloom prefilter must run below the registry join, not above it")
  }
}
