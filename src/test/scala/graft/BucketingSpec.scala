package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join lever for 100 TB: when both fact tables
  * are bucketed on the join key, the sort-merge join runs with ZERO shuffle
  * exchanges — each bucket pair joins locally. This spec proves the plan
  * shape, not just the result. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("join of co-bucketed tables plans without any ShuffleExchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.load(spark, dir, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // The join itself must be shuffle-free; the only exchange allowed is
      // the final single-partition agg over 3 groups.
      assert(shuffles.size <= 1, s"unexpected shuffles: $shuffles")
      val bare = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      assert(bare.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }.isEmpty, "bucketed equi-join should plan with zero exchanges")
      // sanity: same result as the plain parquet join
      val n = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val m = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(n === m)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
