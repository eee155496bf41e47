package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling — the runtime half of the skew story (q49 is the
  * manual-salting half): with skew-join enabled, a sort-merge join whose
  * build side has one hot key re-plans at runtime into split skew
  * partitions instead of serializing one reducer. Thresholds are lowered so
  * test-sized data exhibits "skew"; on a cluster the defaults (256 MB)
  * apply and the same mechanism fires. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    val confs = Seq(
      // enough reducers that the hot key's partition is an outlier vs the
      // MEDIAN partition size (with 2 partitions the median IS the outlier)
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 1 carries ~100k rows (hot), keys 2..1000 one row each.
      val left = spark.range(100000).select(lit(1L).as("k"), col("id").as("payload"))
        .unionByName(spark.range(2, 1001).select(col("id").as("k"), col("id").as("payload")))
      val right = spark.range(1, 1001).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, "k")
      // Execute THIS QueryExecution (count() would build and run a
      // different plan, leaving this one un-finalized under AQE).
      assert(joined.queryExecution.toRdd.count() === 100000 + 999)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
