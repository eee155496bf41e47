package graft

/** Runs a block with AQE disabled on the shared session so
  * `df.queryExecution.executedPlan` is the REAL static tree. With AQE on,
  * any plan containing an exchange comes back wrapped in
  * AdaptiveSparkPlanExec — a LeafExecNode, so `.collect` finds nothing and
  * every "no ShuffleExchangeExec" assertion passes vacuously. Plan-shape
  * pins must force the plan inside this wrapper. */
object StaticPlans {
  def apply[T](f: => T): T = {
    val s = SharedSpark.spark
    val prev = s.conf.get("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
